"""The driver entry points must work under a device-scarce ambient env.

Round 1's only red driver artifact was ``dryrun_multichip`` asserting
"need 8 devices, have 1" because the ambient remote-TPU plugin pins the
process to one device. The fix self-provisions a virtual CPU mesh in a
child process (the tests/conftest.py recipe); this pins that behaviour:
the current test process owns 8 CPU devices, so asking for 16 forces the
re-exec path end-to-end (subprocess env construction, output propagation,
recursion guard).
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_dryrun_multichip_self_provisions_when_devices_scarce():
    env = dict(os.environ)
    env.pop("_PCUDA_MULTICHIP_CHILD", None)
    # the 2-process multihost phase costs two extra step compiles — covered
    # by the driver's real dryrun; this test pins the re-exec path and the
    # n-vs-1 equivalence assertion
    env["_PCUDA_SKIP_MULTIHOST"] = "1"
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "__graft_entry__.py"), "multichip", "16"],
        env=env,
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=900,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "dryrun_multichip OK on 16 devices" in proc.stdout
    assert "matches n=1" in proc.stdout


def test_multichip_child_guard_raises_not_recurses():
    """If provisioning failed, the child must error out instead of forking
    forever."""
    import __graft_entry__ as g
    import pytest

    os.environ["_PCUDA_MULTICHIP_CHILD"] = "1"
    try:
        with pytest.raises(RuntimeError, match="provisioning failed"):
            g._reexec_on_virtual_mesh(16)
    finally:
        os.environ.pop("_PCUDA_MULTICHIP_CHILD", None)
