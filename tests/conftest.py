"""Test configuration: force the CPU backend with 8 virtual devices so the
multi-chip sharding paths are exercised without TPU hardware (SURVEY.md §4).

The ambient environment of this machine registers a remote-TPU PJRT plugin
(with remote compilation) from ``sitecustomize`` at interpreter start —
before any conftest runs — which routes compiles through a network relay and
makes even CPU-backend tests crawl. Environment changes inside this process
are too late (the plugin is already registered), so when we detect that
state we re-exec pytest once with a clean environment (local CPU backend,
8 virtual devices). The re-exec happens in ``pytest_configure`` after
stopping pytest's fd capture so the child inherits the real stdout.
"""

import os
import sys

_ENV = {
    "JAX_PLATFORMS": "cpu",
    "XLA_FLAGS": "--xla_force_host_platform_device_count=8",
    "JAX_NUM_CPU_DEVICES": "8",
    "PALLAS_AXON_REMOTE_COMPILE": "0",
}

_NEEDS_REEXEC = bool(os.environ.get("PALLAS_AXON_POOL_IPS")) and not os.environ.get(
    "_PCUDA_TEST_REEXEC"
)

if not _NEEDS_REEXEC:
    for _k, _v in _ENV.items():
        os.environ.setdefault(_k, _v)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def pytest_configure(config):
    if not _NEEDS_REEXEC:
        return
    capman = config.pluginmanager.getplugin("capturemanager")
    if capman is not None:
        capman.stop_global_capturing()
    env = dict(os.environ)
    env.update(_ENV)
    env["PALLAS_AXON_POOL_IPS"] = ""  # sitecustomize skips plugin registration
    env["_PCUDA_TEST_REEXEC"] = "1"
    sys.stdout.flush()
    sys.stderr.flush()
    os.execve(sys.executable, [sys.executable, "-m", "pytest"] + sys.argv[1:], env)
