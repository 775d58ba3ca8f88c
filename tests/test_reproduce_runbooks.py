"""The turnkey reproduction runbooks must stay dry-runnable end-to-end.

``tools/reproduce.py --check`` (MS-CMRSeg, 20 stages) and
``tools/reproduce_mmwhs.py --check`` (MM-WHS, 7 stages) fabricate a mini
dataset and drive every prep/train/evaluate stage through the real CLIs
(reference workflows: ``src/README.md:4,24``). Slow-marked: each takes a
few minutes on CPU; the fast suite covers the same CLIs piecewise
(test_cli_pipeline.py, test_mmwhs_end_to_end.py, test_tools.py).
"""

import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))


@pytest.mark.slow
def test_mscmrseg_runbook_check(tmp_path):
    import reproduce

    reproduce.check(str(tmp_path))


@pytest.mark.slow
def test_mmwhs_runbook_check(tmp_path):
    import reproduce_mmwhs

    reproduce_mmwhs.check(str(tmp_path))
