"""Unified entry point: ``python -m pointcloududa_tpu <command> [args...]``.

The reference README documents a ``main.py`` that does not exist in its
repo (doc drift, SURVEY.md §1); this is the real unified dispatcher over
the four workload CLIs.
"""

import sys

COMMANDS = {
    "train-mscmrseg": "pointcloududa_tpu.cli.train_mscmrseg",
    "train-mmwhs": "pointcloududa_tpu.cli.train_mmwhs",
    "evaluate-mscmrseg": "pointcloududa_tpu.cli.evaluate_mscmrseg",
    "evaluate-mmwhs": "pointcloududa_tpu.cli.evaluate_mmwhs",
}


def main():
    if len(sys.argv) < 2 or sys.argv[1] in ("-h", "--help") or sys.argv[1] not in COMMANDS:
        print("usage: python -m pointcloududa_tpu <command> [args...]")
        print("commands:", ", ".join(COMMANDS))
        sys.exit(0 if len(sys.argv) >= 2 and sys.argv[1] in ("-h", "--help") else 2)
    import importlib

    mod = importlib.import_module(COMMANDS[sys.argv[1]])
    mod.main(sys.argv[2:])


if __name__ == "__main__":
    main()
