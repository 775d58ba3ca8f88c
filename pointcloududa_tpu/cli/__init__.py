"""Command-line entry points mirroring the reference's four scripts:
train_mscmrseg, train_mmwhs, evaluate_mscmrseg, evaluate_mmwhs."""
