"""Host utilities: timing, scalar logging, NIfTI IO, native host ops."""
