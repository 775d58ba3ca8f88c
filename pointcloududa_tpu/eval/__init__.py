"""Volume-level inference and evaluation (Dice/HD/ASD per structure)."""
