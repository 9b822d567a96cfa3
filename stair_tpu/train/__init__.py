"""Training: per-module supervision losses, the train loop, checkpoints."""
