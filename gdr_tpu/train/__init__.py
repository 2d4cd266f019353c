"""Training: multi-LR optimizer, jitted train step, checkpointing."""
