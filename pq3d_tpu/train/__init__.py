"""Training runtime: train state, jitted steps, trainers, checkpointing."""
