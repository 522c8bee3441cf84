"""Training runtime: losses, optimizers/schedules, the sharded train step,
checkpointing, and evaluation metrics."""
