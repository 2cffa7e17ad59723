"""Training: criterion, trainer, checkpointing."""
