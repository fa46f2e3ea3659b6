"""Optimization: losses, optimizers (optax), LR schedules."""
