"""LR schedules.

Reference: linear decay ``lr * max(0, 1 − step/total)``
(/root/reference/train_savespec.py:203-207)."""

from __future__ import annotations

import jax.numpy as jnp


def linear_decay(base_lr: float, total_steps: int):
    def schedule(step):
        frac = 1.0 - step.astype(jnp.float32) / total_steps
        return base_lr * jnp.maximum(0.0, frac)

    return schedule


def constant(base_lr: float):
    def schedule(step):
        return jnp.full((), base_lr, jnp.float32)

    return schedule
