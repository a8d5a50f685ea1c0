"""Evaluation helpers.

Reference: per-batch accuracy/loss prints every 10 batches
(train_lanczos.py:309-320), the no-grad per-batch LM loss evaluator
(loss-llama.ipynb cells 6-8), and per-step task-A accuracy tracking during
task-B training (load_model.py:285-301) used by the forgetting experiment.
"""

from __future__ import annotations

from typing import Iterable

import jax
import jax.numpy as jnp
import numpy as np


def evaluate_accuracy(apply_fn, params, batches: Iterable) -> float:
    """Mean accuracy over (x, y) batches for a classifier apply_fn."""

    @jax.jit
    def batch_correct(p, x, y):
        logits = apply_fn(p, x)
        return jnp.sum(jnp.argmax(logits, -1) == y)

    total, correct = 0, 0
    for x, y in batches:
        correct += int(batch_correct(params, jnp.asarray(x), jnp.asarray(y)))
        total += len(y)
    return correct / max(total, 1)


def evaluate_loss(loss_fn, params, batches: Iterable) -> float:
    @jax.jit
    def one(p, b):
        return loss_fn(p, b)

    losses = [float(one(params, b)) for b in batches]
    return float(np.mean(losses))


def per_batch_losses(loss_fn, params, batches: Iterable) -> np.ndarray:
    """Loss per batch, no reduction — the loss-llama evaluator."""

    @jax.jit
    def one(p, b):
        return loss_fn(p, b)

    return np.asarray([float(one(params, b)) for b in batches])
