"""Synthetic data generators.

Reference: k-spirals classification set (/root/reference/spiral_exp.py:35-45,
colaexp.py:8-35), ``RandomNoiseDataset`` of random token ids + random
attention masks for Hessian-of-noise experiments
(/root/reference/gpt2_savehessian_noise.py:26-51), and random-input /
random-label augmentation of CIFAR batches (cifar_10.py:680-689).
All generators are seeded and return numpy arrays (host side); batch
stacking for ``lax.scan`` consumption lives in ``data.text.stack_batches``.
"""

from __future__ import annotations

import numpy as np


def make_spirals(
    num_points: int = 600,
    num_classes: int = 3,
    noise: float = 0.2,
    seed: int = 0,
    turns: float = 1.5,
):
    """k interleaved spirals; returns (x (N,2) f32, y (N,) i32)."""
    rng = np.random.RandomState(seed)
    n = num_points // num_classes
    xs, ys = [], []
    for c in range(num_classes):
        r = np.linspace(0.1, 1.0, n)
        theta = (
            np.linspace(0, turns * 2 * np.pi, n)
            + c * (2 * np.pi / num_classes)
            + rng.randn(n) * noise
        )
        xs.append(np.stack([r * np.cos(theta), r * np.sin(theta)], axis=1))
        ys.append(np.full(n, c))
    x = np.concatenate(xs).astype(np.float32)
    y = np.concatenate(ys).astype(np.int32)
    perm = rng.permutation(len(x))
    return x[perm], y[perm]


def random_token_batches(
    num_batches: int,
    batch_size: int,
    seq_len: int,
    vocab_size: int,
    seed: int = 0,
    random_mask: bool = False,
):
    """Random token-id LM batches (the Hessian-of-noise probe).

    Returns dict of stacked arrays: ``input_ids`` (num_batches, B, T) i32 and
    ``attention_mask`` (same shape) — mask is all-ones unless
    ``random_mask=True`` (the reference's random attention masks,
    gpt2_savehessian_noise.py:26-51; always at least one visible token).
    """
    rng = np.random.RandomState(seed)
    ids = rng.randint(
        0, vocab_size, size=(num_batches, batch_size, seq_len)
    ).astype(np.int32)
    if random_mask:
        mask = (rng.rand(num_batches, batch_size, seq_len) > 0.5).astype(np.int32)
        mask[..., 0] = 1
    else:
        mask = np.ones_like(ids)
    return {"input_ids": ids, "attention_mask": mask}


def random_image_batches(
    num_batches: int,
    batch_size: int,
    shape=(32, 32, 3),
    num_classes: int = 10,
    seed: int = 0,
):
    """Random-input / random-label image batches (cifar_10.py:680-689)."""
    rng = np.random.RandomState(seed)
    x = rng.randn(num_batches, batch_size, *shape).astype(np.float32)
    y = rng.randint(0, num_classes, size=(num_batches, batch_size)).astype(np.int32)
    return x, y


def markov_token_batches(
    num_batches: int,
    batch_size: int,
    seq_len: int,
    vocab_size: int,
    seed: int = 0,
    concentration: float = 0.1,
):
    """LEARNABLE synthetic LM data: tokens from a fixed sparse first-order
    Markov chain (uniform-random tokens have no structure, so losses on
    them cannot descend below ln(V) — useless for convergence tests).

    Returns the same stacked dict shape as :func:`random_token_batches`.
    """
    rng = np.random.RandomState(seed)
    # sparse-ish transition matrix via Dirichlet rows
    T = rng.dirichlet(np.full(vocab_size, concentration), size=vocab_size)
    ids = np.empty((num_batches * batch_size, seq_len), np.int32)
    state = rng.randint(0, vocab_size, size=num_batches * batch_size)
    for t in range(seq_len):
        ids[:, t] = state
        u = rng.rand(len(state), 1)
        state = (T[state].cumsum(axis=1) > u).argmax(axis=1)
    ids = ids.reshape(num_batches, batch_size, seq_len)
    return {"input_ids": ids, "attention_mask": np.ones_like(ids)}
