"""Stochastic trace estimators: Hutchinson and Hutch++.

The reference estimates tr(H) only as an SLQ by-product
(``torch.dot(eigvals, gammas) * P`` — eigeninfo/GPT2 spectrum.ipynb cell 4;
``krylov.slq.trace_estimate`` is that path).  This module adds direct
matrix-free estimators with better probe efficiency:

- **Hutchinson**: tr(A) ≈ (1/m) Σᵢ vᵢᵀAvᵢ with Rademacher probes —
  O(1/√m) error, the classical baseline.
- **Hutch++** (Meyer, Musco, Musco, Woodruff 2021): spend a third of the
  matvecs on a randomized range sketch Q of A, compute tr(QᵀAQ) exactly,
  and run Hutchinson only on the deflated remainder (I−QQᵀ)A(I−QQᵀ) —
  O(1/m) error.  For loss Hessians, whose spectrum is a few large
  outliers + a near-zero bulk (exactly the structure the reference's
  spectra show), the deflation absorbs the outliers and the variance
  collapses.

Everything is functional and jit-compatible; probes are drawn from an
explicit key (the d.sh ``vector_seed`` discipline).  ``matvec`` follows the
framework's operator protocol — ``(P,) f32 -> (P,) f32`` — so any
``curvature.operators`` object composes.  For LLM-scale operators, pass
``vmapped=False``: probes then run as a host loop over the single cached
matvec program (the remote-compile-ceiling pattern of krylov/driver.py)
instead of one m-times-wider vmapped program.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

__all__ = ["hutchinson_trace", "hutchpp_trace"]


def _rademacher(key, shape) -> jax.Array:
    return jax.random.rademacher(key, shape, jnp.float32)


def _apply_columns(matvec: Callable, V: jax.Array, vmapped: bool) -> jax.Array:
    """A @ V for (P, m) probe columns."""
    if vmapped:
        return jax.vmap(matvec, in_axes=1, out_axes=1)(V)
    cols = [matvec(V[:, i]) for i in range(V.shape[1])]
    return jnp.stack(cols, axis=1)


def hutchinson_trace(
    matvec: Callable[[jax.Array], jax.Array],
    dim: int,
    num_probes: int,
    key: jax.Array,
    vmapped: bool = True,
) -> jax.Array:
    """Classical Hutchinson estimate of tr(A) with Rademacher probes."""
    if num_probes < 1:
        raise ValueError("num_probes must be >= 1")
    V = _rademacher(key, (dim, num_probes))
    AV = _apply_columns(matvec, V, vmapped)
    return jnp.sum(V * AV) / num_probes


def hutchpp_trace(
    matvec: Callable[[jax.Array], jax.Array],
    dim: int,
    num_probes: int,
    key: jax.Array,
    vmapped: bool = True,
) -> jax.Array:
    """Hutch++ estimate of tr(A) using ``num_probes`` total matvecs.

    Splits the budget m into s = ceil(m/3) sketch probes, s more matvecs
    for the exact low-rank term, and g = m − 2s Hutchinson probes on the
    deflated operator, per the paper's allocation.  Needs m >= 3.
    """
    if num_probes < 3:
        raise ValueError("hutch++ needs num_probes >= 3 (one per phase)")
    s = -(-num_probes // 3)  # ceil(m/3)
    g = num_probes - 2 * s
    k_sketch, k_hutch = jax.random.split(key)

    S = _rademacher(k_sketch, (dim, s))
    Q, _ = jnp.linalg.qr(_apply_columns(matvec, S, vmapped))  # (P, s)
    AQ = _apply_columns(matvec, Q, vmapped)
    exact = jnp.trace(Q.T @ AQ)
    if g == 0:
        return exact

    G = _rademacher(k_hutch, (dim, g))
    G = G - Q @ (Q.T @ G)  # deflate: (I - QQ^T) G
    AG = _apply_columns(matvec, G, vmapped)
    # tr((I-QQ^T) A (I-QQ^T)) with the left projector applied to AG
    AG = AG - Q @ (Q.T @ AG)
    return exact + jnp.sum(G * AG) / g
