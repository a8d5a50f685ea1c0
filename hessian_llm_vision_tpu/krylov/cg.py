"""Conjugate-gradient solves for SPD curvature operators.

Reference: ``cola.inv(GN(p), alg=Auto(tol=1e-3, max_iters=20)) @ g`` powering
Gauss-Newton and natural-gradient steps (/root/reference/colaexp.py:116-147).
Implemented as a ``lax.while_loop`` with tolerance + max-iteration exit so the
whole solve jits into one XLA program.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp


class CGResult(NamedTuple):
    x: jax.Array
    num_iters: jax.Array
    residual_norm: jax.Array


def cg_solve(
    matvec: Callable[[jax.Array], jax.Array],
    b: jax.Array,
    *,
    x0: jax.Array | None = None,
    tol: float = 1e-3,
    max_iters: int = 20,
) -> CGResult:
    """Solve ``A x = b`` for SPD matrix-free ``A`` (damp indefinite Hessians
    first via ``LinearOperator.shifted``)."""
    b = b.astype(jnp.float32)
    x = jnp.zeros_like(b) if x0 is None else x0.astype(jnp.float32)
    r = b - matvec(x).astype(jnp.float32)
    p = r
    rs = jnp.vdot(r, r)
    b_norm = jnp.maximum(jnp.linalg.norm(b), 1e-30)

    def cond(state):
        _, _, _, rs, i = state
        return jnp.logical_and(jnp.sqrt(rs) / b_norm > tol, i < max_iters)

    def body(state):
        x, r, p, rs, i = state
        ap = matvec(p).astype(jnp.float32)
        alpha = rs / jnp.maximum(jnp.vdot(p, ap), 1e-30)
        x = x + alpha * p
        r = r - alpha * ap
        rs_new = jnp.vdot(r, r)
        p = r + (rs_new / jnp.maximum(rs, 1e-30)) * p
        return x, r, p, rs_new, i + 1

    x, r, p, rs, i = jax.lax.while_loop(cond, body, (x, r, p, rs, 0))
    return CGResult(x=x, num_iters=i, residual_norm=jnp.sqrt(rs))
