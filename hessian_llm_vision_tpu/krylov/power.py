"""Power iteration for the extremal eigenpair.

Reference: hand-rolled power iteration on the GN operator
(/root/reference/ipynbs/cola-gpt2.ipynb cell 3) and ``cola.eigmax``
(colaexp.py).  One ``lax.fori_loop`` on device.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp


def power_iteration(
    matvec: Callable[[jax.Array], jax.Array],
    dim: int,
    num_iters: int = 100,
    *,
    key: jax.Array,
) -> Tuple[jax.Array, jax.Array]:
    """Returns (rayleigh_quotient, eigvec) after ``num_iters`` iterations.

    Converges to the eigenvalue of largest |λ|; for the largest *algebraic*
    eigenvalue of an indefinite Hessian use a shifted operator.
    """
    v = jax.random.normal(key, (dim,), dtype=jnp.float32)
    v = v / jnp.linalg.norm(v)

    def body(_, v):
        w = matvec(v).astype(jnp.float32)
        return w / jnp.maximum(jnp.linalg.norm(w), 1e-30)

    v = jax.lax.fori_loop(0, num_iters, body, v)
    lam = jnp.vdot(v, matvec(v))
    return lam, v
