"""Gradient transforms built on a *frozen* saved spectrum.

Reference: the catastrophic-forgetting suppressor — train task B with
``g ← g − Σᵢ (vᵢᵀg)vᵢ`` over task A's saved eigenbasis
(/root/reference/load_model.py:325-401), and periodic-refresh reuse of a
stored (V, λ) between Lanczos refreshes.  Since the basis is constant,
these ARE pure optax ``GradientTransformation``s — chain them in front of
any optimizer: ``optax.chain(project_gradients(V, fl), sgd_momentum(...))``.
"""

from __future__ import annotations

from typing import Optional

import jax
import optax

from hessian_llm_vision_tpu.ops.spectral import project_out, spectral_adjust
from hessian_llm_vision_tpu.utils.flatten import Flattener


def project_gradients(
    basis: jax.Array, flattener: Flattener, *, use_pallas: Optional[bool] = None
) -> optax.GradientTransformation:
    """``g ← g − Σᵢ(vᵢᵀg)vᵢ`` with a fixed orthonormal row-basis (k, P)."""

    def init(params):
        return optax.EmptyState()

    def update(grads, state, params=None):
        g = flattener.flatten(grads)
        out = project_out(g, basis, use_pallas=use_pallas)
        return flattener.unflatten(out), state

    return optax.GradientTransformation(init, update)


def frozen_spectral_adjust(
    basis: jax.Array,
    eigvals: jax.Array,
    delta: float,
    flattener: Flattener,
    *,
    use_pallas: Optional[bool] = None,
) -> optax.GradientTransformation:
    """The Lanczos adjustment with a fixed saved spectrum (the reuse phase of
    periodic-refresh LanczosSGD, gpt2_hessian_gpu.py:230-240)."""

    def init(params):
        return optax.EmptyState()

    def update(grads, state, params=None):
        g = flattener.flatten(grads)
        out = spectral_adjust(g, basis, eigvals, delta, use_pallas=use_pallas)
        return flattener.unflatten(out), state

    return optax.GradientTransformation(init, update)
