"""Gauss-Newton and natural-gradient steps via CG inverse solves.

Reference: ``p ← p − GN(p)⁻¹ g`` and ``p ← p − 0.5·F(p)⁻¹ g`` with CoLA CG
inverses (/root/reference/colaexp.py:120-147).
"""

from __future__ import annotations

from typing import Any, Callable

import jax

from hessian_llm_vision_tpu.curvature.ggn import FisherOperator, GGNOperator
from hessian_llm_vision_tpu.krylov.cg import cg_solve
from hessian_llm_vision_tpu.utils.flatten import Flattener


def make_gauss_newton_step(
    model_fn: Callable,
    out_loss_fn: Callable,
    loss_fn: Callable[[Any, Any], jax.Array],
    params_template: Any,
    *,
    lr: float = 1.0,
    damping: float = 1e-3,
    cg_tol: float = 1e-3,
    cg_iters: int = 20,
):
    """``step(params, batch) -> (params, metrics)``: damped GN update."""
    fl = Flattener(params_template)

    def step(params, batch):
        loss, grad = jax.value_and_grad(loss_fn)(params, batch)
        g = fl.flatten(grad)
        op = GGNOperator(
            model_fn, out_loss_fn, params, batch, damping=damping, flattener=fl
        )
        res = cg_solve(op.matvec, g, tol=cg_tol, max_iters=cg_iters)
        new = fl.unflatten(fl.flatten(params) - lr * res.x)
        return new, {
            "loss": loss,
            "cg_iters": res.num_iters,
            "cg_residual": res.residual_norm,
        }

    return step


def make_natural_gradient_step(
    model_fn: Callable,
    nll_fn: Callable,
    loss_fn: Callable[[Any, Any], jax.Array],
    params_template: Any,
    *,
    lr: float = 0.5,
    damping: float = 1e-3,
    cg_tol: float = 1e-3,
    cg_iters: int = 20,
):
    """``p ← p − lr·F⁻¹g`` (reference uses lr=0.5, colaexp.py:134-147)."""
    fl = Flattener(params_template)

    def step(params, batch):
        loss, grad = jax.value_and_grad(loss_fn)(params, batch)
        g = fl.flatten(grad)
        op = FisherOperator(
            model_fn, nll_fn, params, batch, damping=damping, flattener=fl
        )
        res = cg_solve(op.matvec, g, tol=cg_tol, max_iters=cg_iters)
        new = fl.unflatten(fl.flatten(params) - lr * res.x)
        return new, {
            "loss": loss,
            "cg_iters": res.num_iters,
            "cg_residual": res.residual_norm,
        }

    return step
