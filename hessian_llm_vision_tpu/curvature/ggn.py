"""Gauss-Newton and Fisher operators.

Reference: CoLA-built ``GN = Jᵀ H_out J`` and ``FIM`` operators
(/root/reference/colaexp.py:100-110, ipynbs/cola-gpt2.ipynb).  TPU-native
composition: ``J v`` by ``jax.jvp`` of the model function, the output-space
Hessian by forward-over-reverse on the output loss, and ``Jᵀ u`` by
``jax.vjp`` — one fused XLA program per matvec, no operator-algebra library.

For exponential-family likelihood losses (softmax cross-entropy, squared
error) the GGN equals the Fisher information matrix, so ``FisherOperator``
is the GGN of the negative log-likelihood; an empirical-Fisher variant
(per-example gradient outer products via ``vmap``) is also provided.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp

from hessian_llm_vision_tpu.curvature.operators import LinearOperator
from hessian_llm_vision_tpu.utils.flatten import Flattener


def GGNOperator(
    model_fn: Callable[[Any, Any], jax.Array],
    out_loss_fn: Callable[[jax.Array, Any], jax.Array],
    params: Any,
    batch: Any,
    *,
    damping: float = 0.0,
    flattener: Flattener | None = None,
) -> LinearOperator:
    """``v -> (Jᵀ H_out J + damping·I) v``.

    ``model_fn(params, batch) -> outputs`` (e.g. logits);
    ``out_loss_fn(outputs, batch) -> scalar`` convex output-space loss.
    Damping mirrors the reference's ``cola.PSD(G + 1e-3 I)``
    (/root/reference/colaexp.py:106).
    """
    fl = flattener or Flattener(params)

    def matvec(v: jax.Array) -> jax.Array:
        vt = fl.unflatten(v)

        def f(p):
            return model_fn(p, batch)

        outputs, jv = jax.jvp(f, (params,), (vt,))
        # output-space HVP: H_out @ (J v), forward-over-reverse on outputs
        h_jv = jax.jvp(
            jax.grad(lambda o: out_loss_fn(o, batch)), (outputs,), (jv,)
        )[1]
        _, vjp_fn = jax.vjp(f, params)
        (jt_h_jv,) = vjp_fn(h_jv)
        out = fl.flatten(jt_h_jv)
        if damping:
            out = out + damping * v
        return out

    return LinearOperator(matvec, fl.size)


def FisherOperator(
    model_fn: Callable[[Any, Any], jax.Array],
    nll_fn: Callable[[jax.Array, Any], jax.Array],
    params: Any,
    batch: Any,
    *,
    damping: float = 0.0,
    flattener: Flattener | None = None,
) -> LinearOperator:
    """Fisher information matvec — GGN of the negative log-likelihood.

    Exact FIM for exponential-family heads (softmax CE, Gaussian MSE), which
    covers every loss in the reference.  Mirrors ``cola.ops.FIM`` usage at
    /root/reference/colaexp.py:108-110.
    """
    return GGNOperator(
        model_fn, nll_fn, params, batch, damping=damping, flattener=flattener
    )


def EmpiricalFisherOperator(
    loss_fn_per_example: Callable[[Any, Any], jax.Array],
    params: Any,
    batch: Any,
    *,
    damping: float = 0.0,
    flattener: Flattener | None = None,
) -> LinearOperator:
    """Empirical Fisher ``(1/n) Σᵢ gᵢ gᵢᵀ`` as an operator.

    ``loss_fn_per_example(params, example) -> scalar``; ``batch`` leaves have
    a leading example axis.  ``F v = (1/n) Σᵢ (gᵢᵀ v) gᵢ`` with per-example
    grads via ``vmap`` (no explicit outer products materialized).
    """
    fl = flattener or Flattener(params)
    # per-example grads are independent of v — computed ONCE here, not per
    # matvec (a k-fold saving on the dominant cost across Krylov iterations)
    per_ex_grad = jax.vmap(
        jax.grad(loss_fn_per_example), in_axes=(None, 0)
    )(params, batch)
    n = jax.tree_util.tree_leaves(batch)[0].shape[0]

    def matvec(v: jax.Array) -> jax.Array:
        vt = fl.unflatten(v)

        # (gᵢᵀ v) per example, then weighted sum of gᵢ
        dots = jax.tree_util.tree_reduce(
            jnp.add,
            jax.tree_util.tree_map(
                lambda g, x: jnp.sum(
                    g.reshape(n, -1).astype(jnp.float32)
                    * x.reshape(-1).astype(jnp.float32),
                    axis=1,
                ),
                per_ex_grad,
                vt,
            ),
        )
        out = jax.tree_util.tree_map(
            lambda g: jnp.tensordot(dots, g.astype(jnp.float32), axes=(0, 0)) / n,
            per_ex_grad,
        )
        res = fl.flatten(out)
        if damping:
            res = res + damping * v
        return res

    return LinearOperator(matvec, fl.size)
