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
from hessian_llm_vision_tpu.utils.programs import mark_program_backed
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

    @jax.jit
    def _prog(v, params, batch):
        # explicit params/batch jit args: tunnel-safe for host-driven
        # solvers (see operators.py module docstring)
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

    return LinearOperator(
        mark_program_backed(lambda v: _prog(v, params, batch)), fl.size
    )


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
    chunk_size: int | None = None,
    materialize: bool = True,
    grad_dtype: jnp.dtype = jnp.float32,
) -> LinearOperator:
    """Empirical Fisher ``(1/n) Σᵢ gᵢ gᵢᵀ`` as an operator.

    ``loss_fn_per_example(params, example) -> scalar``; ``batch`` leaves have
    a leading example axis.  ``F v = (1/n) Gᵀ (G v)`` on the flat (n, P)
    per-example-gradient matrix G.

    Memory/scale controls (G is O(n·P) — at LLM scale that dwarfs HBM):

    * ``chunk_size`` — per-example grads are computed ``chunk_size``
      examples at a time (bounds the vmap working set);
    * ``materialize=True`` (default) stores G once in ``grad_dtype``
      (``bfloat16`` halves it) — a k-fold saving across Krylov iterations;
    * ``materialize=False`` stores NOTHING: each matvec recomputes grads
      chunk by chunk, O(chunk·P) memory at n× grad cost per matvec.
    """
    fl = flattener or Flattener(params)
    n = jax.tree_util.tree_leaves(batch)[0].shape[0]
    chunk = min(chunk_size or n, n)

    @jax.jit
    def _chunk_grads(p, ex_chunk):
        return jax.vmap(
            lambda e: fl.flatten(jax.grad(loss_fn_per_example)(p, e))
        )(ex_chunk)

    def _chunks():
        for s in range(0, n, chunk):
            yield jax.tree_util.tree_map(lambda x: x[s : s + chunk], batch)

    @jax.jit
    def _apply(G, v):
        # f32-accumulated two-matmul form (dispatches bf16-streaming when
        # G is stored bf16 — same structure as ops.spectral.rank_k_apply)
        dots = jax.lax.dot_general(
            G, v.astype(G.dtype), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return jax.lax.dot_general(
            dots.astype(G.dtype), G, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    if materialize:
        G = jnp.concatenate(
            [_chunk_grads(params, c).astype(grad_dtype) for c in _chunks()]
        )

        def matvec(v: jax.Array) -> jax.Array:
            res = _apply(G, v.astype(jnp.float32)) / n
            if damping:
                res = res + damping * v
            return res

    else:

        def matvec(v: jax.Array) -> jax.Array:
            v32 = v.astype(jnp.float32)
            res = jnp.zeros_like(v32)
            for c in _chunks():
                res = res + _apply(_chunk_grads(params, c), v32)
            res = res / n
            if damping:
                res = res + damping * v
            return res

    return LinearOperator(mark_program_backed(matvec), fl.size)
