"""Linearized HVPs: pay the primal ONCE per (params, batch), then run
every Lanczos iteration on the tangent map alone.

A Pearlmutter HVP (``jax.jvp`` of ``jax.grad``) re-executes the primal
forward+backward under every matvec even though Lanczos/KPM/SLQ jobs
hold (params, batch) FIXED across all k iterations.  ``jax.linearize``
partial-evaluates that primal away: this module splits the
linearization into two host-dispatchable programs

* ``residual_program(params, batch) -> consts`` — one primal
  forward+backward, returning the linearization residuals as an explicit
  tuple of device arrays (``jax.closure_convert`` hoists them);
* ``tangent_program(v, consts, params, batch) -> Hv`` — the linear map
  only.  Measured at GPT-2 (XLA cost analysis): the tangent program
  carries **0.72x** the flops of the fused HVP, so a k-iteration job
  costs ``0.26 + 0.72k`` HVP-equivalents instead of ``k`` — 1.37x fewer
  flops at k=35, a direct wall win on the compute-bound blocks-X6 tier
  (the faithful trained-checkpoint mode, artifacts/mfu_r5/).

The catch is MEMORY, measured via :func:`residual_bytes` (abstract
eval_shape, no compile): the residuals for GPT-2 124M seq512 are
**21.2 GiB at bs8** (2.65 GiB/sequence) — over a 16 GB chip, which is
why this mode is OPT-IN with an explicit guard rather than the default
(``jax.checkpoint`` can NOT shrink it: remat policies act on the vjp,
and this is a jvp — verified, remat on/off residuals are byte-identical).
Fits and pays at refresh/probe scale (measured on the 16 GB chip at
124M/seq512: bs2 fits and the tangent runs 0.51x the HVP wall — 1.73x
for a k=10 refresh, 1.89x for k=35; bs4's 10.9 GiB residuals OOM with
the full-HVP program co-resident; artifacts/mfu_r5/linearized_x6.json).

Both programs trace the SAME ``jax.linearize`` call so
``closure_convert`` hoists identical const lists in identical order; the
tangent program's own (traced, unused) primal is dead-code-eliminated by
jax/XLA, leaving the pure linear map.

Reference role: none — the reference recomputes the full double-backward
per Lanczos iteration (/root/reference/gpt2_hessian.py:83-96); on TPU
the compute-bound faithful tier makes the primal a measurable 28% tax
worth splitting off.  Parity: tests/unit/test_linearized.py pins
tangent == hvp_fn to f32 tolerance.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from hessian_llm_vision_tpu.curvature.hvp import _scaled_loss_fn
from hessian_llm_vision_tpu.utils.flatten import Flattener


def _linearized_grad(loss_fn, normalization, batch_size, precision,
                     dataset_size=None):
    """f_lin builder shared by BOTH programs (identical const order)."""

    def make(params, batch):
        scaled = _scaled_loss_fn(
            loss_fn, batch, normalization, batch_size, dataset_size
        )
        grad_fn = jax.grad(scaled)

        if precision is not None:
            with jax.default_matmul_precision(precision):
                _, f_lin = jax.linearize(grad_fn, params)
        else:
            _, f_lin = jax.linearize(grad_fn, params)
        return f_lin

    return make


@functools.lru_cache(maxsize=16)
def linearized_hvp_programs(
    loss_fn: Callable[[Any, Any], jax.Array],
    normalization: str,
    precision: Optional[str],
    fl: Flattener,
    batch_size: Optional[int] = None,
) -> Tuple[Callable, Callable]:
    """``(residual_program, tangent_program)``, module-cached like
    :func:`krylov.driver._jitted_batch_hvp` (same host-loop contract:
    params/batch explicit jit args, flat f32 vectors in/out).

    ``tangent_program(v, consts, params, batch)`` still takes params and
    batch: they anchor the retrace that rebuilds the linear jaxpr (whose
    own hoisted consts are discarded and DCE'd) — XLA executes only the
    tangent ops against the PASSED ``consts``.
    """
    make_lin = _linearized_grad(loss_fn, normalization, batch_size, precision)

    @jax.jit
    def residual_program(params, batch):
        f_lin = make_lin(params, batch)
        _, consts = jax.closure_convert(f_lin, params)
        return tuple(consts)

    @jax.jit
    def tangent_program(v, consts, params, batch):
        f_lin = make_lin(params, batch)
        f_conv, _ = jax.closure_convert(f_lin, fl.unflatten(v))
        out = f_conv(fl.unflatten(v), *consts)
        return fl.flatten(out)

    return residual_program, tangent_program


def residual_bytes(
    loss_fn: Callable[[Any, Any], jax.Array],
    params_template: Any,
    batch_template: Any,
    *,
    normalization: str = "mean",
    batch_size: Optional[int] = None,
    precision: Optional[str] = None,
) -> int:
    """Total bytes of the linearization residuals — abstract, no compile.

    Callers gate the opt-in on this against the accelerator's HBM (the
    CLI warns above ~8 GiB: the tangent working set + params + Krylov
    vectors still need room next to the consts).
    """
    import numpy as np

    make_lin = _linearized_grad(loss_fn, normalization, batch_size, precision)

    def residuals(params, batch):
        f_lin = make_lin(params, batch)
        _, consts = jax.closure_convert(f_lin, params)
        return tuple(consts)

    avals = jax.eval_shape(residuals, params_template, batch_template)
    return int(
        sum(int(np.prod(c.shape)) * c.dtype.itemsize for c in avals)
    )


def linearized_matvec(
    loss_fn: Callable[[Any, Any], jax.Array],
    params: Any,
    batch: Any,
    *,
    normalization: str = "mean",
    batch_size: Optional[int] = None,
    precision: Optional[str] = None,
    flattener: Optional[Flattener] = None,
) -> Callable[[jax.Array], jax.Array]:
    """One-call convenience: computes the residuals NOW (one primal) and
    returns ``v -> Hv`` over the cached tangent program — a drop-in for
    host-loop matvec consumers (lanczos drivers, KPM, probes) at fixed
    (params, batch)."""
    fl = flattener or Flattener(params)
    resid_p, tangent_p = linearized_hvp_programs(
        loss_fn, normalization, precision, fl, batch_size
    )
    consts = resid_p(params, batch)

    def matvec(v: jax.Array) -> jax.Array:
        return tangent_p(v.astype(jnp.float32), consts, params, batch)

    return matvec
