"""Host-driven spectrum computation for compiler-limited / huge models.

The pattern proven by bench.py on real hardware: ONE small jitted
per-batch HVP program (params/batches as explicit jit arguments — closure
constants bloat remote compiles), dataset averaging and the Lanczos
three-term recurrence driven from host, T assembled on host.  Per-iteration
host dispatch is negligible next to an LLM-scale HVP, and no program ever
exceeds one HVP (this machine's remote TPU compiler rejects anything
bigger; real deployments also benefit from the bounded compile unit).

Use `krylov.lanczos` (single fused scan) for models that fit comfortably;
use this driver at GPT-2-124M scale and beyond.
"""

from __future__ import annotations

import functools
import time
from typing import Any, Callable, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from hessian_llm_vision_tpu.krylov.lanczos import LanczosResult, host_recurrence_step
from hessian_llm_vision_tpu.utils.flatten import Flattener


@functools.lru_cache(maxsize=32)
def _jitted_batch_hvp(loss_fn, per_batch_norm, precision, fl):
    """One jitted per-batch HVP per (loss_fn, norm, precision, flattener).

    Cached at module level: re-tracing/lowering a 124M-param HVP jaxpr
    costs tens of seconds, and a closure-local jit re-pays it on EVERY
    dataset_spectrum_host call (measured 3x on the whole spectrum).
    """
    from hessian_llm_vision_tpu.curvature.hvp import hvp_fn

    _hvp = hvp_fn(loss_fn, normalization=per_batch_norm, precision=precision)

    @jax.jit
    def batch_hvp(v, params, batch):
        return fl.flatten(_hvp(params, batch, fl.unflatten(v)))

    return batch_hvp


@functools.lru_cache(maxsize=32)
def _jitted_batch_ggn(model_fn, out_loss_fn, precision, fl):
    """One jitted per-batch GGN/Fisher matvec (v, params, batch) -> Gv.

    Same host-loop contract as :func:`_jitted_batch_hvp` but for the
    Gauss-Newton product ``Jᵀ H_out J v`` (= Fisher for NLL out-losses) —
    the program is the same size class as one HVP, so GGN/Fisher spectra
    work at any scale the Hessian path does (the fused
    ``curvature.ggn.GGNOperator`` + ``lanczos`` scan exceeds this
    backend's compile ceiling at 124M).  Reference role: colaexp.py:100-110
    GN/FIM spectra, at LLM scale.
    """

    @jax.jit
    def batch_ggn(v, params, batch):
        vt = fl.unflatten(v)

        def f(p):
            return model_fn(p, batch)

        def run():
            outputs, jv = jax.jvp(f, (params,), (vt,))
            h_jv = jax.jvp(
                jax.grad(lambda o: out_loss_fn(o, batch)), (outputs,), (jv,)
            )[1]
            _, vjp_fn = jax.vjp(f, params)
            (jt_h_jv,) = vjp_fn(h_jv)
            return fl.flatten(jt_h_jv)

        if precision is not None:
            with jax.default_matmul_precision(precision):
                return run()
        return run()

    return batch_ggn


@functools.lru_cache(maxsize=32)
def _jitted_masked_batch_hvp(loss_fn, per_batch_norm, precision, fl):
    """ONE jitted block-restricted HVP for ALL parameter leaves.

    The block-diagonal action ``H_l v = m_l ⊙ H (m_l ⊙ v)`` with the mask
    built in-program from (start, size) scalars — so every leaf of a 124M
    model shares a single compiled program instead of one compile per leaf
    (the remote-compiler-bounded rebuild of
    /root/reference/lanczostrain_layer_hand.py:74-91's ``layer_idx``
    restriction).
    """
    from hessian_llm_vision_tpu.curvature.hvp import hvp_fn

    _hvp = hvp_fn(loss_fn, normalization=per_batch_norm, precision=precision)

    @jax.jit
    def masked_batch_hvp(v, start, size, params, batch):
        idx = jnp.arange(fl.size, dtype=jnp.int32)
        mask = ((idx >= start) & (idx < start + size)).astype(v.dtype)
        out = fl.flatten(_hvp(params, batch, fl.unflatten(mask * v)))
        return mask * out

    return masked_batch_hvp


def layerwise_spectrum_host(
    loss_fn: Callable[[Any, Any], jax.Array],
    params: Any,
    batch: Any,
    num_iters: int,
    *,
    key: jax.Array,
    normalization: str = "mean",
    batch_size: Optional[int] = None,
    precision: Optional[str] = "high",
    flattener: Optional[Flattener] = None,
    min_size: int = 2,
    progress: bool = False,
):
    """Per-leaf block-diagonal spectra at LLM scale, host-driven.

    One masked-HVP program serves every leaf; the three-term recurrence is
    T-only (no basis kept).  Returns ``{leaf_label: LanczosResult}`` — the
    per-layer λmax/λmin table of
    /root/reference/lanczostrain_layer_hand.py:183-185 /
    gpt2_savehessian_layer.py at any model size this backend can HVP.
    """
    from hessian_llm_vision_tpu.utils import trees

    fl = flattener or Flattener(params)
    scale = 1.0
    per_batch_norm = normalization
    if normalization == "sum":
        if batch_size is None:
            raise ValueError('normalization="sum" requires batch_size')
        per_batch_norm, scale = "mean", float(batch_size)
    mhvp = _jitted_masked_batch_hvp(loss_fn, per_batch_norm, precision, fl)

    labels, spans = trees.partition_labels(params)
    results = {}
    for li, (label, (off, size)) in enumerate(zip(labels, spans)):
        if size < min_size:
            continue
        iters = min(num_iters, size)
        start = jnp.int32(off)
        sz = jnp.int32(size)
        v0 = jax.random.normal(jax.random.fold_in(key, li), (fl.size,), jnp.float32)
        idx = np.arange(fl.size)
        host_mask = jnp.asarray((idx >= off) & (idx < off + size), jnp.float32)
        q_cur = v0 * host_mask
        q_cur = q_cur / jnp.maximum(jnp.linalg.norm(q_cur), 1e-30)
        q_prev = jnp.zeros_like(q_cur)
        beta_prev = jnp.float32(0.0)
        alphas, betas = [], []
        for _ in range(iters):
            w = mhvp(q_cur, start, sz, params, batch)
            if scale != 1.0:
                w = w * scale
            alpha, beta, q_next = host_recurrence_step(w, q_cur, q_prev, beta_prev)
            q_prev, q_cur, beta_prev = q_cur, q_next, beta
            alphas.append(alpha)
            betas.append(beta)
        results[label] = LanczosResult(
            alphas=jnp.stack(alphas).astype(jnp.float32),
            betas=(
                jnp.stack(betas[:-1]).astype(jnp.float32)
                if len(betas) > 1
                else jnp.zeros((0,), jnp.float32)
            ),
            basis=None,
        )
        if progress:
            from hessian_llm_vision_tpu.krylov.slq import ritz_decomposition

            ev = np.sort(np.asarray(ritz_decomposition(results[label]).eigvals))
            print(
                f"{label:60s} P={size:9d} max={ev[-1]:10.4f} min={ev[0]:10.4f}",
                flush=True,
            )
    return results


def dataset_spectrum_host(
    loss_fn: Callable[[Any, Any], jax.Array],
    params: Any,
    batch_list: Sequence[Any],
    num_iters: int,
    *,
    key: Optional[jax.Array] = None,
    v0: Optional[jax.Array] = None,
    normalization: str = "dataset",
    batch_size: Optional[int] = None,
    precision: Optional[str] = "high",
    flattener: Optional[Flattener] = None,
    callback: Optional[Callable[[int, np.ndarray, np.ndarray], None]] = None,
    progress: bool = False,
    operator: str = "hessian",
    model_fn: Optional[Callable[[Any, Any], jax.Array]] = None,
    out_loss_fn: Optional[Callable[[jax.Array, Any], jax.Array]] = None,
) -> LanczosResult:
    """T-only Lanczos of the dataset-mean curvature operator, host-driven.

    ``batch_list``: equal-size device-ready batches (the loader).  Returns
    a :class:`LanczosResult` (basis=None); feed to ``ritz_decomposition``.
    ``callback(i, alphas, betas)`` per iteration for resumable checkpoints.

    ``operator``: "hessian" (default, from ``loss_fn``) or "ggn"/"fisher"
    (requires ``model_fn`` + ``out_loss_fn``; Fisher == GGN of the NLL) —
    the LLM-scale path for the reference's GN/FIM spectra
    (colaexp.py:100-110).
    """
    fl = flattener or Flattener(params)
    if (v0 is None) == (key is None):
        raise ValueError("pass exactly one of v0 / key")
    num_batches = len(batch_list)
    # Whole-dataset semantics, identical to DatasetHessianOperator:
    # "dataset"/"mean" -> Hessian of the dataset-mean loss;
    # "sum" -> Hessian of the dataset-summed loss (= N x mean).
    if normalization in ("dataset", "mean"):
        per_batch_norm, scale = "mean", 1.0 / num_batches
    elif normalization == "sum":
        if batch_size is None:
            raise ValueError('normalization="sum" requires batch_size')
        per_batch_norm, scale = "mean", float(batch_size)
    else:
        raise ValueError(normalization)
    if operator in ("ggn", "fisher"):
        if model_fn is None or out_loss_fn is None:
            raise ValueError(f"operator={operator!r} needs model_fn+out_loss_fn")
        # out_loss_fn is already a per-batch mean; "sum" semantics come
        # from the same scale factor as the Hessian path
        batch_hvp = _jitted_batch_ggn(model_fn, out_loss_fn, precision, fl)
    elif operator == "hessian":
        batch_hvp = _jitted_batch_hvp(loss_fn, per_batch_norm, precision, fl)
    else:
        raise ValueError(f"unknown operator {operator!r}")

    if v0 is None:
        v0 = jax.random.normal(key, (fl.size,), jnp.float32)
    q_cur = v0.astype(jnp.float32)
    q_cur = q_cur / jnp.maximum(jnp.linalg.norm(q_cur), 1e-30)
    q_prev = jnp.zeros_like(q_cur)
    beta_prev = jnp.float32(0.0)
    alphas: List[float] = []
    betas: List[float] = []
    for i in range(num_iters):
        t0 = time.perf_counter()
        w = batch_hvp(q_cur, params, batch_list[0])
        for b in batch_list[1:]:
            w = w + batch_hvp(q_cur, params, b)
        if scale != 1.0:
            w = w * scale
        alpha, beta, q_next = host_recurrence_step(w, q_cur, q_prev, beta_prev)
        q_prev, q_cur, beta_prev = q_cur, q_next, beta
        # keep alpha/beta as DEVICE scalars: a float() per iteration is a
        # synchronous host fetch that stalls the dispatch pipeline (measured
        # 1.8x on the whole spectrum through a high-latency link); they are
        # materialized once at the end (or per callback, which opts into it)
        alphas.append(alpha)
        betas.append(beta)
        if callback is not None:
            callback(
                i,
                np.asarray(jnp.stack(alphas)),
                np.asarray(jnp.stack(betas[:-1])) if len(betas) > 1 else np.zeros((0,)),
            )
        if progress:
            print(
                f"lanczos iter {i + 1}/{num_iters}  "
                f"{time.perf_counter() - t0:.2f}s",
                flush=True,
            )
    return LanczosResult(
        alphas=jnp.stack(alphas).astype(jnp.float32),
        betas=jnp.stack(betas[:-1]).astype(jnp.float32),
        basis=None,
    )
