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


# jitted one-op helpers: eager ops dispatch SYNCHRONOUSLY through this
# backend's remote tunnel (one RTT each); module-level jit wrappers keep
# one cached program per shape across all driver calls
_jit_add = jax.jit(lambda a, b: a + b)
_jit_scale = jax.jit(lambda a, s: a * s)


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


def matvec_precision_probe(
    loss_fn: Callable[[Any, Any], jax.Array],
    params: Any,
    batch: Any,
    *,
    vector: Optional[jax.Array] = None,
    key: Optional[jax.Array] = None,
    precision: Optional[str] = "high",
    referee_precision: str = "highest",
    referee_loss_fn: Optional[Callable[[Any, Any], jax.Array]] = None,
    flattener: Optional[Flattener] = None,
    ritz_iters: int = 0,
) -> dict:
    """Measure the requested-precision HVP against an f32 referee, one batch.

    Low-precision curvature error is CHECKPOINT-DEPENDENT, not a property
    of the model: the 'mixed' (blocks-at-bf16) mode is ≤5e-4 on extreme
    Ritz values for GPT-2 124M at random init yet inflates λmax 5.8× on
    the same model after 2000 Adam steps, where curvature is 10⁵× larger
    (measured A/B: artifacts/trained124m_r3/).  This probe makes that
    failure detectable for ~2 extra HVPs BEFORE a spectrum job spends its
    budget: it computes ``w = H v`` for one unit probe vector under the
    requested ``precision`` and under ``referee_precision`` (f32 6-pass by
    default) and reports

    * ``rel_err``       — ‖w_req − w_ref‖₂ / ‖w_ref‖₂ (normalization-
      invariant: both arms use the per-batch mean loss),
    * ``alpha_rel_err`` — relative error of the Rayleigh quotient vᵀw,
      i.e. the first Lanczos α (what the recurrence actually consumes),
    * per-arm wall seconds (the speed the accuracy is buying),
    * with ``ritz_iters=N > 0``: ``ritz_rel_err`` — the worst relative
      disagreement of the extreme Ritz values (λmax AND λmin) between an
      N-iteration T-only Lanczos run in each arm from the same probe.

    **Which number gates the job**: ``ritz_rel_err``, not ``rel_err``.
    Extremal Ritz values are robust to spectrally incoherent matvec noise
    — measured on-chip at 124M random init, mixed shows matvec rel err
    1.1e-2 yet extreme-Ritz error only ~5e-4 (passes the parity bar),
    while the trained ckpt2000 shows matvec rel err 1.04 and Ritz values
    off 5.8× (.logs/prec_check_demo.log).  ``alpha_rel_err`` is reported
    for completeness but is meaningless near E[λ]≈0 (LM Hessians: the
    first Rayleigh quotient of a random probe is a near-zero mean, so its
    RELATIVE error blows up without any spectrum-level inaccuracy).

    ``referee_loss_fn``: pass a separately-built loss when the low
    precision is baked into the model itself (the CLI's
    ``--block_precision`` / ``--hvp_precision mixed`` path rebuilds the
    model with ``block_matmul_precision=None`` for the referee arm);
    defaults to ``loss_fn``.

    The requested-precision program comes from the SAME module-level cache
    (:func:`_jitted_batch_hvp`) the spectrum host loops use, so the probe
    adds one referee compile, not two.  Reference role: none — the
    reference runs f64-capable CUDA matmuls and never needed this; on TPU
    the bf16-family speed tiers make it a first-class safety check.
    """
    fl = flattener or Flattener(params)
    if (vector is None) == (key is None):
        raise ValueError("pass exactly one of vector / key")
    if vector is None:
        vector = jax.random.normal(key, (fl.size,), jnp.float32)
    v = vector.astype(jnp.float32)
    v = v / jnp.maximum(jnp.linalg.norm(v), 1e-30)

    req = _jitted_batch_hvp(loss_fn, "mean", precision, fl)
    ref = _jitted_batch_hvp(
        referee_loss_fn or loss_fn, "mean", referee_precision, fl
    )

    # first dispatch warms the program (compile can be minutes through the
    # remote tunnel); the TIMED dispatch is the second one, so the reported
    # per-HVP seconds are steady-state — the speed-vs-accuracy comparison
    # the caller prints would otherwise be dominated by one-time compiles
    w_req = req(v, params, batch)
    w_req.block_until_ready()
    t0 = time.perf_counter()
    req(v, params, batch).block_until_ready()
    t_req = time.perf_counter() - t0
    w_ref = ref(v, params, batch)
    w_ref.block_until_ready()
    t0 = time.perf_counter()
    ref(v, params, batch).block_until_ready()
    t_ref = time.perf_counter() - t0

    # one fused comparison program: 2 P-vectors in, 3 scalars out (never
    # stage the P-vectors on host — tunnel D2H is 5 MB/s)
    diff_norm, ref_norm, a_req, a_ref = _jit_probe_stats(w_req, w_ref, v)
    ref_n = float(ref_norm)
    a_ref_f = float(a_ref)
    stats = {
        "rel_err": float(diff_norm) / max(ref_n, 1e-30),
        "alpha_rel_err": abs(float(a_req) - a_ref_f) / max(abs(a_ref_f), 1e-30),
        "alpha_requested": float(a_req),
        "alpha_referee": a_ref_f,
        "seconds_requested": t_req,
        "seconds_referee": t_ref,
    }
    if ritz_iters > 0:
        lo_q, hi_q = _tiny_lanczos_extremes(req, v, params, batch, ritz_iters)
        lo_r, hi_r = _tiny_lanczos_extremes(ref, v, params, batch, ritz_iters)
        scale_r = max(abs(lo_r), abs(hi_r), 1e-30)
        stats["ritz_rel_err"] = max(abs(hi_q - hi_r), abs(lo_q - lo_r)) / scale_r
        stats["ritz_extremes_requested"] = (lo_q, hi_q)
        stats["ritz_extremes_referee"] = (lo_r, hi_r)
    return stats


@functools.lru_cache(maxsize=8)
def _jitted_reorth_recurrence_step(k: int, basis_dtype):
    """One cached Lanczos step with CGS2 full reorthogonalization against
    a FIXED (k, P) basis buffer (rows ≤ i live, row mask in-program, so
    every iteration reuses ONE compiled program — growing-shape reorth
    would recompile per iteration through the remote tunnel).

    The basis is STORED ``basis_dtype`` (bf16 default: 2.5 GB at 124M for
    k=10), arithmetic f32 — the repo's --qprev_bf16 convention.  The
    buffer is donated through the step so no copy accumulates.
    """

    @functools.partial(jax.jit, donate_argnums=(1,))
    def step(w, Q, i, q_cur, q_prev, beta_prev):
        alpha = jnp.vdot(q_cur, w)
        w = w - alpha * q_cur - beta_prev * q_prev
        Q = Q.at[i].set(q_cur.astype(Q.dtype))
        mask = (jnp.arange(k) <= i).astype(jnp.float32)
        for _ in range(2):  # CGS2
            coeff = (Q.astype(jnp.float32) @ w) * mask
            w = w - Q.astype(jnp.float32).T @ coeff
        beta = jnp.linalg.norm(w)
        q_next = w / jnp.maximum(beta, 1e-30)
        return alpha, beta, q_next, Q

    return step


def _tiny_lanczos_extremes(
    batch_hvp, v0, params, batch, num_iters, *, reorth=False,
    basis_dtype=jnp.bfloat16,
):
    """(λ_min, λ_max) Ritz estimates from a short Lanczos over one batch's
    cached HVP program — the probe quantity the parity bar gates.
    Host-driven: each iteration is one dispatch of ``batch_hvp`` (never a
    chained program; remote-compile ceiling, CLAUDE.md).

    ``reorth=True`` keeps a (num_iters, P) ``basis_dtype`` buffer and
    CGS2-reorthogonalizes every iterate.  REQUIRED for arm-vs-arm
    precision comparisons on ill-conditioned (trained) checkpoints: the
    plain three-term recurrence is chaotic there (measured at 124M
    ckpt2000, κ~10⁷: strict-vs-f32 extremes disagree by 4.4e-1 on the
    no-reorth probe while the reorthogonalized/full-job values agree to
    ~1e-4), so without reorth the probe measures trajectory divergence,
    not operator error."""
    q_cur, q_prev = v0, jnp.zeros_like(v0)
    beta_prev = jnp.float32(0.0)
    alphas, betas = [], []
    if reorth:
        rstep = _jitted_reorth_recurrence_step(num_iters, basis_dtype)
        Q = jnp.zeros((num_iters, v0.shape[0]), basis_dtype)
        for i in range(num_iters):
            w = batch_hvp(q_cur, params, batch)
            alpha, beta, q_next, Q = rstep(
                w, Q, jnp.int32(i), q_cur, q_prev, beta_prev
            )
            q_prev, q_cur, beta_prev = q_cur, q_next, beta
            alphas.append(alpha)
            betas.append(beta)
        del Q
    else:
        for _ in range(num_iters):
            w = batch_hvp(q_cur, params, batch)
            alpha, beta, q_next = host_recurrence_step(
                w, q_cur, q_prev, beta_prev
            )
            q_prev, q_cur, beta_prev = q_cur, q_next, beta
            alphas.append(alpha)
            betas.append(beta)
    a = np.asarray(jnp.stack(alphas), np.float64)
    b = np.asarray(jnp.stack(betas[:-1]), np.float64) if num_iters > 1 else np.zeros((0,))
    T = np.diag(a) + np.diag(b, 1) + np.diag(b, -1)
    ev = np.linalg.eigvalsh(T)
    return float(ev[0]), float(ev[-1])


_jit_probe_stats = jax.jit(
    lambda w_req, w_ref, v: (
        jnp.linalg.norm(w_req - w_ref),
        jnp.linalg.norm(w_ref),
        jnp.vdot(v, w_req),
        jnp.vdot(v, w_ref),
    )
)


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


@functools.lru_cache(maxsize=8)
def _jitted_fused_lanczos_step(loss_fn, per_batch_norm, precision, fl, batch_size=None):
    """HVP + three-term recurrence in ONE donating program — the >1B-param
    memory plan.

    At Pythia-1.4B f32 the naive host loop holds params (5.7 GB) plus
    FOUR P-vectors (q_cur, q_prev, w, q_next ≈ 22.6 GB) — over one chip's
    HBM.  Here q_cur and q_prev are DONATED: XLA reuses q_prev's buffer
    for the recurrence output and aliases q_cur through to the new q_prev,
    so steady state is params + 2 live P-buffers + the HVP working set.
    ``q_prev`` may be bf16 (halves one buffer): it enters only the
    ``- beta_prev * q_prev`` reorthogonalization term, a ~1e-3-relative
    perturbation of the same order as the no-reorth drift the reference's
    own T-only loop accepts (diego_pythia.py:157-192; parity measured in
    tests/unit/test_driver.py::test_fused_step_bf16_qprev).
    """
    from hessian_llm_vision_tpu.curvature.hvp import hvp_fn

    _hvp = hvp_fn(
        loss_fn,
        normalization=per_batch_norm,
        batch_size=batch_size,
        precision=precision,
    )

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def fused_step(q_cur, q_prev, beta_prev, params, batch):
        w = fl.flatten(_hvp(params, batch, fl.unflatten(q_cur)))
        alpha = jnp.vdot(q_cur, w)
        w = w - alpha * q_cur - beta_prev * q_prev.astype(jnp.float32)
        beta = jnp.linalg.norm(w)
        q_next = w / jnp.maximum(beta, 1e-30)
        return alpha, beta, q_next, q_cur.astype(q_prev.dtype)

    return fused_step


def linearized_spectrum_host(
    loss_fn: Callable[[Any, Any], jax.Array],
    params: Any,
    batch: Any,
    num_iters: int,
    *,
    key: Optional[jax.Array] = None,
    v0: Optional[jax.Array] = None,
    normalization: str = "mean",
    batch_size: Optional[int] = None,
    precision: Optional[str] = "high",
    flattener: Optional[Flattener] = None,
    callback: Optional[Callable[[int, np.ndarray, np.ndarray], None]] = None,
    progress: bool = False,
) -> LanczosResult:
    """T-only single-batch Lanczos over the LINEARIZED operator: the
    primal forward+backward is paid ONCE (curvature/linearized.py), every
    iteration runs the tangent map alone (0.72x the HVP flops — the
    algorithmic lever on the compute-bound blocks-X6 tier, where shape
    tuning is flat; artifacts/mfu_r5/).  Memory: the residuals are ~2.65
    GiB/sequence at 124M seq512 — single-batch bs<=4 territory; budget
    with ``curvature.residual_bytes``.
    """
    from hessian_llm_vision_tpu.curvature.linearized import (
        linearized_hvp_programs,
    )

    fl = flattener or Flattener(params)
    if (v0 is None) == (key is None):
        raise ValueError("pass exactly one of v0 / key")
    if v0 is None:
        v0 = jax.random.normal(key, (fl.size,), jnp.float32)
    resid_p, tangent_p = linearized_hvp_programs(
        loss_fn, normalization, precision, fl, batch_size
    )
    consts = resid_p(params, batch)
    q_cur = v0.astype(jnp.float32)
    q_cur = q_cur / jnp.maximum(jnp.linalg.norm(q_cur), 1e-30)
    q_prev = jnp.zeros_like(q_cur)
    beta_prev = jnp.float32(0.0)
    alphas: List[float] = []
    betas: List[float] = []
    for i in range(num_iters):
        t0 = time.perf_counter()
        w = tangent_p(q_cur, consts, params, batch)
        alpha, beta, q_next = host_recurrence_step(w, q_cur, q_prev, beta_prev)
        q_prev, q_cur, beta_prev = q_cur, q_next, beta
        alphas.append(alpha)
        betas.append(beta)
        if callback is not None:
            callback(
                i,
                np.asarray(jnp.stack(alphas)),
                np.asarray(jnp.stack(betas[:-1])) if len(betas) > 1
                else np.zeros((0,)),
            )
        if progress:
            print(
                f"linearized lanczos iter {i + 1}/{num_iters}  "
                f"{time.perf_counter() - t0:.2f}s",
                flush=True,
            )
    del consts
    return LanczosResult(
        alphas=jnp.stack(alphas).astype(jnp.float32),
        betas=(jnp.stack(betas[:-1]).astype(jnp.float32)
               if len(betas) > 1 else jnp.zeros((0,), jnp.float32)),
        basis=None,
    )


def single_batch_spectrum_host_fused(
    loss_fn: Callable[[Any, Any], jax.Array],
    params: Any,
    batch: Any,
    num_iters: int,
    *,
    key: Optional[jax.Array] = None,
    v0: Optional[jax.Array] = None,
    normalization: str = "mean",
    batch_size: Optional[int] = None,
    precision: Optional[str] = "high",
    flattener: Optional[Flattener] = None,
    qprev_bf16: bool = False,
    callback: Optional[Callable[[int, np.ndarray, np.ndarray], None]] = None,
    progress: bool = False,
) -> LanczosResult:
    """T-only Lanczos via the fused donating step (big-model memory plan).

    Single-batch Hessian (the reference's per-batch spectrum mode,
    gpt2_hessian.py:102-127); for >1B-parameter models where
    ``dataset_spectrum_host``'s separate-program buffers exceed HBM.
    """
    fl = flattener or Flattener(params)
    if (v0 is None) == (key is None):
        raise ValueError("pass exactly one of v0 / key")
    step = _jitted_fused_lanczos_step(
        loss_fn, normalization, precision, fl, batch_size
    )
    if v0 is None:
        v0 = jax.random.normal(key, (fl.size,), jnp.float32)
    q_cur = v0.astype(jnp.float32)
    q_cur = q_cur / jnp.maximum(jnp.linalg.norm(q_cur), 1e-30)
    qdtype = jnp.bfloat16 if qprev_bf16 else jnp.float32
    q_prev = jnp.zeros((fl.size,), qdtype)
    beta_prev = jnp.float32(0.0)
    alphas: List[Any] = []
    betas: List[Any] = []
    for i in range(num_iters):
        t0 = time.perf_counter()
        alpha, beta, q_cur, q_prev = step(q_cur, q_prev, beta_prev, params, batch)
        beta_prev = beta
        alphas.append(alpha)
        betas.append(beta)
        if callback is not None:
            callback(
                i,
                np.asarray(jnp.stack(alphas)),
                np.asarray(jnp.stack(betas[:-1])) if len(betas) > 1 else np.zeros((0,)),
            )
        if progress:
            jax.block_until_ready(beta)
            print(
                f"lanczos iter {i + 1}/{num_iters}  "
                f"{time.perf_counter() - t0:.2f}s",
                flush=True,
            )
    return LanczosResult(
        alphas=jnp.stack(alphas).astype(jnp.float32),
        # num_iters=1 leaves no off-diagonal entries; stack() rejects []
        betas=(jnp.stack(betas[:-1]).astype(jnp.float32)
               if len(betas) > 1 else jnp.zeros((0,), jnp.float32)),
        basis=None,
    )


@functools.lru_cache(maxsize=8)
def _jitted_bigmodel_step(loss_fn, per_batch_norm, precision, q_dtype_name,
                          batch_size=None):
    """PYTREE-native fused Lanczos step with low-precision-stored vectors —
    the memory plan that actually fits >1B parameters on one 16 GB chip.

    The flat-vector fused step (``_jitted_fused_lanczos_step``) OOMs at
    Pythia-1.4B: measured 26.19 GB needed vs 15.75 GB HBM, ~11 GB of it the
    flatten/unflatten copies between ℝᴾ vectors and the parameter pytree
    (.logs/pythia1p4b_r3.log).  Here the Krylov vectors ARE parameter-shaped
    pytrees (no flat copies ever exist), stored in ``q_dtype`` (bf16 =
    2.26 GB instead of 5.66 GB per vector at 1.4B), donated across
    iterations, with ALL recurrence arithmetic (dots, axpy, norm) in f32.

    Accuracy: bf16 storage quantizes each Lanczos vector to ~3e-3 relative
    per component; measured effect on extreme Ritz values is ~1e-3 relative
    (tests/unit/test_driver.py::test_bigmodel_step_bf16_accuracy), the same
    order as the no-reorthogonalization drift the reference's own T-only
    hand loop accepts at this scale (diego_pythia.py:157-192).  Use f32
    ``q_dtype`` when the model fits.
    """
    from hessian_llm_vision_tpu.curvature.hvp import hvp_fn

    q_dtype = jnp.dtype(q_dtype_name)
    _hvp = hvp_fn(loss_fn, normalization=per_batch_norm, precision=precision,
                  batch_size=batch_size)

    def tvdot(a, b):
        return sum(
            jnp.vdot(x.astype(jnp.float32), y.astype(jnp.float32))
            for x, y in zip(
                jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)
            )
        )

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(q_cur, q_prev, beta_prev, params, batch):
        tangent = jax.tree_util.tree_map(
            lambda q: q.astype(jnp.float32), q_cur
        )
        w = _hvp(params, batch, tangent)
        # quantize each HVP-output leaf to q_dtype IMMEDIATELY: XLA fuses
        # the convert into the leaf's producer and frees the f32 version,
        # so the full f32 w pytree (5.66 GB at 1.4B) never coexists —
        # measured 18.36 GB -> fits after this (the last 2.6 GB over HBM)
        w = jax.tree_util.tree_map(lambda wl: wl.astype(q_dtype), w)
        alpha = tvdot(q_cur, w)
        w = jax.tree_util.tree_map(
            lambda wl, qc, qp: (
                wl.astype(jnp.float32)
                - alpha * qc.astype(jnp.float32)
                - beta_prev * qp.astype(jnp.float32)
            ).astype(q_dtype),
            w,
            q_cur,
            q_prev,
        )
        beta = jnp.sqrt(tvdot(w, w))
        q_next = jax.tree_util.tree_map(
            lambda wl: (wl.astype(jnp.float32) / jnp.maximum(beta, 1e-30)).astype(
                q_dtype
            ),
            w,
        )
        return alpha, beta, q_next, q_cur

    return step


def bigmodel_spectrum_host(
    loss_fn: Callable[[Any, Any], jax.Array],
    params: Any,
    batch: Any,
    num_iters: int,
    *,
    key: jax.Array,
    normalization: str = "mean",
    batch_size: Optional[int] = None,
    precision: Optional[str] = "high",
    q_dtype: Any = jnp.bfloat16,
    callback: Optional[Callable[[int, np.ndarray, np.ndarray], None]] = None,
    progress: bool = False,
) -> LanczosResult:
    """T-only single-batch Lanczos for models near the HBM limit.

    See :func:`_jitted_bigmodel_step` for the memory plan.  The seeded
    start vector is generated PER-LEAF (same key folding as the flat path
    would use a single normal draw; documented difference — the probe
    vector is random either way, reference seeds theirs with
    torch.randn(P), diego_pythia.py:146-149).
    """
    q_dtype = jnp.dtype(q_dtype)
    step = _jitted_bigmodel_step(
        loss_fn, normalization, precision, q_dtype.name, batch_size
    )

    leaves, treedef = jax.tree_util.tree_flatten(params)
    keys = jax.random.split(key, len(leaves))

    @jax.jit
    def init_q(params, keys):
        ls, td = jax.tree_util.tree_flatten(params)
        qs = [
            jax.random.normal(k, l.shape, jnp.float32)
            for k, l in zip(keys, ls)
        ]
        nrm = jnp.sqrt(sum(jnp.vdot(q, q) for q in qs))
        return jax.tree_util.tree_unflatten(
            td, [(q / jnp.maximum(nrm, 1e-30)).astype(q_dtype) for q in qs]
        )

    q_cur = init_q(params, keys)
    q_prev = jax.tree_util.tree_map(
        lambda l: jnp.zeros(l.shape, q_dtype), params
    )
    beta_prev = jnp.float32(0.0)
    alphas: List[Any] = []
    betas: List[Any] = []
    for i in range(num_iters):
        t0 = time.perf_counter()
        alpha, beta, q_cur, q_prev = step(q_cur, q_prev, beta_prev, params, batch)
        beta_prev = beta
        alphas.append(alpha)
        betas.append(beta)
        if callback is not None:
            callback(
                i,
                np.asarray(jnp.stack(alphas)),
                np.asarray(jnp.stack(betas[:-1])) if len(betas) > 1 else np.zeros((0,)),
            )
        if progress:
            jax.block_until_ready(beta)
            print(
                f"lanczos iter {i + 1}/{num_iters}  "
                f"{time.perf_counter() - t0:.2f}s",
                flush=True,
            )
    return LanczosResult(
        alphas=jnp.stack(alphas).astype(jnp.float32),
        # num_iters=1 leaves no off-diagonal entries; stack() rejects []
        betas=(jnp.stack(betas[:-1]).astype(jnp.float32)
               if len(betas) > 1 else jnp.zeros((0,), jnp.float32)),
        basis=None,
    )


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
    group_regex: Optional[str] = None,
):
    """Per-leaf block-diagonal spectra at LLM scale, host-driven.

    One masked-HVP program serves every leaf; the three-term recurrence is
    T-only (no basis kept).  Returns ``{leaf_label: LanczosResult}`` — the
    per-layer λmax/λmin table of
    /root/reference/lanczostrain_layer_hand.py:183-185 /
    gpt2_savehessian_layer.py at any model size this backend can HVP.

    ``group_regex``: merge leaves into one block per regex group (e.g.
    ``trees.BLOCK_GROUP_REGEX`` for one spectrum per transformer block —
    the reference's per-block sweep, ipynbs/visual-eigen.ipynb cell 12);
    non-matching leaves are skipped.
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
    if group_regex is not None:
        labels, spans = trees.group_spans(labels, spans, group_regex)
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
                w = _jit_scale(w, jnp.float32(scale))
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


def dataset_norm(normalization, num_batches, batch_size=None):
    """Whole-dataset loss-scaling semantics, identical to
    ``DatasetHessianOperator``: "dataset"/"mean" -> Hessian of the
    dataset-mean loss; "sum" -> Hessian of the dataset-summed loss
    (= N x mean).  Returns ``(per_batch_norm, scale)``."""
    if normalization in ("dataset", "mean"):
        return "mean", 1.0 / num_batches
    if normalization == "sum":
        if batch_size is None:
            raise ValueError('normalization="sum" requires batch_size')
        return "mean", float(batch_size)
    raise ValueError(normalization)


def fused_dataset_iteration_body(loss_fn, per_batch_norm, precision, fl):
    """One whole Lanczos iteration of the dataset-mean Hessian operator as
    a pure function ``(q_cur, q_prev, beta_prev, scale, params, batches) ->
    (alpha, beta, q_next, q_cur)`` — the scan-over-batches HVP reduce plus
    the three-term recurrence.  Shared by the single-probe fused step and
    the probe-parallel mesh path (``parallel/probe_parallel.py``), which
    ``vmap``s it over a sharded probe axis."""
    from hessian_llm_vision_tpu.curvature.hvp import hvp_fn

    _hvp = hvp_fn(loss_fn, normalization=per_batch_norm, precision=precision)

    def step(q_cur, q_prev, beta_prev, scale, params, batches):
        tangent = fl.unflatten(q_cur)

        def body(acc, batch):
            return acc + fl.flatten(_hvp(params, batch, tangent)), None

        w, _ = jax.lax.scan(body, jnp.zeros_like(q_cur), batches)
        w = w * scale
        alpha = jnp.vdot(q_cur, w)
        w = w - alpha * q_cur - beta_prev * q_prev
        beta = jnp.linalg.norm(w)
        q_next = w / jnp.maximum(beta, 1e-30)
        return alpha, beta, q_next, q_cur

    return step


def fused_dataset_ggn_iteration_body(model_fn, out_loss_fn, precision, fl):
    """GGN/Fisher variant of :func:`fused_dataset_iteration_body`: the
    dataset-averaged ``Jᵀ H_out J v`` reduce + three-term recurrence (same
    per-batch product as ``_jitted_batch_ggn``)."""

    def step(q_cur, q_prev, beta_prev, scale, params, batches):
        vt = fl.unflatten(q_cur)

        def one(batch):
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

        def body(acc, batch):
            return acc + one(batch), None

        w, _ = jax.lax.scan(body, jnp.zeros_like(q_cur), batches)
        w = w * scale
        alpha = jnp.vdot(q_cur, w)
        w = w - alpha * q_cur - beta_prev * q_prev
        beta = jnp.linalg.norm(w)
        q_next = w / jnp.maximum(beta, 1e-30)
        return alpha, beta, q_next, q_cur

    return step


@functools.lru_cache(maxsize=32)
def _jitted_fused_dataset_step(loss_fn, per_batch_norm, precision, fl):
    """Whole Lanczos iteration of the dataset operator in ONE program.

    ``dataset_spectrum_host``'s unfused loop dispatches 9 programs per
    iteration (4 batch-HVPs + 3 adds + scale + recurrence on the headline
    job); through this backend's high-latency tunnel each dispatch costs a
    round trip, which is ~half the 124M 35-iter wallclock.  Here the
    batches are STACKED along a leading axis and reduced with ``lax.scan``
    — the HVP body is traced ONCE, so the program stays in the same size
    class as one HVP (the remote-compiler ceiling; CLAUDE.md) — and the
    three-term recurrence rides in the same program with q_cur/q_prev
    donated.  Dispatches per iteration: 1.
    """
    return jax.jit(
        fused_dataset_iteration_body(loss_fn, per_batch_norm, precision, fl),
        donate_argnums=(0, 1),
    )


@functools.lru_cache(maxsize=32)
def _jitted_fused_dataset_ggn_step(model_fn, out_loss_fn, precision, fl):
    """Jitted/donating :func:`fused_dataset_ggn_iteration_body`."""
    return jax.jit(
        fused_dataset_ggn_iteration_body(model_fn, out_loss_fn, precision, fl),
        donate_argnums=(0, 1),
    )


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
    fused: bool = False,
) -> LanczosResult:
    """T-only Lanczos of the dataset-mean curvature operator, host-driven.

    ``batch_list``: equal-size device-ready batches (the loader).  Returns
    a :class:`LanczosResult` (basis=None); feed to ``ritz_decomposition``.
    ``callback(i, alphas, betas)`` per iteration for resumable checkpoints.

    ``operator``: "hessian" (default, from ``loss_fn``) or "ggn"/"fisher"
    (requires ``model_fn`` + ``out_loss_fn``; Fisher == GGN of the NLL) —
    the LLM-scale path for the reference's GN/FIM spectra
    (colaexp.py:100-110).

    ``fused``: run each whole iteration (scan-over-batches matvec reduce +
    three-term recurrence) as ONE donating program
    (:func:`_jitted_fused_dataset_step` /
    :func:`_jitted_fused_dataset_ggn_step`) — 1 dispatch/iteration instead
    of ~9; the tunnel-latency win.
    """
    fl = flattener or Flattener(params)
    if (v0 is None) == (key is None):
        raise ValueError("pass exactly one of v0 / key")
    num_batches = len(batch_list)
    per_batch_norm, scale = dataset_norm(normalization, num_batches, batch_size)
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

    fstep = stacked = None
    if fused:
        if operator in ("ggn", "fisher"):
            # same scale factor as the unfused GGN path (out_loss_fn is a
            # per-batch mean; "sum" semantics ride the shared scale)
            fstep = _jitted_fused_dataset_ggn_step(
                model_fn, out_loss_fn, precision, fl
            )
        else:
            fstep = _jitted_fused_dataset_step(
                loss_fn, per_batch_norm, precision, fl
            )
        stacked = jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs), *batch_list
        )
        scale_dev = jnp.float32(scale)
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
        if fused:
            alpha, beta, q_cur, q_prev = fstep(
                q_cur, q_prev, beta_prev, scale_dev, params, stacked
            )
            beta_prev = beta
        else:
            w = batch_hvp(q_cur, params, batch_list[0])
            for b in batch_list[1:]:
                w = _jit_add(w, batch_hvp(q_cur, params, b))
            if scale != 1.0:
                w = _jit_scale(w, jnp.float32(scale))
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
        # num_iters=1 leaves no off-diagonal entries; stack() rejects []
        betas=(jnp.stack(betas[:-1]).astype(jnp.float32)
               if len(betas) > 1 else jnp.zeros((0,), jnp.float32)),
        basis=None,
    )


@functools.lru_cache(maxsize=16)
def _jitted_fused_trlan_step(loss_fn, per_batch_norm, precision, fl, pad=0):
    """One whole thick-restart inner iteration in ONE donating program.

    Dataset-mean HVP (scan over stacked batches) + Lanczos α + CGS2
    against the first j+1 rows of the (m+1, P) basis buffer + the
    invariant-subspace redirect + the row-(j+1) write — the
    ``_jitted_fused_dataset_step`` treatment applied to thick restart
    (VERDICT r3 #4: the unfused TRLan driver paid ~4 dispatches + 3
    blocking scalar fetches per iteration through the tunnel, 3.1 s/HVP
    vs 0.138 s/HVP on the fused bench loop).  ``Q`` is donated so the
    row write aliases in place (one live (m+1, P) buffer, the
    thick-restart memory plan); α/β return as DEVICE scalars for
    once-per-cycle fetch.

    The breakdown redirect (‖w‖ collapses to f32 roundoff of ‖A q‖)
    rides in-program via ``lax.cond``: the fresh random direction is
    drawn from ``key``, masked to the true (unpadded) subspace, CGS2'd
    once, and flagged by β = 0 — exactly the unfused branch's record.

    Reference role: none (the reference never restarts; SURVEY §2.3 is
    one unrestarted pass) — this is the TPU memory-plan extension.
    """
    from hessian_llm_vision_tpu.curvature.hvp import hvp_fn
    from hessian_llm_vision_tpu.krylov.thick_restart import _orth_body

    _hvp = hvp_fn(loss_fn, normalization=per_batch_norm, precision=precision)
    true_dim = fl.size

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(Q, j, key, scale, params, batches):
        q = jax.lax.dynamic_slice_in_dim(Q, j, 1, axis=0)[0]
        q = q.astype(jnp.float32)
        tangent = fl.unflatten(q[:true_dim] if pad else q)

        def body(acc, batch):
            return acc + fl.flatten(_hvp(params, batch, tangent)), None

        w, _ = jax.lax.scan(
            body, jnp.zeros((true_dim,), jnp.float32), batches
        )
        w = w * scale
        if pad:
            w = jnp.pad(w, (0, pad))
        alpha = jnp.vdot(q, w)
        w, nrm, nrm0 = _orth_body(Q, w, j + 1)
        breakdown = nrm <= 1e-5 * jnp.maximum(nrm0, 1e-30)

        def fresh(_):
            r = jax.random.normal(key, (Q.shape[1],), jnp.float32)
            if pad:
                r = jnp.where(jnp.arange(Q.shape[1]) < true_dim, r, 0.0)
            r, rn, _ = _orth_body(Q, r, j + 1)
            return r, rn

        w2, nrm2 = jax.lax.cond(breakdown, fresh, lambda _: (w, nrm), None)
        beta = jnp.where(breakdown, jnp.float32(0.0), nrm)
        q_next = w2 / jnp.maximum(nrm2, 1e-30)
        Q = jax.lax.dynamic_update_slice(
            Q, q_next.astype(Q.dtype)[None, :], (j + 1, 0)
        )
        return Q, alpha, beta

    return step


def dataset_thick_restart_host(
    loss_fn: Callable[[Any, Any], jax.Array],
    params: Any,
    batch_list: Sequence[Any],
    k: int,
    *,
    key: Optional[jax.Array] = None,
    v0: Optional[jax.Array] = None,
    inner: Optional[int] = None,
    normalization: str = "dataset",
    batch_size: Optional[int] = None,
    precision: Optional[str] = "high",
    flattener: Optional[Flattener] = None,
    store_dtype=jnp.float32,
    which: str = "lm",
    tol: float = 1e-6,
    max_restarts: int = 100,
    basis_sharding=None,
    progress: bool = False,
):
    """Converged k extremal eigenpairs of the DATASET-MEAN curvature
    operator via thick restart on the fused-iteration fast path.

    The reference's eigenbases are dataset-level (one long pass over the
    loader-averaged Hessian, /root/reference/gpt2_savehessian.py:130-163);
    this is the converged-TRLan equivalent with the host-loop compile
    budget (ONE cached program per inner iteration, params/batches as
    explicit jit args) and the fused-dispatch economics of
    ``dataset_spectrum_host(fused=True)``.  Normalization semantics are
    ``dataset_norm``'s ("dataset"/"mean"/"sum"), identical to
    ``DatasetHessianOperator``.
    """
    fl = flattener or Flattener(params)
    per_batch_norm, scale = dataset_norm(
        normalization, len(batch_list), batch_size
    )
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *batch_list)
    scale_dev = jnp.float32(scale)

    def factory(pad):
        step = _jitted_fused_trlan_step(
            loss_fn, per_batch_norm, precision, fl, pad
        )

        def bound(Q, j, subkey):
            return step(Q, j, subkey, scale_dev, params, stacked)

        return bound

    from hessian_llm_vision_tpu.krylov.thick_restart import (
        lanczos_thick_restart,
    )

    return lanczos_thick_restart(
        None, fl.size, k,
        key=key, v0=v0, inner=inner, max_restarts=max_restarts, tol=tol,
        which=which, store_dtype=store_dtype, basis_sharding=basis_sharding,
        progress=progress, fused_step_factory=factory,
    )
