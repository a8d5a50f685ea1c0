"""Thick-restart Lanczos (TRLan): converged top-k eigenpairs in O(m·P).

The reference computes eigenbases with ONE unrestarted Lanczos pass and
uses them downstream (forgetting projections, load_model.py:232-401;
spectrum artifacts with V, gpt2_savehessian.py:210-235) — so basis memory
is m×P for m iterations and the extremal pairs are only as converged as
one pass makes them.  Thick restart (Wu & Simon, "Thick-Restart Lanczos
Method for Large Symmetric Eigenvalue Problems", SIAM J. Matrix Anal.
2000) iterates: run Lanczos to m vectors, keep the best kk Ritz vectors,
restart with them plus the last Lanczos vector, repeat until the wanted k
pairs hit a residual tolerance.  Memory stays (m+1)×P regardless of how
many restarts convergence takes — the TPU memory plan for *converged*
eigenbases at model sizes where a long unrestarted basis cannot be held
(optionally bf16-stored, the --bigmodel_q convention).

Design: host-driven restart cycles over the caller's (jitted) matvec —
the LLM-scale pattern of krylov/driver.py (one cached program per step,
no scan over big HVPs; CLAUDE.md compile-budget rule).  The (m, m)
projected problem is dense-solved on host with numpy.  The projected
matrix after a restart is NOT tridiagonal: it is diag(θ) plus an
arrowhead coupling row/column, then tridiagonal in the new directions.

Recurrence arithmetic is f32 (repo convention); the stored basis may be
bf16 (``store_dtype``) — the Lanczos-vector storage trade validated at
410m in round 3 (~1e-5 extreme-Ritz error).
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

_EPS = 1e-30


class ThickRestartResult(NamedTuple):
    """Converged-first wanted eigenpairs of the operator."""

    eigvals: np.ndarray  # (k,) wanted Ritz values, sorted ascending
    vectors: jax.Array  # (k, P) rows are the Ritz vectors (f32)
    residuals: np.ndarray  # (k,) |beta_m * S[m-1, i]| residual estimates
    restarts: int
    converged: bool
    matvecs: int


def _orth_body(Q, w, n_filled):
    """CGS2-orthogonalize f32 ``w`` against the first ``n_filled`` rows of
    the (m+1, P) buffer ``Q`` (any storage dtype).  Pure function — jitted
    standalone as :func:`_orth_step` and inlined into the fused
    thick-restart step (``krylov.driver._jitted_fused_trlan_step``).

    Returns ``(w, norm_after, norm_before)`` — the before/after ratio is
    the numerically meaningful breakdown detector (an absolute threshold
    never fires in f32, where roundoff keeps ||w|| at ~1e-7·||A q||, and
    normalizing that noise poisons the basis).

    bf16 buffers matmul in their storage dtype with f32 accumulation
    (``preferred_element_type``) — no (m+1, P) f32 transient, so the bf16
    memory plan actually halves peak; the ~1e-3 coefficient error this
    costs is the bf16-basis floor anyway."""
    nrm0 = jnp.linalg.norm(w)
    mask = (jnp.arange(Q.shape[0]) < n_filled).astype(jnp.float32)
    if Q.dtype == jnp.float32:
        for _ in range(2):  # two Gram-Schmidt passes
            w = w - Q.T @ (mask * (Q @ w))
        return w, jnp.linalg.norm(w), nrm0
    for _ in range(2):
        c = jnp.matmul(
            Q, w.astype(Q.dtype), preferred_element_type=jnp.float32
        )
        w = w - jnp.matmul(
            Q.T, (mask * c).astype(Q.dtype),
            preferred_element_type=jnp.float32,
        )
    return w, jnp.linalg.norm(w), nrm0


_orth_step = jax.jit(_orth_body)


@partial(jax.jit, donate_argnums=0)
def _set_row(Q, i, v):
    # Donate Q: without it every row write transiently holds TWO (m+1, P)
    # buffers (8 GB at the 124M/bf16/m=15 config) — measured as the OOM
    # that killed the first on-chip thick-restart run.
    return jax.lax.dynamic_update_slice(Q, v.astype(Q.dtype)[None, :], (i, 0))


@jax.jit
def _rotate(Q, S_kept):
    """W = S_keptᵀ Q  (rows = new Ritz vectors), f32 result; bf16 buffers
    stay bf16 in the dot (f32 accumulation), avoiding an f32 copy of Q."""
    if Q.dtype == jnp.float32:
        return S_kept.T @ Q
    return jnp.matmul(
        S_kept.T.astype(Q.dtype), Q, preferred_element_type=jnp.float32
    )


@partial(jax.jit, donate_argnums=(0,))
def _restart_rotate(Q, S_pad):
    """Whole thick restart of the basis buffer in ONE donating program:
    rows 0..kk-1 ← (S_padᵀ Q) in the storage dtype, row kk ← the old row
    m (the (m+1)-th Lanczos vector), rest zero.

    Fused-path companion of the `_rotate_one` row loop below: the row
    loop costs kk+1 tunnel dispatches per restart (~9% of the 124M
    fused-run wall); here the rotation emits the storage dtype straight
    from the MXU (contraction over m+1 ≤ ~64 terms — bf16 output loses
    nothing real, the host-trainer `rotate` convention), so the peak is
    the donated Q + one (kk, P) store-dtype block."""
    kk = S_pad.shape[1]
    if Q.dtype == jnp.float32:
        W = S_pad.T @ Q
    else:
        W = jnp.matmul(
            S_pad.T.astype(Q.dtype), Q, preferred_element_type=Q.dtype
        )
    q_last = Q[Q.shape[0] - 1]
    out = jnp.zeros_like(Q)
    out = jax.lax.dynamic_update_slice(out, W.astype(Q.dtype), (0, 0))
    return jax.lax.dynamic_update_slice(out, q_last[None], (kk, 0))


@partial(jax.jit, static_argnames="out_dtype")
def _rotate_one(Q, coeffs, out_dtype):
    """One rotated basis row ``coeffsᵀ Q`` in the storage dtype.

    Restart-time variant of :func:`_rotate`: rotating row-by-row and
    casting straight to ``out_dtype`` never materializes the (kk, P) f32
    block — at 124M/kk=8 that block is ~4 GB and (as a Python local) it
    previously stayed referenced through the whole next inner loop."""
    if Q.dtype == jnp.float32:
        r = coeffs @ Q
    else:
        r = jnp.matmul(
            coeffs.astype(Q.dtype), Q, preferred_element_type=jnp.float32
        )
    return r.astype(out_dtype)


def _select(theta: np.ndarray, k: int, which: str) -> np.ndarray:
    """Indices of the k wanted Ritz values (into ascending-sorted theta)."""
    order = np.argsort(theta)
    if which == "la":
        return order[-k:]
    if which == "sa":
        return order[:k]
    if which == "both":
        lo = k // 2
        return np.concatenate([order[: k - lo], order[-lo:]]) if lo else order[:k]
    if which == "lm":
        return np.argsort(np.abs(theta))[-k:]
    raise ValueError(f"which={which!r}: use la | sa | lm | both")


def lanczos_thick_restart(
    matvec: Optional[Callable[[jax.Array], jax.Array]],
    dim: int,
    k: int,
    *,
    key: Optional[jax.Array] = None,
    v0: Optional[jax.Array] = None,
    inner: Optional[int] = None,
    max_restarts: int = 100,
    tol: float = 1e-6,
    which: str = "lm",
    store_dtype=jnp.float32,
    basis_sharding=None,
    progress: bool = False,
    fused_step_factory: Optional[Callable[[int], Callable]] = None,
) -> ThickRestartResult:
    """Converged k extremal eigenpairs with an (inner+1, P) basis buffer.

    ``which``: "lm" largest |λ| (default), "la"/"sa" algebraic ends,
    "both" = split k across both algebraic ends.  Residual convergence
    test: |β_m S[m-1,i]| ≤ tol · max|θ| for every wanted pair.

    ``basis_sharding``: optional ``NamedSharding`` for the (inner+1, P)
    buffer, P-axis sharded over the mesh (the ``krylov.lanczos`` /
    ``parallel.mesh.basis_sharding`` convention, SURVEY.md §7 hard part
    #1) — the buffer is created directly sharded (never replicated), the
    CGS2 contractions run as local partials + psum over ICI, and the
    returned Ritz vectors stay P-sharded.  P is zero-padded to the shard
    divisor; the pad provably stays zero through the recurrence.

    ``fused_step_factory``: the LLM-scale fast path.  Called once with the
    computed P-pad, must return ``step(Q, j, key) -> (Q, alpha, beta)`` —
    ONE donating program running matvec + α + CGS2 + breakdown redirect +
    the row-(j+1) write (``krylov.driver._jitted_fused_trlan_step``).  The
    host loop then dispatches one program per inner iteration and fetches
    the (α, β) scalars ONCE per restart cycle, instead of the unfused
    path's ~4 programs + 3 blocking host round-trips per iteration — on
    the high-latency TPU tunnel that round-trip tax made the r3 unfused
    run 22× the fused bench loop's per-HVP cost (artifacts/trlan124m_r3,
    VERDICT r3 #4).  ``matvec`` may be None in this mode.
    """
    if (v0 is None) == (key is None):
        raise ValueError("pass exactly one of v0 / key")
    if matvec is None and fused_step_factory is None:
        raise ValueError("pass matvec or fused_step_factory")
    # Host-driven loop: the matvec must already be backed by ONE cached
    # compiled program (every curvature/ operator matvec is — explicit
    # params/batch jit args).  Do NOT re-wrap it in jax.jit here: tracing
    # through the operator closure lowers the captured 124M-param pytree
    # as inline HLO constants, which this backend's remote compiler cannot
    # digest (observed: a 124M thick-restart CLI run hung >25 min in
    # compile; with the pre-jitted operator program it starts iterating
    # after the normal one-HVP compile).
    m = inner if inner is not None else min(dim, max(2 * k + 2, k + 12))
    if not (k + 4 <= m <= dim):
        # m - kk new Krylov directions are built per restart; with fewer
        # than ~3 the method stalls, burning max_restarts on garbage
        # (measured: k=5 inner=6 never converges, inner=10 hits 2e-8)
        raise ValueError(
            f"need inner >= k+4 and inner <= dim, got k={k} inner={m} "
            f"dim={dim}"
        )
    kk = min(k + max(3, k // 2), m - 3)  # thick-keep count (>= k+1)

    q = v0 if v0 is not None else jax.random.normal(key, (dim,), jnp.float32)
    q = q / jnp.maximum(jnp.linalg.norm(q), _EPS)

    # --- optional P-axis mesh sharding of the basis buffer --------------
    true_dim, pad = dim, 0
    if basis_sharding is not None:
        from hessian_llm_vision_tpu.krylov.lanczos import _sharding_divisor

        div = _sharding_divisor(basis_sharding)
        if div > 1 and dim % div:
            pad = div - dim % div
    if pad:
        if matvec is not None:
            inner_matvec = matvec

            def matvec(v):  # noqa: F811
                return jnp.pad(inner_matvec(v[:true_dim]), (0, pad))

        q = jnp.pad(q, (0, pad))
        dim = dim + pad
    fused_step = (
        fused_step_factory(pad) if fused_step_factory is not None else None
    )

    def _new_buffer():
        """(m+1, dim) zeros, created DIRECTLY sharded (a replicated-then-
        reshard would transiently hold the full buffer on one device —
        20 GB at 124M/f32/m=40, the exact wall this option removes)."""
        if basis_sharding is None:
            return jnp.zeros((m + 1, dim), store_dtype)
        return jax.jit(
            lambda: jnp.zeros((m + 1, dim), store_dtype),
            out_shardings=basis_sharding,
        )()

    Q = _new_buffer()
    theta = np.zeros((0,), np.float64)  # retained Ritz values
    s = np.zeros((0,), np.float64)  # arrowhead couplings
    n_ret = 0  # retained rows at cycle start
    rng_key = key if key is not None else jax.random.PRNGKey(0)
    n_mv = 0

    for restart in range(max_restarts):
        if q is not None:  # None: the fused restart already wrote row kk
            Q = _set_row(Q, n_ret, q)
        B = np.zeros((m, m), np.float64)
        B[:n_ret, :n_ret] = np.diag(theta)
        B[:n_ret, n_ret] = s
        B[n_ret, :n_ret] = s
        beta = 0.0
        if fused_step is not None:
            # one donating program per iteration, scalars fetched ONCE per
            # cycle (the breakdown redirect runs in-program, flagged by
            # beta == 0 exactly as the unfused branch records it)
            rng_key, *subs = jax.random.split(rng_key, m - n_ret + 1)
            dev_ab = []
            for j in range(n_ret, m):
                Q, a_dev, b_dev = fused_step(Q, j, subs[j - n_ret])
                n_mv += 1
                dev_ab.append(jnp.stack([a_dev, b_dev]))
            ab = np.asarray(jnp.stack(dev_ab), np.float64)
            for j in range(n_ret, m):
                B[j, j] = ab[j - n_ret, 0]
                if j < m - 1:
                    B[j, j + 1] = B[j + 1, j] = ab[j - n_ret, 1]
            beta = float(ab[-1, 1])
        else:
            for j in range(n_ret, m):
                w = matvec(jnp.asarray(Q[j], jnp.float32))
                n_mv += 1
                alpha = float(jnp.vdot(jnp.asarray(Q[j], jnp.float32), w))
                B[j, j] = alpha
                w, nrm, nrm0 = _orth_step(Q, w, j + 1)
                beta = float(nrm)
                if beta <= 1e-5 * max(float(nrm0), 1e-30):
                    # invariant subspace (what remains of A q is f32
                    # roundoff): zero the coupling and continue in a fresh
                    # random direction
                    beta = 0.0
                    rng_key, sub = jax.random.split(rng_key)
                    w = jax.random.normal(sub, (dim,), jnp.float32)
                    if pad:
                        # the fresh direction must live in the true
                        # subspace — a nonzero pad component would poison
                        # every later orthogonalization coefficient
                        w = w.at[true_dim:].set(0.0)
                    w, nrm, _ = _orth_step(Q, w, j + 1)
                if j < m - 1:
                    B[j, j + 1] = B[j + 1, j] = beta
                Q = _set_row(Q, j + 1, w / jnp.maximum(nrm, _EPS))

        evals, S = np.linalg.eigh(B)  # ascending
        resid = np.abs(beta * S[m - 1, :])
        wanted = _select(evals, k, which)
        scale = max(np.abs(evals).max(), 1e-30)
        done = bool((resid[wanted] <= tol * scale).all())
        if progress:
            print(
                f"[trlan] restart {restart}: wanted "
                f"[{evals[wanted].min():.6g}, {evals[wanted].max():.6g}] "
                f"max resid {resid[wanted].max():.2e}",
                flush=True,
            )
        if done or restart == max_restarts - 1:
            order = wanted[np.argsort(evals[wanted])]
            S_out = np.zeros((m + 1, len(order)), np.float64)
            S_out[:m] = S[:, order]  # zero-padded: full-Q rotate, no slice copy
            V = _rotate(Q, jnp.asarray(S_out, jnp.float32))
            if pad:
                V = V[:, :true_dim]
            return ThickRestartResult(
                eigvals=evals[order],
                vectors=V,
                residuals=resid[order],
                restarts=restart + 1,
                converged=done,
                matvecs=n_mv,
            )

        # thick restart: keep the kk best Ritz pairs by the same criterion
        keep = _select(evals, kk, which)
        # coefficients padded with a zero for row m: passing the FULL
        # (m+1, P) buffer avoids eagerly materializing a Q[:m] slice copy
        # (~4 GB at 124M) per rotated row
        S_pad = np.zeros((m + 1, kk), np.float64)
        S_pad[:m] = S[:, keep]
        S_keep = jnp.asarray(S_pad, jnp.float32)
        if fused_step is not None:
            # one donating program: rotated rows + the (m+1)-th Lanczos
            # vector written at row kk (vs kk+1 dispatches below)
            Q = _restart_rotate(Q, S_keep)
            q = None
        else:
            q = jnp.asarray(Q[m], jnp.float32)  # the (m+1)-th Lanczos vector
            # rotate row-by-row straight into the storage dtype (see
            # _rotate_one): peak here is old Q + kk store-dtype rows, not
            # old Q + a (kk, P) f32 block that outlives the restart
            new_rows = [
                _rotate_one(Q, S_keep[:, i], store_dtype) for i in range(kk)
            ]
            Q = _new_buffer()
            for i, row in enumerate(new_rows):
                Q = _set_row(Q, i, row)
            del new_rows
        theta = evals[keep]
        s = beta * S[m - 1, keep]
        n_ret = kk
