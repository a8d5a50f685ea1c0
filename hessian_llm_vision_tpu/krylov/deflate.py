"""Deflated spectral density: exact extremal eigenpairs + stochastic bulk.

Beyond-reference capability.  The reference's density picture is a Lanczos
stem plot (/root/reference/gpt2_savehessian.py:210-214): ``num_iters``
quadrature nodes, with most of the Krylov effort spent re-resolving the
handful of extremal outliers every loss-Hessian has.  Deflation splits the
job along that structure:

1. ``lanczos_thick_restart`` computes the ``k`` largest-|λ| eigenpairs to a
   residual tolerance — EXACT spikes with certificates (krylov/thick_restart.py);
2. KPM then runs on the deflated operator ``(I−UUᵀ) A (I−UUᵀ)`` whose
   spectral support is the BULK only — the Chebyshev rescaling maps the
   bulk to [-1, 1] instead of squeezing it into a thin band around 0, so
   bulk resolution improves by ~(full range / bulk range) at the same
   moment count (Lin, Saad & Yang, "Approximating Spectral Densities of
   Large Matrices", SIAM Rev. 2016, §4.2 — the standard two-scale fix).

TPU shape: the deflation projector is the rank-k apply of ``ops.spectral``
(bandwidth-bound, XLA-fused, bf16-streaming for a bf16 basis) wrapped in
ONE cached jitted program with the basis as an explicit jit argument —
each deflated matvec is 3 cached-program dispatches (project, A, project),
which is the host-loop dispatch discipline of ``krylov/driver.py``.
Everything composes at LLM scale: the thick-restart basis buffer is
(inner+1, P) (optionally bf16 / mesh-sharded) and KPM itself is 2
P-vectors.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from hessian_llm_vision_tpu.krylov.kpm import KPMDensity, kpm_density
from hessian_llm_vision_tpu.krylov.thick_restart import lanczos_thick_restart
from hessian_llm_vision_tpu.utils.programs import mark_program_backed


@jax.jit
def _project_prog(v, basis):
    """v − Uᵀ(U v) as ONE cached program (basis is an explicit jit arg —
    never a traced-through closure constant; CLAUDE.md program rule)."""
    from hessian_llm_vision_tpu.ops.spectral import project_out

    return project_out(v, basis)


def deflated_matvec(
    matvec: Callable[[jax.Array], jax.Array], basis: jax.Array
) -> Callable[[jax.Array], jax.Array]:
    """Matvec of ``(I−UUᵀ) A (I−UUᵀ)`` over a program-backed ``matvec``.

    ``basis`` rows are orthonormal (Ritz vectors are); a bf16 basis streams
    at half the HBM traffic (ops.spectral.rank_k_apply dispatch).  The
    deflated operator keeps A's spectrum on span(U)^⊥ and moves the k
    deflated eigenvalues to 0.
    """

    def mv(v):
        return _project_prog(matvec(_project_prog(v, basis)), basis)

    return mark_program_backed(mv)


class DeflatedDensity(NamedTuple):
    """Exact spikes + KPM bulk of the deflated operator.

    The combined density is ``ρ(λ) = (1/P) Σᵢ δ(λ−λᵢ) + ρ_bulk(λ)`` minus
    a k/P-mass artifact at 0 (the deflated directions land there) —
    negligible at LLM scale (k/P ≈ 4e-8 at 124M) and documented rather
    than hidden.
    """

    eigvals: np.ndarray  # (k,) exact deflated eigenvalues (ascending)
    residuals: np.ndarray  # (k,) thick-restart residual certificates
    converged: bool
    bulk: KPMDensity  # KPM density of the deflated operator
    dim: int
    matvecs: int  # total A applications (thick restart + KPM)

    def density(self, grid: np.ndarray) -> np.ndarray:
        """Bulk density on ``grid`` (exact spikes reported separately via
        ``eigvals`` — delta functions don't belong on a sample grid)."""
        return self.bulk.density(grid)

    def trace_estimate(self, dim: Optional[int] = None) -> float:
        """Combined ``E[λ] = tr(A)/P``: exact spike contribution plus the
        bulk estimate (the k zeros of the deflated operator add 0).  With
        ``dim`` given, scales to tr(A) — the slq.trace_estimate contract."""
        est = float(np.sum(self.eigvals)) / self.dim + self.bulk.trace_estimate()
        return est * dim if dim is not None else est


def deflated_density(
    matvec: Callable[[jax.Array], jax.Array],
    dim: int,
    num_deflate: int,
    num_moments: int,
    key: jax.Array,
    *,
    num_probes: int = 1,
    inner: Optional[int] = None,
    tol: float = 1e-6,
    store_dtype=jnp.float32,
    deflate_dtype=None,
    lmin: Optional[float] = None,
    lmax: Optional[float] = None,
    basis_sharding=None,
    progress: bool = False,
) -> DeflatedDensity:
    """Two-scale spectral density: thick-restart the ``num_deflate``
    largest-|λ| pairs exactly, then KPM with ``num_moments`` moments on the
    deflated operator.

    ``matvec`` must be program-backed (utils/programs.py discipline).
    ``lmin``/``lmax`` bound the DEFLATED (bulk) spectrum; estimated with a
    short Lanczos pass on the deflated operator when omitted — that
    estimate is the whole point: the bulk support is what KPM rescales to
    [-1, 1].  ``inner``/``tol``/``store_dtype`` pass through to
    ``lanczos_thick_restart``.  ``deflate_dtype``: optional storage dtype
    for the deflation basis itself (bf16 halves both its HBM footprint —
    the k f32 Ritz rows are 2.5 GB at 124M/k=5 — and the projector's
    bandwidth; the resulting ~1e-3 projector leakage puts at most
    ~1e-3·|λ_deflated| of residual outlier weight back into the bulk,
    far inside KPM's Jackson broadening).  ``basis_sharding``: optional
    ``NamedSharding`` for the thick-restart buffer AND the deflation basis
    (the ``parallel.mesh.basis_sharding`` P-sharding convention) — the
    projector program then runs on the k P-sharded Ritz rows in place, so
    the deflated estimator scales past one chip's HBM like
    ``lanczos_thick_restart`` itself does.
    """
    key_tr, key_kpm = jax.random.split(key)
    res = lanczos_thick_restart(
        matvec,
        dim,
        num_deflate,
        key=key_tr,
        inner=inner,
        tol=tol,
        which="lm",
        store_dtype=store_dtype,
        basis_sharding=basis_sharding,
        progress=progress,
    )
    eigvals, residuals = res.eigvals, res.residuals
    converged, n_tr = res.converged, res.matvecs
    vecs = res.vectors
    del res  # at LLM scale: don't hold a second basis reference below
    if deflate_dtype is not None and vecs.dtype != deflate_dtype:
        vecs = jax.block_until_ready(vecs.astype(deflate_dtype))
    dmv = deflated_matvec(matvec, vecs)
    bulk = kpm_density(
        dmv,
        dim,
        num_moments,
        key_kpm,
        num_probes=num_probes,
        lmin=lmin,
        lmax=lmax,
        progress=progress,
    )
    # KPM matvec count: range estimation (12, when bounds were omitted)
    # + the recurrence (num_moments - 1 per probe)
    kpm_mv = num_probes * (num_moments - 1) + (12 if lmin is None else 0)
    return DeflatedDensity(
        eigvals=eigvals,
        residuals=residuals,
        converged=converged,
        bulk=bulk,
        dim=dim,
        matvecs=n_tr + kpm_mv,
    )
