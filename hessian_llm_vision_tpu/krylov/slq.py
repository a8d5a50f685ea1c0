"""Stochastic Lanczos quadrature / spectrum post-processing.

Reference: Ritz extraction ``eigvals, eigvects = eigh(T); gammas =
eigvects[0,:]**2; V = eigvectsᵀ Qᵀ`` (/root/reference/gpt2_savehessian.py:210-214,
lanczostrain_hand.py:208-210), trace estimate ``dot(eigvals, gammas)``
(eigeninfo/GPT2 spectrum.ipynb cell 4), and the stem-plot spectral density
notebooks.  For a unit start vector v, ``Σᵢ γᵢ f(λᵢ)`` is the Gauss quadrature
estimate of ``vᵀ f(H) v ≈ tr(f(H))/P``; multi-probe averaging (the reference's
``d.sh`` seed grid run as separate processes) is an in-process ``vmap`` here.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from hessian_llm_vision_tpu.krylov.lanczos import LanczosResult, lanczos


class Spectrum(NamedTuple):
    """Ritz values, SLQ weights, and (optionally) Ritz vectors.

    Matches the reference's spectrum artifact dict
    ``{'eigvals','gammas'[,'V']}`` (/root/reference/gpt2_savehessian.py:216-235).
    """

    eigvals: jax.Array  # (m,)
    gammas: jax.Array  # (m,) = first-row components squared
    ritz_vectors: Optional[jax.Array] = None  # (m, P), rows are Ritz vectors


def ritz_decomposition(result: LanczosResult, with_vectors: bool = False) -> Spectrum:
    """eigh on the tridiagonal T; optionally rotate the Krylov basis into
    Ritz vectors ``V = Sᵀ Q`` (rows)."""
    T = result.tridiag()
    eigvals, eigvects = jnp.linalg.eigh(T)
    gammas = eigvects[0, :] ** 2
    vecs = None
    if with_vectors:
        if result.basis is None:
            raise ValueError("Lanczos ran in T-only mode; no basis stored")
        vecs = eigvects.T @ result.basis
    return Spectrum(eigvals=eigvals, gammas=gammas, ritz_vectors=vecs)


def ritz_vectors(result: LanczosResult) -> jax.Array:
    return ritz_decomposition(result, with_vectors=True).ritz_vectors


def quadrature(spectrum: Spectrum, f: Callable[[jax.Array], jax.Array]) -> jax.Array:
    """SLQ estimate of ``vᵀ f(H) v = tr(f(H))/P`` (unit probe)."""
    return jnp.dot(spectrum.gammas, f(spectrum.eigvals))


def trace_estimate(spectrum: Spectrum, dim: Optional[int] = None) -> jax.Array:
    """``Σ γᵢ λᵢ``; the reference's headline sanity number (≈0 for LM
    Hessians — BASELINE.md).  With ``dim`` given, scales to a tr(H) estimate."""
    est = jnp.dot(spectrum.eigvals, spectrum.gammas)
    return est * dim if dim is not None else est


def spectral_density(
    spectrum: Spectrum,
    grid: jax.Array,
    sigma: float = 0.1,
) -> jax.Array:
    """Gaussian-broadened SLQ spectral density on ``grid``.

    The smooth version of the reference's stem plots
    (First Principles Lanczos.ipynb cell 2, GPT2 spectrum.ipynb cell 3).
    """
    diffs = grid[:, None] - spectrum.eigvals[None, :]
    kernels = jnp.exp(-0.5 * (diffs / sigma) ** 2) / (
        sigma * jnp.sqrt(2 * jnp.pi)
    )
    return kernels @ spectrum.gammas


def slq_multi_probe(
    matvec,
    dim: int,
    num_iters: int,
    key: jax.Array,
    num_probes: int,
    *,
    reorth: bool = True,
) -> Spectrum:
    """Average SLQ over ``num_probes`` random unit probes via ``vmap``.

    Replaces the reference's seed-grid of independent processes
    (/root/reference/d.sh:4-12, data_seed×vector_seed 997-999) with one
    batched on-device computation; returned eigvals/gammas are concatenated
    across probes with gammas scaled by 1/num_probes, so ``quadrature`` /
    ``spectral_density`` work unchanged.
    """
    keys = jax.random.split(key, num_probes)

    def one(k):
        res = lanczos(
            matvec, dim, num_iters, key=k, reorth=reorth, store_basis=reorth
        )
        spec = ritz_decomposition(res)
        return spec.eigvals, spec.gammas

    eigvals, gammas = jax.vmap(one)(keys)
    return Spectrum(
        eigvals=eigvals.reshape(-1),
        gammas=gammas.reshape(-1) / num_probes,
        ritz_vectors=None,
    )
