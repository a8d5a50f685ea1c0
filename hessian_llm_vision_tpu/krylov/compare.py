"""Spectrum comparison utilities.

The judge metric for this rebuild is "Ritz values within 1e-3 relative
error of the reference" (BASELINE.json); the reference compares spectra by
eye in notebooks (eigeninfo/GPT2 spectrum.ipynb).  These helpers make the
comparison a number.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from hessian_llm_vision_tpu.krylov.slq import Spectrum


def ritz_relative_error(
    a: Spectrum, b: Spectrum, top_k: Optional[int] = None
) -> float:
    """Max relative error between sorted Ritz values (optionally only the
    top_k by magnitude — the well-converged extremal ones)."""
    ea = np.sort(np.asarray(a.eigvals))
    eb = np.sort(np.asarray(b.eigvals))
    n = min(len(ea), len(eb))
    ea, eb = ea[-n:], eb[-n:]
    if top_k is not None:
        order = np.argsort(np.abs(eb))[-top_k:]
        ea, eb = ea[order], eb[order]
    denom = np.maximum(np.abs(eb), 1e-12)
    return float(np.max(np.abs(ea - eb) / denom))


def density_overlap(
    a: Spectrum, b: Spectrum, num_points: int = 512, sigma: Optional[float] = None
) -> float:
    """Bhattacharyya-style overlap of the two broadened densities in [0, 1]."""
    from hessian_llm_vision_tpu.krylov.slq import spectral_density
    import jax.numpy as jnp

    lo = min(float(np.min(a.eigvals)), float(np.min(b.eigvals)))
    hi = max(float(np.max(a.eigvals)), float(np.max(b.eigvals)))
    pad = 0.05 * (hi - lo + 1e-9)
    grid = jnp.linspace(lo - pad, hi + pad, num_points)
    if sigma is None:
        sigma = (hi - lo + 1e-9) / 100
    da = np.array(spectral_density(a, grid, sigma))
    db = np.array(spectral_density(b, grid, sigma))
    da = da / np.trapezoid(da, grid)
    db = db / np.trapezoid(db, grid)
    return float(np.trapezoid(np.sqrt(da * db), grid))


def wasserstein_distance(a: Spectrum, b: Spectrum) -> float:
    """Exact W1 (earth-mover) distance between the two discrete SLQ
    measures Σ γᵢ δ(λᵢ), in eigenvalue units.

    Complements :func:`density_overlap` (scale-free, broadening-dependent)
    with an interpretable number: "the spectra differ by X in λ on
    average".  Each γ vector is normalised to a probability measure (for a
    unit Lanczos probe Σγ = 1 already, up to fp error).  W1 between 1-D
    measures is ∫|F_a(x) − F_b(x)| dx over the merged atom grid.
    """
    ea, ga = np.asarray(a.eigvals, np.float64), np.asarray(a.gammas, np.float64)
    eb, gb = np.asarray(b.eigvals, np.float64), np.asarray(b.gammas, np.float64)
    ga, gb = ga / ga.sum(), gb / gb.sum()
    xs = np.concatenate([ea, eb])
    order = np.argsort(xs)
    xs = xs[order]
    # signed mass at each atom: +γ from a, −γ from b
    w = np.concatenate([ga, -gb])[order]
    cdf_diff = np.cumsum(w)[:-1]  # F_a − F_b between consecutive atoms
    return float(np.sum(np.abs(cdf_diff) * np.diff(xs)))


def summarize(spec: Spectrum) -> dict:
    ev = np.sort(np.asarray(spec.eigvals))
    ga = np.asarray(spec.gammas)
    return {
        "num_ritz": len(ev),
        "lambda_max": float(ev[-1]),
        "lambda_min": float(ev[0]),
        "top5": ev[-5:].tolist(),
        "trace_estimate": float(np.dot(np.asarray(spec.eigvals), ga)),
        "weight_sum": float(ga.sum()),
    }


def subspace_overlap(va: np.ndarray, vb: np.ndarray) -> float:
    """Mean squared cosine of the principal angles between the row-spaces
    of two (k, P) Ritz bases, in [0, 1].

    1.0 = identical subspaces, ~k/P for independent random ones.  This is
    the quantitative form of the reference's by-eye eigenvector comparisons
    (ipynbs/visual-eigen.ipynb) and the working quantity of the forgetting
    experiment (load_model.py:325-364): projection suppresses task-A motion
    exactly to the extent task B's gradient subspace overlaps task A's
    saved eigenbasis.
    """
    va = np.asarray(va, np.float64)
    vb = np.asarray(vb, np.float64)
    qa, _ = np.linalg.qr(va.T)  # (P, ka) orthonormal columns
    qb, _ = np.linalg.qr(vb.T)
    s = np.linalg.svd(qa.T @ qb, compute_uv=False)  # cos(principal angles)
    return float(np.sum(s**2) / min(qa.shape[1], qb.shape[1]))
