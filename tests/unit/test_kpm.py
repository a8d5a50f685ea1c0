"""KPM Chebyshev spectral density vs dense ground truth.

KPM is the beyond-reference density estimator (krylov/kpm.py); these
tests pin its contracts against exact eigendecompositions: moment
normalization, trace identity, density mass placement, agreement with the
SLQ density on the same operator, and the range-estimation guard.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hessian_llm_vision_tpu.krylov import (
    estimate_spectral_range,
    kpm_density,
    lanczos,
    ritz_decomposition,
)
from hessian_llm_vision_tpu.krylov.slq import spectral_density


def _dense(dim=48, seed=0, spike=None):
    rng = np.random.RandomState(seed)
    a = rng.randn(dim, dim).astype(np.float32)
    m = (a + a.T) / 2
    if spike is not None:
        u = rng.randn(dim).astype(np.float32)
        u /= np.linalg.norm(u)
        m = m + spike * np.outer(u, u)
    mat = jnp.asarray(m)
    return jax.jit(lambda v: mat @ v), np.linalg.eigvalsh(m)


def test_kpm_moments_and_trace():
    dim = 48
    matvec, ev = _dense(dim)
    res = kpm_density(
        matvec, dim, 64, jax.random.PRNGKey(0), num_probes=8,
        lmin=float(ev[0]) * 1.05, lmax=float(ev[-1]) * 1.05,
    )
    # mu_0 = ||v||^2 = 1 exactly for unit probes
    np.testing.assert_allclose(res.raw_moments[0], 1.0, rtol=1e-6)
    # E[lambda] = tr(A)/dim from the first two moments (Hutchinson over
    # 8 Rademacher probes: loose stochastic tolerance)
    true_mean = float(np.mean(ev))
    est = res.trace_estimate()
    assert abs(est - true_mean) < 0.35 * float(np.abs(ev).max())
    # dim-scaled form matches the slq.trace_estimate contract: tr(A)
    np.testing.assert_allclose(res.trace_estimate(dim), est * dim, rtol=1e-12)
    # density integrates to ~1 on a fine grid spanning the support
    grid = np.linspace(ev[0] * 1.04, ev[-1] * 1.04, 2000)
    rho = res.density(grid)
    mass = np.trapezoid(rho, grid)
    np.testing.assert_allclose(mass, 1.0, atol=0.02)
    assert rho.min() > -0.02  # Jackson damping keeps it (near-)nonneg


def test_kpm_places_mass_at_a_spike():
    """An isolated outlier eigenvalue must show as a density peak near it
    (the lambda_max-outlier structure of real loss Hessians)."""
    dim, spike = 40, 25.0
    matvec, ev = _dense(dim, seed=3, spike=spike)
    res = kpm_density(
        matvec, dim, 96, jax.random.PRNGKey(1), num_probes=8,
        lmin=float(ev[0]) * 1.05, lmax=float(ev[-1]) * 1.05,
    )
    grid = np.linspace(ev[0] * 1.04, ev[-1] * 1.04, 4000)
    rho = res.density(grid)
    peak = grid[np.argmax(rho * (grid > ev[-2] + 1.0))]
    assert abs(peak - ev[-1]) < 1.5  # resolved near the spike


def test_kpm_cdf_matches_exact_and_beats_single_probe_slq():
    dim = 48
    matvec, ev = _dense(dim, seed=5)
    res = kpm_density(
        matvec, dim, 80, jax.random.PRNGKey(2), num_probes=8,
        lmin=float(ev[0]) * 1.05, lmax=float(ev[-1]) * 1.05,
    )
    lres = lanczos(matvec, dim, 32, key=jax.random.PRNGKey(3), reorth=True)
    spec = ritz_decomposition(lres)
    grid = np.linspace(ev[0] * 1.04, ev[-1] * 1.04, 1000)
    dg = grid[1] - grid[0]
    cdf_kpm = np.cumsum(res.density(grid)) * dg
    cdf_slq = np.cumsum(
        np.asarray(spectral_density(spec, jnp.asarray(grid), sigma=0.4))
    ) * dg
    cdf_exact = np.searchsorted(np.sort(ev), grid, side="right") / dim
    # KPM (80 moments, 8 probes) resolves the exact CDF well...
    err_kpm = np.abs(cdf_kpm - cdf_exact).max()
    assert err_kpm < 0.08, err_kpm
    # ...and beats the single-probe SLQ smoothing on the same operator
    # (measured here: 0.057 vs 0.123 sup-norm CDF error)
    assert err_kpm < np.abs(cdf_slq - cdf_exact).max()


def test_range_estimation_and_validation():
    dim = 48
    matvec, ev = _dense(dim, seed=7)
    lo, hi = estimate_spectral_range(matvec, dim, jax.random.PRNGKey(0))
    # bounds bracket the bulk (short Lanczos nails the extremes here)
    assert lo < ev[0] + 1.0 and hi > ev[-1] - 1.0
    # auto-range path runs end to end
    res = kpm_density(matvec, dim, 32, jax.random.PRNGKey(4), num_probes=2)
    assert np.isfinite(res.moments).all()
    with pytest.raises(ValueError, match="num_moments"):
        kpm_density(matvec, dim, 1, jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="both lmin"):
        kpm_density(matvec, dim, 8, jax.random.PRNGKey(0), lmin=-1.0)
