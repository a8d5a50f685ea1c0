"""Deflated spectral density (krylov/deflate.py): exact extremal spikes +
KPM bulk of the deflated operator, verified against dense ground truth."""

import jax
import jax.numpy as jnp
import numpy as np

from hessian_llm_vision_tpu.krylov import (
    deflated_density,
    deflated_matvec,
    estimate_spectral_range,
)


def _dense_with_outliers(dim=56, seed=0, outliers=(30.0, -22.0), bulk=2.0):
    """Symmetric matrix: tight bulk in ~[-bulk, bulk] + planted outliers."""
    rng = np.random.default_rng(seed)
    a = rng.standard_normal((dim, dim)).astype(np.float32)
    m = (a + a.T) * (bulk / (2.0 * np.sqrt(2.0 * dim)))
    for i, lam in enumerate(outliers):
        u = rng.standard_normal(dim).astype(np.float32)
        u /= np.linalg.norm(u)
        m = m + (lam - 0.0) * np.outer(u, u)
    m = (m + m.T) / 2
    mat = jnp.asarray(m)
    mv = jax.jit(lambda v: mat @ v)
    return mv, np.linalg.eigvalsh(np.asarray(m, np.float64)), m


def test_deflated_matvec_matches_dense_projection():
    dim = 40
    mv, ev, m = _dense_with_outliers(dim=dim, seed=1)
    w, u = np.linalg.eigh(m)
    # deflate the two largest-|lambda| pairs
    idx = np.argsort(np.abs(w))[-2:]
    basis = jnp.asarray(u[:, idx].T, jnp.float32)  # (2, P) rows
    dmv = deflated_matvec(mv, basis)
    assert getattr(dmv, "is_program_backed", False)
    proj = np.eye(dim) - np.asarray(basis).T @ np.asarray(basis)
    dense_defl = proj @ m @ proj
    v = np.random.default_rng(2).standard_normal(dim).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(dmv(jnp.asarray(v))), dense_defl @ v, atol=2e-4
    )


def test_deflated_density_spikes_and_bulk():
    dim = 56
    mv, ev, _ = _dense_with_outliers(dim=dim)
    res = deflated_density(
        mv, dim, 2, 48, jax.random.PRNGKey(0), num_probes=8, tol=1e-8
    )
    assert res.converged
    # exact spikes: the planted outliers, with tight residual certificates
    got = np.sort(res.eigvals)
    want = np.sort([ev[0], ev[-1]])  # -22-ish and +30-ish extremes
    np.testing.assert_allclose(got, want, rtol=1e-5)
    assert res.residuals.max() <= 1e-6 * np.abs(ev).max() * 10

    # the resolution win: the bulk support the KPM rescaled to [-1, 1] is
    # MUCH smaller than the full spectral range
    bulk_ev = ev[1:-1]
    full_range = ev[-1] - ev[0]
    assert 2 * res.bulk.radius < 0.35 * full_range
    # and it brackets the true bulk
    assert res.bulk.center - res.bulk.radius <= bulk_ev[0] + 1e-3
    assert res.bulk.center + res.bulk.radius >= bulk_ev[-1] - 1e-3

    # bulk density integrates to ~1 (it carries (P-2)/P bulk mass plus the
    # 2/P zero-artifact mass of the deflated directions)
    grid = np.linspace(res.bulk.center - res.bulk.radius * 0.999,
                       res.bulk.center + res.bulk.radius * 0.999, 3000)
    rho = res.density(grid)
    np.testing.assert_allclose(np.trapezoid(rho, grid), 1.0, atol=0.03)

    # combined trace: spikes + bulk = E[lambda] of the ORIGINAL operator
    true_mean = float(np.mean(ev))
    # Hutchinson over 8 probes on the bulk: stochastic tolerance scaled to
    # the bulk width (the spike part is exact)
    assert abs(res.trace_estimate() - true_mean) < 0.35 * res.bulk.radius
    np.testing.assert_allclose(
        res.trace_estimate(dim), res.trace_estimate() * dim, rtol=1e-12
    )


def test_deflation_shrinks_kpm_support_vs_undeflated():
    """The measurable benefit: the undeflated range estimate spans the
    outliers; the deflated one spans only the bulk."""
    dim = 48
    mv, ev, _ = _dense_with_outliers(dim=dim, seed=3)
    lo_full, hi_full = estimate_spectral_range(mv, dim, jax.random.PRNGKey(1))
    res = deflated_density(
        mv, dim, 2, 32, jax.random.PRNGKey(2), num_probes=2, tol=1e-8
    )
    assert (hi_full - lo_full) > 2.5 * (2 * res.bulk.radius)
