"""Lanczos/SLQ vs dense eigh — ports the reference's notebook fixtures
(First Principles Lanczos.ipynb, Discrepancy.ipynb; SURVEY.md §4.1-2)."""

import jax
import jax.numpy as jnp
import numpy as np

from hessian_llm_vision_tpu.curvature.operators import MatrixOperator
from hessian_llm_vision_tpu.krylov import (
    lanczos,
    lanczos_checkpointed,
    ritz_decomposition,
    trace_estimate,
    quadrature,
    spectral_density,
    power_iteration,
    cg_solve,
)
from hessian_llm_vision_tpu.krylov.slq import slq_multi_probe


def _sym(rng, d=300):
    """Dense random symmetric M=(A+Aᵀ)/2, the reference's fixture."""
    A = rng.randn(d, d).astype(np.float32) / np.sqrt(d)
    return (A + A.T) / 2


def _spiked(rng, d=300):
    """Rank-1-spiked variant M + 11ᵀ/(√d/3) to check outlier recovery
    (First Principles Lanczos.ipynb cell 4)."""
    M = _sym(rng, d)
    ones = np.ones((d, 1), dtype=np.float32)
    return M + (ones @ ones.T) / (np.sqrt(d) / 3)


def test_full_lanczos_recovers_spectrum(rng):
    d = 120
    M = _sym(rng, d)
    op = MatrixOperator(jnp.asarray(M))
    res = lanczos(op.matvec, d, d, key=jax.random.PRNGKey(1), reorth=True)
    spec = ritz_decomposition(res)
    exact = np.linalg.eigvalsh(M)
    np.testing.assert_allclose(np.asarray(spec.eigvals), exact, atol=5e-3)


def test_outlier_recovery_spiked(rng):
    d = 300
    M = _spiked(rng, d)
    op = MatrixOperator(jnp.asarray(M))
    res = lanczos(op.matvec, d, 30, key=jax.random.PRNGKey(2), reorth=True)
    spec = ritz_decomposition(res)
    exact_max = np.linalg.eigvalsh(M)[-1]
    np.testing.assert_allclose(float(spec.eigvals[-1]), exact_max, rtol=1e-3)


def test_basis_orthonormal_with_reorth(rng):
    """The Discrepancy.ipynb check: pairwise dot products of Krylov vectors."""
    d = 200
    M = _sym(rng, d)
    res = lanczos(
        MatrixOperator(jnp.asarray(M)).matvec,
        d,
        40,
        key=jax.random.PRNGKey(3),
        reorth=True,
    )
    G = np.asarray(res.basis @ res.basis.T)
    np.testing.assert_allclose(G, np.eye(40), atol=1e-4)


def test_lanczos_matches_dense_tridiag_identity(rng):
    """T = Qᵀ M Q for the computed basis."""
    d = 150
    M = _sym(rng, d)
    res = lanczos(
        MatrixOperator(jnp.asarray(M)).matvec,
        d,
        20,
        key=jax.random.PRNGKey(4),
        reorth=True,
    )
    Q = np.asarray(res.basis)  # (20, d) rows
    T_rec = Q @ M @ Q.T
    np.testing.assert_allclose(T_rec, np.asarray(res.tridiag()), atol=1e-3)


def test_t_only_mode_matches_basis_mode(rng):
    """diego_pythia T-only memory-light path == basis path (no reorth)."""
    d = 100
    M = _sym(rng, d)
    op = MatrixOperator(jnp.asarray(M))
    v0 = jnp.asarray(rng.randn(d).astype(np.float32))
    res_a = lanczos(op.matvec, d, 10, v0=v0, reorth=False, store_basis=True)
    res_b = lanczos(op.matvec, d, 10, v0=v0, reorth=False, store_basis=False)
    assert res_b.basis is None
    np.testing.assert_allclose(
        np.asarray(res_a.alphas), np.asarray(res_b.alphas), rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(res_a.betas), np.asarray(res_b.betas), rtol=1e-5
    )


def test_checkpointed_lanczos_resumes(rng):
    d = 80
    M = _sym(rng, d)
    op = MatrixOperator(jnp.asarray(M))
    v0 = jnp.asarray(rng.randn(d).astype(np.float32))
    full = lanczos_checkpointed(op.matvec, d, 12, v0=v0)
    seen = []
    full2 = lanczos_checkpointed(
        op.matvec, d, 12, v0=v0, callback=lambda i, a, b: seen.append(i)
    )
    assert seen == list(range(12))
    np.testing.assert_allclose(
        np.asarray(full.alphas), np.asarray(full2.alphas), rtol=1e-6
    )
    # matches the scan implementation
    res = lanczos(op.matvec, d, 12, v0=v0, reorth=False, store_basis=False)
    np.testing.assert_allclose(
        np.asarray(full.alphas), np.asarray(res.alphas), rtol=1e-4
    )


def test_slq_trace_estimate(rng):
    """Multi-probe SLQ trace estimate vs exact trace/P (GPT2 spectrum.ipynb
    cell 4 semantics)."""
    d = 300
    M = _sym(rng, d)
    M += 2 * np.eye(d, dtype=np.float32)  # shift trace away from 0
    op = MatrixOperator(jnp.asarray(M))
    spec = slq_multi_probe(op.matvec, d, 30, jax.random.PRNGKey(5), 8)
    est = float(trace_estimate(spec, dim=d))
    np.testing.assert_allclose(est, np.trace(M), rtol=0.15)


def test_quadrature_and_density(rng):
    d = 200
    M = _sym(rng, d)
    op = MatrixOperator(jnp.asarray(M))
    res = lanczos(op.matvec, d, 40, key=jax.random.PRNGKey(6), reorth=True)
    spec = ritz_decomposition(res)
    # quadrature of f=1 must equal 1 (unit probe, weights sum to 1)
    np.testing.assert_allclose(float(quadrature(spec, jnp.ones_like)), 1.0, rtol=1e-5)
    grid = jnp.linspace(-3, 3, 101)
    dens = spectral_density(spec, grid, sigma=0.2)
    # density integrates to ~1
    integral = float(jnp.trapezoid(dens, grid))
    np.testing.assert_allclose(integral, 1.0, rtol=0.05)


def test_ritz_vectors_are_eigvecs_at_convergence(rng):
    d = 100
    M = _sym(rng, d)
    op = MatrixOperator(jnp.asarray(M))
    res = lanczos(op.matvec, d, d, key=jax.random.PRNGKey(7), reorth=True)
    spec = ritz_decomposition(res, with_vectors=True)
    V = np.asarray(spec.ritz_vectors)
    lam = np.asarray(spec.eigvals)
    # M v_i ≈ λ_i v_i for the extremal Ritz pairs
    for i in [0, -1]:
        np.testing.assert_allclose(M @ V[i], lam[i] * V[i], atol=5e-3)


def test_power_iteration(rng):
    d = 150
    M = _spiked(rng, d)
    lam, v = power_iteration(
        MatrixOperator(jnp.asarray(M)).matvec, d, 200, key=jax.random.PRNGKey(8)
    )
    exact = np.linalg.eigvalsh(M)[-1]
    np.testing.assert_allclose(float(lam), exact, rtol=1e-3)


def test_cg_solve(rng):
    d = 100
    M = _sym(rng, d) + 3 * np.eye(d, dtype=np.float32)  # SPD
    b = jnp.asarray(rng.randn(d).astype(np.float32))
    res = cg_solve(MatrixOperator(jnp.asarray(M)).matvec, b, tol=1e-6, max_iters=200)
    np.testing.assert_allclose(np.asarray(M @ res.x), np.asarray(b), atol=1e-3)
