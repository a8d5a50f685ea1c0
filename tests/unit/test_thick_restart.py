"""Thick-restart Lanczos: converged eigenpairs at bounded basis memory
(krylov/thick_restart.py; beyond the reference's one-pass eigenbases)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hessian_llm_vision_tpu.curvature.operators import MatrixOperator
from hessian_llm_vision_tpu.krylov import lanczos, ritz_decomposition
from hessian_llm_vision_tpu.krylov.thick_restart import lanczos_thick_restart


def _spd_like(rng, d=200):
    A = rng.randn(d, d).astype(np.float32) / np.sqrt(d)
    M = (A + A.T) / 2
    # plant converged outliers at both ends
    u = rng.randn(d, 2).astype(np.float32)
    u, _ = np.linalg.qr(u)
    M = M + 4.0 * np.outer(u[:, 0], u[:, 0]) - 3.0 * np.outer(u[:, 1], u[:, 1])
    return M


def test_trlan_matches_eigh(rng):
    d, k = 200, 6
    M = _spd_like(rng, d)
    op = MatrixOperator(jnp.asarray(M))
    res = lanczos_thick_restart(
        op.matvec, d, k, key=jax.random.PRNGKey(0), inner=20, tol=1e-8,
        which="lm",
    )
    assert res.converged, (res.residuals, res.restarts)
    dense = np.linalg.eigvalsh(M.astype(np.float64))
    want = np.sort(dense[np.argsort(np.abs(dense))[-k:]])
    np.testing.assert_allclose(res.eigvals, want, rtol=1e-6, atol=1e-6)
    # true residuals ||Mv - theta v||, not just the estimates
    V = np.asarray(res.vectors, np.float64)
    for i in range(k):
        r = M.astype(np.float64) @ V[i] - res.eigvals[i] * V[i]
        assert np.linalg.norm(r) < 1e-4 * max(1.0, abs(res.eigvals[i]))
    # rows orthonormal
    G = V @ V.T
    np.testing.assert_allclose(G, np.eye(k), atol=1e-4)
    # the memory plan: needed restarts, i.e. one 20-vector buffer beat a
    # would-be (matvecs, P) unrestarted basis
    assert res.restarts >= 2 and res.matvecs > 20


def test_trlan_both_ends(rng):
    d, k = 150, 4
    M = _spd_like(rng, d)
    op = MatrixOperator(jnp.asarray(M))
    res = lanczos_thick_restart(
        op.matvec, d, k, key=jax.random.PRNGKey(1), inner=18, tol=1e-7,
        which="both",
    )
    dense = np.linalg.eigvalsh(M.astype(np.float64))
    np.testing.assert_allclose(res.eigvals[:2], dense[:2], rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(res.eigvals[-2:], dense[-2:], rtol=1e-5, atol=1e-5)


def test_trlan_beats_one_pass_at_equal_memory(rng):
    """Same basis budget (20 vectors): restarting converges the wanted
    pairs where a single 20-iter pass has not."""
    d, k = 400, 5
    A = rng.randn(d, d).astype(np.float32) / np.sqrt(d)
    M = (A + A.T) / 2  # semicircle: interior extremes converge slowly
    op = MatrixOperator(jnp.asarray(M))
    dense = np.linalg.eigvalsh(M.astype(np.float64))
    want = np.sort(dense[np.argsort(np.abs(dense))[-k:]])

    res = lanczos_thick_restart(
        op.matvec, d, k, key=jax.random.PRNGKey(2), inner=20, tol=1e-7,
    )
    one_pass = ritz_decomposition(
        lanczos(op.matvec, d, 20, key=jax.random.PRNGKey(2), reorth=True)
    )
    ev1 = np.sort(np.asarray(one_pass.eigvals, np.float64))
    one_pass_top = np.sort(ev1[np.argsort(np.abs(ev1))[-k:]])

    err_trl = np.max(np.abs(res.eigvals - want))
    err_one = np.max(np.abs(one_pass_top - want))
    assert res.converged
    assert err_trl < 1e-5 < err_one, (err_trl, err_one)


def test_trlan_bf16_storage(rng):
    d, k = 200, 4
    M = _spd_like(rng, d)
    op = MatrixOperator(jnp.asarray(M))
    res = lanczos_thick_restart(
        op.matvec, d, k, key=jax.random.PRNGKey(3), inner=16, tol=5e-3,
        store_dtype=jnp.bfloat16,
    )
    dense = np.linalg.eigvalsh(M.astype(np.float64))
    want = np.sort(dense[np.argsort(np.abs(dense))[-k:]])
    np.testing.assert_allclose(res.eigvals, want, rtol=2e-2, atol=2e-2)


def test_trlan_validates_args(rng):
    op = MatrixOperator(jnp.eye(10))
    with pytest.raises(ValueError):
        lanczos_thick_restart(op.matvec, 10, 3)  # neither v0 nor key
    with pytest.raises(ValueError):
        lanczos_thick_restart(
            op.matvec, 10, 8, key=jax.random.PRNGKey(0), inner=8
        )  # k >= inner


def test_trlan_identity_breakdown():
    """Identity operator: immediate invariant subspace, graceful finish."""
    d, k = 30, 3
    op = MatrixOperator(jnp.eye(d))
    res = lanczos_thick_restart(
        op.matvec, d, k, key=jax.random.PRNGKey(4), inner=8, tol=1e-6,
        max_restarts=5,
    )
    np.testing.assert_allclose(res.eigvals, np.ones(k), atol=1e-5)


# ---- fused fast path (krylov.driver.dataset_thick_restart_host) ---------


def _quad_batches(rng, d=120, n_batches=3):
    """Per-batch quadratic losses 0.5 p^T M_i p: dataset-mean Hessian is
    mean(M_i); batch 0 plants converged outliers at both ends."""
    mats, batches = [], []
    for i in range(n_batches):
        A = rng.randn(d, d).astype(np.float32) / np.sqrt(d)
        M = (A + A.T) / 2
        if i == 0:
            u = rng.randn(d, 2).astype(np.float32)
            u, _ = np.linalg.qr(u)
            M = (
                M
                + 5.0 * n_batches * np.outer(u[:, 0], u[:, 0])
                - 4.0 * n_batches * np.outer(u[:, 1], u[:, 1])
            )
        mats.append(M)
        batches.append({"A": jnp.asarray(M)})
    return np.mean(mats, axis=0), batches


def _quad_loss(params, batch):
    return 0.5 * params @ (batch["A"] @ params)


def test_fused_trlan_matches_eigh_and_unfused(rng):
    from hessian_llm_vision_tpu.curvature import DatasetHessianOperator
    from hessian_llm_vision_tpu.krylov.driver import (
        dataset_thick_restart_host,
    )

    d, k = 120, 4
    M_mean, batches = _quad_batches(rng, d)
    params = jnp.zeros((d,), jnp.float32)  # quadratic: Hessian is global
    v0 = jax.random.normal(jax.random.PRNGKey(7), (d,), jnp.float32)
    v0 = v0 / jnp.linalg.norm(v0)

    res = dataset_thick_restart_host(
        _quad_loss, params, batches, k, v0=v0, inner=16, tol=1e-8,
        normalization="mean", precision=None,
    )
    assert res.converged, (res.residuals, res.restarts)
    dense = np.linalg.eigvalsh(M_mean.astype(np.float64))
    want = np.sort(dense[np.argsort(np.abs(dense))[-k:]])
    np.testing.assert_allclose(res.eigvals, want, rtol=1e-5, atol=1e-5)
    # true residuals + row orthonormality
    V = np.asarray(res.vectors, np.float64)
    for i in range(k):
        r = M_mean.astype(np.float64) @ V[i] - res.eigvals[i] * V[i]
        assert np.linalg.norm(r) < 1e-4 * max(1.0, abs(res.eigvals[i]))
    np.testing.assert_allclose(V @ V.T, np.eye(k), atol=1e-4)

    # identical algorithm as the unfused matvec path (same v0)
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *batches)
    op = DatasetHessianOperator(
        _quad_loss, params, stacked, normalization="mean", precision=None,
    )
    ref = lanczos_thick_restart(op.matvec, d, k, v0=v0, inner=16, tol=1e-8)
    np.testing.assert_allclose(res.eigvals, ref.eigvals, rtol=1e-5, atol=1e-6)
    assert res.matvecs == ref.matvecs


def test_fused_trlan_bf16_storage(rng):
    from hessian_llm_vision_tpu.krylov.driver import (
        dataset_thick_restart_host,
    )

    d, k = 120, 3
    M_mean, batches = _quad_batches(rng, d)
    res = dataset_thick_restart_host(
        _quad_loss, jnp.zeros((d,), jnp.float32), batches, k,
        key=jax.random.PRNGKey(3), inner=14, tol=5e-3,
        normalization="mean", precision=None, store_dtype=jnp.bfloat16,
    )
    dense = np.linalg.eigvalsh(M_mean.astype(np.float64))
    want = np.sort(dense[np.argsort(np.abs(dense))[-k:]])
    np.testing.assert_allclose(res.eigvals, want, rtol=2e-2, atol=2e-2)


def test_fused_trlan_identity_breakdown():
    """Hessian = I (loss 0.5||p||^2): immediate invariant subspace — the
    IN-PROGRAM breakdown redirect must fire (beta -> 0 branch) and finish
    gracefully, matching the unfused branch's behavior."""
    from hessian_llm_vision_tpu.krylov.driver import (
        dataset_thick_restart_host,
    )

    d, k = 30, 3
    batches = [{"A": jnp.eye(d)}]
    res = dataset_thick_restart_host(
        _quad_loss, jnp.zeros((d,), jnp.float32), batches, k,
        key=jax.random.PRNGKey(4), inner=8, tol=1e-6, max_restarts=5,
        normalization="mean", precision=None,
    )
    np.testing.assert_allclose(res.eigvals, np.ones(k), atol=1e-5)
