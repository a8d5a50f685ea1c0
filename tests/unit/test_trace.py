"""Hutchinson / Hutch++ trace estimators vs exact dense traces."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hessian_llm_vision_tpu.krylov import hutchinson_trace, hutchpp_trace


def _spiked_matrix(key, dim=200, outliers=(50.0, 30.0, 20.0)):
    """Loss-Hessian-shaped fixture: a few large outliers + small bulk
    (the structure of every reference spectrum, eigeninfo/*)."""
    a = jax.random.normal(key, (dim, dim)) / jnp.sqrt(dim)
    m = (a + a.T) / 2 * 0.1
    for i, lam in enumerate(outliers):
        # dense random outlier directions: coordinate-axis spikes would add
        # only diagonal mass, which Rademacher-Hutchinson estimates with
        # near-zero variance and deflation then has nothing to win
        e = jax.random.normal(jax.random.fold_in(key, i), (dim,))
        e = e / jnp.linalg.norm(e)
        m = m + lam * jnp.outer(e, e)
    return m


def test_hutchinson_converges():
    key = jax.random.PRNGKey(0)
    m = _spiked_matrix(key)
    exact = float(jnp.trace(m))
    est = hutchinson_trace(lambda v: m @ v, m.shape[0], 400, jax.random.PRNGKey(1))
    assert abs(float(est) - exact) / abs(exact) < 0.1


def test_hutchpp_beats_hutchinson_on_spiked_spectrum():
    """At equal matvec budget, Hutch++'s deflation absorbs the outliers:
    its error over seeds must be well below Hutchinson's."""
    key = jax.random.PRNGKey(0)
    m = _spiked_matrix(key)
    exact = float(jnp.trace(m))
    mv = lambda v: m @ v
    budget = 30
    errs_h, errs_pp = [], []
    for s in range(8):
        k = jax.random.PRNGKey(100 + s)
        errs_h.append(abs(float(hutchinson_trace(mv, m.shape[0], budget, k)) - exact))
        errs_pp.append(abs(float(hutchpp_trace(mv, m.shape[0], budget, k)) - exact))
    assert np.mean(errs_pp) < 0.5 * np.mean(errs_h)
    # and Hutch++ is accurate in absolute terms at this tiny budget
    assert np.mean(errs_pp) / abs(exact) < 0.05


def test_hutchpp_exact_on_low_rank():
    """If rank(A) <= sketch size, the sketch captures the whole range and
    Hutch++ is EXACT (the deflated remainder is zero)."""
    key = jax.random.PRNGKey(2)
    u = jax.random.normal(key, (64, 3))
    m = u @ u.T  # rank 3
    est = hutchpp_trace(lambda v: m @ v, 64, 12, jax.random.PRNGKey(3))
    np.testing.assert_allclose(float(est), float(jnp.trace(m)), rtol=1e-4)


def test_trace_estimators_jit_and_host_loop_agree():
    key = jax.random.PRNGKey(4)
    m = _spiked_matrix(key, dim=50)
    mv = lambda v: m @ v
    kp = jax.random.PRNGKey(5)
    a = hutchpp_trace(mv, 50, 9, kp, vmapped=True)
    b = hutchpp_trace(mv, 50, 9, kp, vmapped=False)
    np.testing.assert_allclose(float(a), float(b), rtol=1e-5)
    jitted = jax.jit(
        lambda k: hutchpp_trace(mv, 50, 9, k)
    )(kp)
    np.testing.assert_allclose(float(jitted), float(a), rtol=1e-5)


def test_hessian_trace_of_quadratic():
    """tr(H) of a quadratic loss 0.5 x^T A x is tr(A) exactly — through the
    real HessianOperator protocol."""
    from hessian_llm_vision_tpu.curvature import HessianOperator

    key = jax.random.PRNGKey(6)
    dim = 40
    a = _spiked_matrix(key, dim=dim, outliers=(10.0,))

    def loss(params, batch):
        x = params["x"]
        return 0.5 * x @ (a @ x)

    op = HessianOperator(loss, {"x": jnp.ones((dim,))}, {})
    est = hutchpp_trace(op.matvec, op.dim, 24, jax.random.PRNGKey(7))
    np.testing.assert_allclose(float(est), float(jnp.trace(a)), rtol=0.05)


def test_probe_budget_validation():
    mv = lambda v: v
    with pytest.raises(ValueError):
        hutchinson_trace(mv, 4, 0, jax.random.PRNGKey(0))
    with pytest.raises(ValueError):
        hutchpp_trace(mv, 4, 2, jax.random.PRNGKey(0))
