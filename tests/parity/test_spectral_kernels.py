"""Pallas spectral kernels (interpret mode on CPU) vs pure-jnp reference
(SURVEY.md §4 'implication': parity tests)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hessian_llm_vision_tpu.ops.spectral import (
    _rank_k_apply_pallas,
    rank_k_apply_reference,
    spectral_adjust_reference,
    project_out_reference,
    spectral_adjust,
    project_out,
)


@pytest.mark.parametrize("k,p", [(10, 8192), (3, 20000), (35, 16384)])
def test_pallas_matches_reference(key, k, p):
    kg, kv, kc = jax.random.split(key, 3)
    g = jax.random.normal(kg, (p,), dtype=jnp.float32)
    V = jax.random.normal(kv, (k, p), dtype=jnp.float32) / np.sqrt(p)
    c = jax.random.normal(kc, (k,), dtype=jnp.float32)
    ref = rank_k_apply_reference(g, V, c)
    out = _rank_k_apply_pallas(g, V, c, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_adjust_matches_loop_formula(key):
    """Closed-form check against the reference's Python eigenpair loop
    (gpt2_hessian.py:199-203)."""
    k, p = 6, 500
    kg, kv = jax.random.split(key)
    g = jax.random.normal(kg, (p,), dtype=jnp.float32)
    V, _ = np.linalg.qr(np.asarray(jax.random.normal(kv, (p, k))))
    V = jnp.asarray(V.T, jnp.float32)
    eigvals = jnp.asarray([-2.0, -0.5, 0.3, 1.0, 5.0, 40.0], jnp.float32)
    delta = 1e-2
    expected = np.asarray(g, np.float64).copy()
    for i in range(k):
        dot = float(np.dot(np.asarray(g), np.asarray(V[i])))
        expected += (
            (1.0 / float(eigvals[i]) - 1.0 / (float(eigvals[i]) + delta))
            * dot
            * np.asarray(V[i], np.float64)
        )
    out = spectral_adjust(g, V, eigvals, delta, use_pallas=False)
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-4, atol=1e-4)


def test_adjust_diagonal_hessian_closed_form(key):
    """On an exactly-diagonal Hessian with full eigenbasis, the adjusted
    gradient must equal the damped-Newton step direction scaled back:
    adj = Σᵢ (1/λᵢ)(eᵢ·g)eᵢ + Σ_{i∉basis}... here basis is full =>
    adj_i = g_i * (1 + 1/λᵢ − 1/(λᵢ+δ))."""
    p = 8
    g = jnp.arange(1.0, p + 1.0, dtype=jnp.float32)
    V = jnp.eye(p, dtype=jnp.float32)
    lam = jnp.linspace(0.5, 4.0, p)
    delta = 0.1
    out = spectral_adjust(g, V, lam, delta, use_pallas=False)
    expected = np.asarray(g) * (
        1 + 1 / np.asarray(lam) - 1 / (np.asarray(lam) + delta)
    )
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-5)


def test_projection_removes_components(key):
    """g − Σ(vᵢ·g)vᵢ has zero component along every vᵢ (load_model.py:350-364)."""
    k, p = 4, 300
    kv, kg = jax.random.split(key)
    V, _ = np.linalg.qr(np.asarray(jax.random.normal(kv, (p, k))))
    V = jnp.asarray(V.T, jnp.float32)
    g = jax.random.normal(kg, (p,), dtype=jnp.float32)
    out = project_out(g, V, use_pallas=False)
    np.testing.assert_allclose(np.asarray(V @ out), np.zeros(k), atol=1e-5)
    # idempotent
    out2 = project_out(out, V, use_pallas=False)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(out), atol=1e-5)


def test_rank_k_bf16_streaming_parity(key):
    """bf16-streaming path (basis stays bf16, f32 MXU accumulation) matches
    the f32 reference within the bf16-row bound (<= 2e-3 relative)."""
    from hessian_llm_vision_tpu.ops.spectral import (
        rank_k_apply,
        rank_k_apply_bf16,
        rank_k_apply_reference,
    )

    k, p = 10, 5000
    kv, kg = jax.random.split(key)
    V = jax.random.normal(kv, (k, p), dtype=jnp.float32) / np.sqrt(p)
    g = jax.random.normal(kg, (p,), dtype=jnp.float32)
    c = jnp.linspace(0.5, 3.0, k)

    ref = np.asarray(rank_k_apply_reference(g, V, c), np.float64)
    out = np.asarray(rank_k_apply_bf16(g, V.astype(jnp.bfloat16), c))
    rel = np.linalg.norm(out - ref) / np.linalg.norm(ref)
    assert rel <= 2e-3, rel

    # the dispatcher routes bf16 bases to the streaming path
    auto = np.asarray(rank_k_apply(g, V.astype(jnp.bfloat16), c))
    np.testing.assert_array_equal(auto, out)
    # and the f32 path is untouched
    np.testing.assert_array_equal(
        np.asarray(rank_k_apply(g, V, c)),
        np.asarray(rank_k_apply_reference(g, V, c)),
    )
