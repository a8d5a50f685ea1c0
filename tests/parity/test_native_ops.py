"""Native C++ host ops vs jnp reference (parity tier, SURVEY.md §4)."""

import shutil

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    shutil.which("g++") is None and shutil.which("make") is None,
    reason="no native toolchain",
)


def test_native_rank_k_apply_matches_jnp(key):
    import jax
    import jax.numpy as jnp

    from hessian_llm_vision_tpu.ops.native import (
        num_threads,
        rank_k_apply_native,
    )
    from hessian_llm_vision_tpu.ops.spectral import rank_k_apply_reference

    assert num_threads() >= 1
    kg, kv, kc = jax.random.split(key, 3)
    g = np.asarray(jax.random.normal(kg, (5000,)))
    V = np.asarray(jax.random.normal(kv, (7, 5000)))
    c = np.asarray(jax.random.normal(kc, (7,)))
    ref = np.asarray(rank_k_apply_reference(jnp.asarray(g), jnp.asarray(V), jnp.asarray(c)))
    out = rank_k_apply_native(g, V, c)
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-3)


def test_native_adjust_and_project(key):
    import jax
    import jax.numpy as jnp

    from hessian_llm_vision_tpu.ops.native import (
        project_out_native,
        spectral_adjust_native,
    )
    from hessian_llm_vision_tpu.ops.spectral import (
        project_out_reference,
        spectral_adjust_reference,
    )

    kg, kv = jax.random.split(key)
    g = np.asarray(jax.random.normal(kg, (2000,)))
    V, _ = np.linalg.qr(np.asarray(jax.random.normal(kv, (2000, 5))))
    V = V.T.astype(np.float32)
    eig = np.asarray([0.7, 1.1, 3.0, 9.0, 40.0], np.float32)
    ref = np.asarray(
        spectral_adjust_reference(jnp.asarray(g), jnp.asarray(V), jnp.asarray(eig), 1e-3)
    )
    out = spectral_adjust_native(g, V, eig, 1e-3)
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-3)

    proj = project_out_native(g, V)
    ref_p = np.asarray(project_out_reference(jnp.asarray(g), jnp.asarray(V)))
    np.testing.assert_allclose(proj, ref_p, atol=1e-4)
    np.testing.assert_allclose(V @ proj, np.zeros(5), atol=1e-4)
