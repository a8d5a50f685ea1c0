"""Host-offloaded-basis Lanczos vs on-device implementation."""

import jax
import jax.numpy as jnp
import numpy as np

from hessian_llm_vision_tpu.curvature.operators import MatrixOperator
from hessian_llm_vision_tpu.krylov import lanczos, ritz_decomposition
from hessian_llm_vision_tpu.krylov.host_lanczos import lanczos_host_basis


def test_host_lanczos_matches_device(rng):
    d = 200
    A = rng.randn(d, d).astype(np.float32) / np.sqrt(d)
    M = (A + A.T) / 2
    op = MatrixOperator(jnp.asarray(M))
    v0 = rng.randn(d).astype(np.float32)
    res_host = lanczos_host_basis(op.matvec, d, 30, v0=np.asarray(v0), reorth=True)
    res_dev = lanczos(op.matvec, d, 30, v0=jnp.asarray(v0), reorth=True)
    np.testing.assert_allclose(
        np.asarray(res_host.alphas), np.asarray(res_dev.alphas), rtol=1e-4, atol=1e-5
    )
    assert isinstance(res_host.basis, np.ndarray)
    # basis orthonormal (host CGS2)
    G = res_host.basis @ res_host.basis.T
    np.testing.assert_allclose(G, np.eye(30), atol=1e-5)
    # SLQ works unchanged on the host result
    spec_h = ritz_decomposition(res_host)
    spec_d = ritz_decomposition(res_dev)
    np.testing.assert_allclose(
        np.asarray(spec_h.eigvals), np.asarray(spec_d.eigvals), rtol=1e-3, atol=1e-4
    )


def test_host_lanczos_native_adjust_path(rng):
    """Full host pipeline: host basis -> Ritz -> native C++ adjustment,
    zero basis H2D (the gpt2_hessian_cpu.py flow, minus the transfers)."""
    import shutil

    import pytest

    if shutil.which("g++") is None:
        pytest.skip("no toolchain")
    from hessian_llm_vision_tpu.ops.native import spectral_adjust_native
    from hessian_llm_vision_tpu.ops.spectral import spectral_adjust_reference

    d = 150
    A = rng.randn(d, d).astype(np.float32) / np.sqrt(d)
    M = (A + A.T) / 2 + 2 * np.eye(d, dtype=np.float32)
    op = MatrixOperator(jnp.asarray(M))
    g = rng.randn(d).astype(np.float32)
    res = lanczos_host_basis(op.matvec, d, 10, v0=g.copy(), reorth=True)
    spec = ritz_decomposition(res, with_vectors=True)
    V = np.asarray(spec.ritz_vectors)
    out = spectral_adjust_native(g, V, np.asarray(spec.eigvals), 1e-2)
    ref = np.asarray(
        spectral_adjust_reference(
            jnp.asarray(g), jnp.asarray(V), jnp.asarray(spec.eigvals), 1e-2
        )
    )
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_host_lanczos_callback(rng):
    d = 50
    M = np.eye(d, dtype=np.float32) * 2
    op = MatrixOperator(jnp.asarray(M))
    seen = []
    lanczos_host_basis(
        op.matvec, d, 5, v0=rng.randn(d).astype(np.float32),
        callback=lambda i, a, b: seen.append(i),
    )
    assert seen == [0, 1, 2, 3, 4]
