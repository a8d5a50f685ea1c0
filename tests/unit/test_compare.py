"""Spectrum comparison utilities + end-to-end self-consistency check:
two independent Lanczos runs on the same operator agree to 1e-3 on the
extremal Ritz values (the BASELINE parity metric, applied to ourselves)."""

import jax
import jax.numpy as jnp
import numpy as np

from hessian_llm_vision_tpu.curvature.operators import MatrixOperator
from hessian_llm_vision_tpu.krylov import lanczos, ritz_decomposition
from hessian_llm_vision_tpu.krylov.compare import (
    density_overlap,
    ritz_relative_error,
    summarize,
)


def test_self_consistency_extremal_ritz(rng):
    d = 400
    A = rng.randn(d, d).astype(np.float32) / np.sqrt(d)
    M = (A + A.T) / 2
    ones = np.ones((d, 1), dtype=np.float32)
    M = M + (ones @ ones.T) / (np.sqrt(d) / 3)  # spiked: converged outlier
    op = MatrixOperator(jnp.asarray(M))
    specs = []
    for seed in (1, 2):
        res = lanczos(op.matvec, d, 30, key=jax.random.PRNGKey(seed), reorth=True)
        specs.append(ritz_decomposition(res))
    err = ritz_relative_error(specs[0], specs[1], top_k=1)
    assert err < 1e-3  # the BASELINE.json parity bar
    assert density_overlap(specs[0], specs[1]) > 0.8


def test_wasserstein_distance():
    from hessian_llm_vision_tpu.krylov.compare import wasserstein_distance
    from hessian_llm_vision_tpu.krylov.slq import Spectrum

    a = Spectrum(eigvals=jnp.asarray([1.0, 3.0]), gammas=jnp.asarray([0.5, 0.5]))
    # identical measures -> 0
    assert wasserstein_distance(a, a) == 0.0
    # a rigid shift of every atom by s costs exactly s
    b = Spectrum(eigvals=jnp.asarray([1.5, 3.5]), gammas=jnp.asarray([0.5, 0.5]))
    np.testing.assert_allclose(wasserstein_distance(a, b), 0.5, rtol=1e-12)
    # two deltas: moving mass 1 across |x-y| costs |x-y|
    c = Spectrum(eigvals=jnp.asarray([0.0]), gammas=jnp.asarray([1.0]))
    d = Spectrum(eigvals=jnp.asarray([2.0]), gammas=jnp.asarray([1.0]))
    np.testing.assert_allclose(wasserstein_distance(c, d), 2.0, rtol=1e-12)
    # unnormalised gammas are renormalised, not double-counted
    e = Spectrum(eigvals=jnp.asarray([0.0]), gammas=jnp.asarray([2.0]))
    np.testing.assert_allclose(wasserstein_distance(e, d), 2.0, rtol=1e-12)
    # symmetric
    np.testing.assert_allclose(
        wasserstein_distance(a, b), wasserstein_distance(b, a), rtol=1e-12
    )


def test_summarize(rng):
    from hessian_llm_vision_tpu.krylov.slq import Spectrum

    s = Spectrum(eigvals=jnp.asarray([1.0, 2.0, 5.0]), gammas=jnp.asarray([0.2, 0.3, 0.5]))
    info = summarize(s)
    assert info["lambda_max"] == 5.0
    np.testing.assert_allclose(info["trace_estimate"], 0.2 + 0.6 + 2.5)
    np.testing.assert_allclose(info["weight_sum"], 1.0)


def test_subspace_overlap():
    from hessian_llm_vision_tpu.krylov import subspace_overlap

    rng = np.random.default_rng(0)
    P, k = 200, 5
    v = rng.standard_normal((k, P))
    # identical subspace, even under rotation + rescaling of the basis
    rot = np.linalg.qr(rng.standard_normal((k, k)))[0]
    np.testing.assert_allclose(subspace_overlap(v, 3.7 * rot @ v), 1.0, atol=1e-10)
    # orthogonal coordinate subspaces
    a = np.eye(P)[:k]
    b = np.eye(P)[k : 2 * k]
    np.testing.assert_allclose(subspace_overlap(a, b), 0.0, atol=1e-12)
    # independent random subspaces concentrate near k/P
    w = rng.standard_normal((k, P))
    assert subspace_overlap(v, w) < 5 * k / P
    # different ranks: a (2,P) slice of v lies inside span(v)
    np.testing.assert_allclose(subspace_overlap(v[:2], v), 1.0, atol=1e-10)
