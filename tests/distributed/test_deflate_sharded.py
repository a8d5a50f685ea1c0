"""Deflated density with the thick-restart buffer + deflation basis
P-sharded over the mesh.

``deflated_density(basis_sharding=...)`` passes the ``parallel.mesh``
P-sharding convention through to ``lanczos_thick_restart``, and the Ritz
rows come back sharded — the projector program (ops.spectral.project_out)
then runs on the sharded basis in place.  Pins: sharded == unsharded
spikes AND bulk moments on a dense operator, and the deflation basis
actually living sharded.
"""

import jax
import jax.numpy as jnp
import numpy as np

from hessian_llm_vision_tpu.krylov import deflated_density
from hessian_llm_vision_tpu.parallel import make_mesh
from hessian_llm_vision_tpu.parallel.mesh import basis_sharding


def _dense_op(dim, seed=0, outliers=(40.0, -35.0, 30.0)):
    """Bulk ~ Wigner in [-2, 2] + detached outliers (the LM-Hessian shape
    deflation exists for)."""
    rng = np.random.RandomState(seed)
    a = rng.randn(dim, dim).astype(np.float32) / np.sqrt(dim)
    mat = (a + a.T) / 2.0
    q, _ = np.linalg.qr(rng.randn(dim, len(outliers)))
    mat = mat + (q * np.asarray(outliers)) @ q.T
    mat = jnp.asarray(mat)

    def matvec(v):
        return mat @ v

    return jax.jit(matvec), np.linalg.eigvalsh(np.asarray(mat))


def test_deflated_density_sharded_matches_unsharded():
    dim = 64
    matvec, ev = _dense_op(dim)
    mesh = make_mesh(8)
    key = jax.random.PRNGKey(7)

    plain = deflated_density(matvec, dim, 3, 24, key, num_probes=2)
    sharded = deflated_density(
        matvec, dim, 3, 24, key, num_probes=2,
        basis_sharding=basis_sharding(mesh),
    )
    assert plain.converged and sharded.converged
    np.testing.assert_allclose(sharded.eigvals, plain.eigvals, rtol=1e-5)
    # same probes + same deflated operator -> same bulk moments (the
    # projector math is identical; only the layout differs)
    np.testing.assert_allclose(
        sharded.bulk.moments, plain.bulk.moments, rtol=1e-4, atol=1e-6
    )
    np.testing.assert_allclose(
        sharded.bulk.center, plain.bulk.center, rtol=1e-4
    )
    # the exact spikes are the planted outliers
    np.testing.assert_allclose(
        np.sort(np.abs(sharded.eigvals)), [30.0, 35.0, 40.0], rtol=0.05
    )
    # bulk support excludes the deflated outliers
    assert sharded.bulk.center + sharded.bulk.radius < 25.0


def test_deflated_density_trace_combines_sharded():
    dim = 64
    matvec, ev = _dense_op(dim, seed=2)
    mesh = make_mesh(8)
    res = deflated_density(
        matvec, dim, 3, 32, jax.random.PRNGKey(3), num_probes=4,
        basis_sharding=basis_sharding(mesh),
    )
    # E[lambda] = tr(A)/dim: spikes exactly + bulk stochastically
    want = float(np.sum(ev)) / dim
    got = res.trace_estimate()
    assert abs(got - want) < 0.35  # stochastic bulk term, 4 probes
