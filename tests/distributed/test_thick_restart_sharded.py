"""Thick-restart Lanczos with the basis buffer P-sharded over the mesh.

The (inner+1, P) buffer is thick restart's whole memory footprint; sharding
it along P (the ``krylov.lanczos`` basis_sharding convention) is what lets
converged eigenbases scale past one chip's HBM (20 GB at 124M/f32/m=40 ->
2.5 GB/device on 8).  These tests pin: sharded == unsharded numerics on a
dense operator (incl. a P not divisible by the mesh, exercising the
zero-pad path), the buffer actually living sharded, and the returned Ritz
pairs solving the eigenproblem.
"""

import jax
import jax.numpy as jnp
import numpy as np

from hessian_llm_vision_tpu.krylov import lanczos_thick_restart
from hessian_llm_vision_tpu.parallel import make_mesh
from hessian_llm_vision_tpu.parallel.mesh import basis_sharding


def _dense_op(dim, seed=0):
    rng = np.random.RandomState(seed)
    a = rng.randn(dim, dim).astype(np.float32)
    mat = jnp.asarray((a + a.T) / 2.0)

    def matvec(v):
        return mat @ v

    return jax.jit(matvec), np.linalg.eigvalsh(np.asarray(mat))


def test_sharded_matches_unsharded():
    dim = 64  # divisible by 8
    matvec, ev_dense = _dense_op(dim)
    mesh = make_mesh(8)
    v0 = jax.random.normal(jax.random.PRNGKey(1), (dim,), jnp.float32)
    v0 = v0 / jnp.linalg.norm(v0)

    plain = lanczos_thick_restart(matvec, dim, 4, v0=v0, inner=16)
    sharded = lanczos_thick_restart(
        matvec, dim, 4, v0=v0, inner=16, basis_sharding=basis_sharding(mesh)
    )
    assert sharded.converged
    np.testing.assert_allclose(sharded.eigvals, plain.eigvals, rtol=1e-5)
    # wanted pairs really solve A v = lambda v
    for lam, vec in zip(sharded.eigvals, np.asarray(sharded.vectors)):
        np.testing.assert_allclose(
            np.asarray(matvec(jnp.asarray(vec))), lam * vec,
            rtol=1e-3, atol=1e-3,
        )


def test_sharded_pads_indivisible_dim():
    dim = 61  # prime-ish: 61 % 8 != 0 -> pad path
    matvec, ev_dense = _dense_op(dim, seed=3)
    mesh = make_mesh(8)

    res = lanczos_thick_restart(
        matvec, dim, 3, key=jax.random.PRNGKey(2), inner=16,
        basis_sharding=basis_sharding(mesh),
    )
    assert res.converged
    assert res.vectors.shape == (3, dim)
    top3 = np.sort(np.abs(ev_dense))[-3:]
    np.testing.assert_allclose(
        np.sort(np.abs(res.eigvals)), top3, rtol=1e-4
    )


def test_buffer_actually_sharded():
    """The returned Ritz vectors must be P-sharded (they are rotated
    straight out of the sharded buffer) — each device holds a (k, P/8)
    column block."""
    dim = 64
    matvec, _ = _dense_op(dim, seed=5)
    mesh = make_mesh(8)
    res = lanczos_thick_restart(
        matvec, dim, 3, key=jax.random.PRNGKey(0), inner=16,
        basis_sharding=basis_sharding(mesh),
    )
    shards = res.vectors.addressable_shards
    assert len(shards) == 8
    assert all(s.data.shape == (3, dim // 8) for s in shards)


def test_fused_trlan_sharded_pads_indivisible_dim():
    """The fused-step path (one donating program per inner iteration,
    krylov.driver._jitted_fused_trlan_step) under a P-sharded buffer with
    a pad: the in-program HVP must slice the true subspace, re-pad the
    matvec, and keep the fresh-direction redirect inside it."""
    from hessian_llm_vision_tpu.krylov.driver import (
        dataset_thick_restart_host,
    )

    dim = 61  # 61 % 8 != 0 -> pad path
    rng = np.random.RandomState(3)
    a = rng.randn(dim, dim).astype(np.float32)
    M = (a + a.T) / 2.0
    ev_dense = np.linalg.eigvalsh(M.astype(np.float64))
    mesh = make_mesh(8)

    def loss(params, batch):
        return 0.5 * params @ (batch["A"] @ params)

    res = dataset_thick_restart_host(
        loss, jnp.zeros((dim,), jnp.float32), [{"A": jnp.asarray(M)}], 3,
        key=jax.random.PRNGKey(2), inner=16, normalization="mean",
        precision=None, basis_sharding=basis_sharding(mesh),
    )
    assert res.converged
    assert res.vectors.shape == (3, dim)
    np.testing.assert_allclose(
        np.sort(np.abs(res.eigvals)), np.sort(np.abs(ev_dense))[-3:],
        rtol=1e-4,
    )
