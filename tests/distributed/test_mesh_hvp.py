"""Distributed tests on the 8-device simulated-CPU mesh (SURVEY.md §4
'implication': the TPU-native equivalent of multi-node-without-a-cluster)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hessian_llm_vision_tpu.curvature import HessianOperator
from hessian_llm_vision_tpu.krylov import lanczos, ritz_decomposition
from hessian_llm_vision_tpu.parallel import (
    make_mesh,
    shard_batch,
    basis_sharding,
    ShardedHessianOperator,
    sharded_grad_fn,
)
from hessian_llm_vision_tpu.models import SpiralMLP, losses
from hessian_llm_vision_tpu.data import make_spirals


@pytest.fixture(scope="module")
def problem():
    x, y = make_spirals(240, seed=11)
    model = SpiralMLP(width=16, depth=2)
    params = model.init(jax.random.PRNGKey(0), x[:4])["params"]

    def loss_fn(p, b):
        return losses.softmax_cross_entropy(model.apply({"params": p}, b[0]), b[1])

    return loss_fn, params, (jnp.asarray(x), jnp.asarray(y))


def test_eight_devices_available():
    assert len(jax.devices()) == 8


def test_sharded_grad_matches_single(problem):
    loss_fn, params, batch = problem
    mesh = make_mesh()
    grad_fn = sharded_grad_fn(loss_fn, mesh)
    sb = shard_batch(batch, mesh)
    loss_sh, grad_sh = jax.jit(grad_fn)(params, sb)
    loss_1, grad_1 = jax.value_and_grad(loss_fn)(params, batch)
    np.testing.assert_allclose(float(loss_sh), float(loss_1), rtol=1e-5)
    for a, b in zip(
        jax.tree_util.tree_leaves(grad_sh), jax.tree_util.tree_leaves(grad_1)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_sharded_hvp_matches_single(problem):
    loss_fn, params, batch = problem
    mesh = make_mesh()
    sb = shard_batch(batch, mesh)
    op_sh = ShardedHessianOperator(loss_fn, params, sb, mesh)
    op_1 = HessianOperator(loss_fn, params, batch)
    v = jax.random.normal(jax.random.PRNGKey(3), (op_1.dim,))
    np.testing.assert_allclose(
        np.asarray(op_sh(v)), np.asarray(op_1(v)), atol=2e-5
    )


def test_sharded_lanczos_spectrum_matches_single(problem):
    """Full pipeline on the mesh: psum'd HVP + P-sharded Krylov basis."""
    loss_fn, params, batch = problem
    mesh = make_mesh()
    sb = shard_batch(batch, mesh)
    op_sh = ShardedHessianOperator(loss_fn, params, sb, mesh)
    op_1 = HessianOperator(loss_fn, params, batch)
    v0 = jax.random.normal(jax.random.PRNGKey(5), (op_1.dim,))

    res_sh = lanczos(
        op_sh.matvec,
        op_sh.dim,
        12,
        v0=v0,
        reorth=True,
        basis_sharding=basis_sharding(mesh),
    )
    res_1 = lanczos(op_1.matvec, op_1.dim, 12, v0=v0, reorth=True)
    spec_sh = ritz_decomposition(res_sh)
    spec_1 = ritz_decomposition(res_1)
    np.testing.assert_allclose(
        np.asarray(spec_sh.eigvals), np.asarray(spec_1.eigvals), rtol=1e-3, atol=1e-5
    )


def test_mesh_normalization_sum(problem):
    loss_fn, params, batch = problem
    mesh = make_mesh()
    sb = shard_batch(batch, mesh)
    n = batch[0].shape[0]
    op_sum = ShardedHessianOperator(
        loss_fn, params, sb, mesh, normalization="sum", batch_size=n
    )
    op_mean = ShardedHessianOperator(loss_fn, params, sb, mesh)
    v = jax.random.normal(jax.random.PRNGKey(7), (op_sum.dim,))
    np.testing.assert_allclose(
        np.asarray(op_sum(v)), n * np.asarray(op_mean(v)), rtol=1e-4, atol=1e-4
    )


def test_mesh_shapes():
    mesh = make_mesh(num_data=4, num_model=2)
    assert mesh.shape == {"data": 4, "model": 2}
    with pytest.raises(ValueError):
        make_mesh(num_data=16, num_model=1)
