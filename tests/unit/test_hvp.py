"""HVP engine vs dense Hessian / finite differences (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np

from hessian_llm_vision_tpu.curvature import (
    hvp,
    HessianOperator,
    DatasetHessianOperator,
    LayerHessianOperator,
    BlockDiagonalOperator,
    GGNOperator,
)
from hessian_llm_vision_tpu.curvature.ggn import EmpiricalFisherOperator
from hessian_llm_vision_tpu.utils.flatten import Flattener
from hessian_llm_vision_tpu.utils import trees


def _mlp_params(key):
    k1, k2 = jax.random.split(key)
    return {
        "w1": jax.random.normal(k1, (3, 8)) * 0.5,
        "w2": jax.random.normal(k2, (8, 2)) * 0.5,
    }


def _loss(params, batch):
    x, y = batch
    h = jnp.tanh(x @ params["w1"])
    logits = h @ params["w2"]
    logp = jax.nn.log_softmax(logits)
    return -jnp.mean(jnp.sum(jax.nn.one_hot(y, 2) * logp, axis=-1))


def _batch(key, n=16):
    kx, ky = jax.random.split(key)
    x = jax.random.normal(kx, (n, 3))
    y = jax.random.randint(ky, (n,), 0, 2)
    return x, y


def _dense_hessian(loss, params, batch):
    fl = Flattener(params)

    def flat_loss(v):
        return loss(fl.unflatten(v), batch)

    return jax.hessian(flat_loss)(fl.flatten(params)), fl


def test_hvp_matches_dense(key):
    params = _mlp_params(key)
    batch = _batch(jax.random.fold_in(key, 1))
    H, fl = _dense_hessian(_loss, params, batch)
    v = jax.random.normal(jax.random.fold_in(key, 2), (fl.size,))
    out = hvp(_loss, params, batch, fl.unflatten(v))
    np.testing.assert_allclose(np.asarray(fl.flatten(out)), np.asarray(H @ v), atol=3e-3)


def test_operator_symmetry_and_normalization(key):
    params = _mlp_params(key)
    batch = _batch(jax.random.fold_in(key, 1), n=8)
    op_mean = HessianOperator(_loss, params, batch)
    op_sum = HessianOperator(
        _loss, params, batch, normalization="sum", batch_size=8
    )
    v = jax.random.normal(jax.random.fold_in(key, 3), (op_mean.dim,))
    u = jax.random.normal(jax.random.fold_in(key, 4), (op_mean.dim,))
    # symmetry <u, Hv> == <Hu, v>
    np.testing.assert_allclose(
        float(jnp.vdot(u, op_mean(v))), float(jnp.vdot(op_mean(u), v)), rtol=1e-3, atol=1e-5
    )
    # sum convention = 8 * mean convention (gpt2_hessian.py:88 semantics)
    np.testing.assert_allclose(
        np.asarray(op_sum(v)), 8 * np.asarray(op_mean(v)), rtol=1e-4, atol=1e-5
    )


def test_shifted_and_scaled_wrappers(key):
    """A+sigma*I / alpha*A wrappers: correct numerics, single cached
    program per call (not eager per-op dispatches — tunnel round trips),
    and the program-backed marker propagates (code-review r3)."""
    params = _mlp_params(key)
    batch = _batch(jax.random.fold_in(key, 1), n=8)
    op = HessianOperator(_loss, params, batch)
    v = jax.random.normal(jax.random.fold_in(key, 5), (op.dim,))
    hv = np.asarray(op(v))
    np.testing.assert_allclose(
        np.asarray(op.shifted(0.7)(v)), hv + 0.7 * np.asarray(v),
        rtol=1e-5, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(op.scaled(-2.0)(v)), -2.0 * hv, rtol=1e-5, atol=1e-6
    )
    # ensure_program must pass the wrappers through un-re-jitted
    assert getattr(op.shifted(0.7).matvec, "is_program_backed", False)
    assert getattr(op.scaled(2.0).matvec, "is_program_backed", False)
    # different shift values reuse ONE compiled axpy program (weak-typed
    # scalar arg): no per-sigma recompiles through the remote tunnel
    from hessian_llm_vision_tpu.curvature.operators import _shift_prog

    n0 = _shift_prog._cache_size()
    op.shifted(0.1)(v)
    op.shifted(0.2)(v)
    assert _shift_prog._cache_size() <= max(n0, 1)


def test_dataset_operator_equals_stacked_mean(key):
    params = _mlp_params(key)
    # 4 batches of 4 == one batch of 16 under dataset-mean normalization
    big = _batch(jax.random.fold_in(key, 1), n=16)
    batches = (big[0].reshape(4, 4, 3), big[1].reshape(4, 4))
    op_ds = DatasetHessianOperator(_loss, params, batches, remat=False)
    op_big = HessianOperator(_loss, params, big)
    v = jax.random.normal(jax.random.fold_in(key, 2), (op_ds.dim,))
    np.testing.assert_allclose(
        np.asarray(op_ds(v)), np.asarray(op_big(v)), rtol=1e-3, atol=1e-5
    )


def test_layer_operator_is_diagonal_block(key):
    params = _mlp_params(key)
    batch = _batch(jax.random.fold_in(key, 1))
    H, fl = _dense_hessian(_loss, params, batch)
    mask = trees.subtree_mask(params, lambda n: n == "w1")
    op = LayerHessianOperator(_loss, params, batch, mask)
    labels, spans = trees.partition_labels(params)
    off, size = spans[labels.index("w1")]
    proj = np.zeros((fl.size,))
    proj[off : off + size] = 1.0
    Hblock = H * proj[:, None] * proj[None, :]
    v = jax.random.normal(jax.random.fold_in(key, 2), (fl.size,))
    np.testing.assert_allclose(
        np.asarray(op(v)), np.asarray(Hblock @ v), atol=3e-3
    )


def test_block_diagonal_operator(key):
    params = _mlp_params(key)
    batch = _batch(jax.random.fold_in(key, 1))
    H, fl = _dense_hessian(_loss, params, batch)
    labels, spans = trees.partition_labels(params)
    Hbd = np.zeros_like(np.asarray(H))
    for off, size in spans:
        Hbd[off : off + size, off : off + size] = np.asarray(H)[
            off : off + size, off : off + size
        ]
    op = BlockDiagonalOperator(_loss, params, batch)
    v = jax.random.normal(jax.random.fold_in(key, 2), (fl.size,))
    np.testing.assert_allclose(np.asarray(op(v)), Hbd @ np.asarray(v), atol=3e-3)


def test_ggn_psd_and_symmetric(key):
    params = _mlp_params(key)
    batch = _batch(jax.random.fold_in(key, 1))

    def model_fn(p, b):
        x, _ = b
        return jnp.tanh(x @ p["w1"]) @ p["w2"]

    def out_loss(logits, b):
        _, y = b
        logp = jax.nn.log_softmax(logits)
        return -jnp.mean(jnp.sum(jax.nn.one_hot(y, 2) * logp, axis=-1))

    op = GGNOperator(model_fn, out_loss, params, batch)
    v = jax.random.normal(jax.random.fold_in(key, 2), (op.dim,))
    u = jax.random.normal(jax.random.fold_in(key, 3), (op.dim,))
    assert float(jnp.vdot(v, op(v))) >= -1e-5  # PSD
    np.testing.assert_allclose(
        float(jnp.vdot(u, op(v))), float(jnp.vdot(op(u), v)), rtol=1e-3, atol=1e-5
    )


def test_empirical_fisher(key):
    params = _mlp_params(key)
    batch = _batch(jax.random.fold_in(key, 1), n=4)

    def per_ex_loss(p, ex):
        x, y = ex
        h = jnp.tanh(x[None] @ p["w1"])
        logits = h @ p["w2"]
        logp = jax.nn.log_softmax(logits)
        return -jnp.sum(jax.nn.one_hot(y, 2) * logp)

    fl = Flattener(params)
    grads = np.stack(
        [
            np.asarray(fl.flatten(jax.grad(per_ex_loss)(params, (batch[0][i], batch[1][i]))))
            for i in range(4)
        ]
    )
    F = grads.T @ grads / 4
    op = EmpiricalFisherOperator(per_ex_loss, params, batch)
    v = jax.random.normal(jax.random.fold_in(key, 2), (op.dim,))
    np.testing.assert_allclose(np.asarray(op(v)), F @ np.asarray(v), atol=3e-3)


def test_empirical_fisher_chunked_and_unmaterialized(key):
    """chunk_size / materialize=False / bf16-G variants all match the
    dense empirical Fisher."""
    from hessian_llm_vision_tpu.curvature.ggn import EmpiricalFisherOperator
    from hessian_llm_vision_tpu.models import SpiralMLP, losses
    from hessian_llm_vision_tpu.data import make_spirals
    from hessian_llm_vision_tpu.utils.flatten import Flattener

    x, y = make_spirals(30, seed=3)
    model = SpiralMLP(width=6, depth=1)
    params = model.init(key, x[:4])["params"]
    fl = Flattener(params)

    def per_ex_loss(p, ex):
        xi, yi = ex
        logits = model.apply({"params": p}, xi[None])
        return losses.softmax_cross_entropy(logits, yi[None])

    batch = (jnp.asarray(x), jnp.asarray(y))
    n = 30
    # dense reference: (1/n) sum g_i g_i^T v
    G = jax.vmap(lambda e: fl.flatten(jax.grad(per_ex_loss)(params, e)))(batch)
    v = jax.random.normal(jax.random.PRNGKey(5), (fl.size,), jnp.float32)
    expected = np.asarray(G, np.float64).T @ (np.asarray(G, np.float64) @ np.asarray(v, np.float64)) / n

    base = EmpiricalFisherOperator(per_ex_loss, params, batch)
    np.testing.assert_allclose(np.asarray(base.matvec(v)), expected, rtol=2e-4, atol=1e-6)

    chunked = EmpiricalFisherOperator(per_ex_loss, params, batch, chunk_size=7)
    np.testing.assert_allclose(np.asarray(chunked.matvec(v)), expected, rtol=2e-4, atol=1e-6)

    lazy = EmpiricalFisherOperator(
        per_ex_loss, params, batch, chunk_size=7, materialize=False
    )
    np.testing.assert_allclose(np.asarray(lazy.matvec(v)), expected, rtol=2e-4, atol=1e-6)

    bf16 = EmpiricalFisherOperator(
        per_ex_loss, params, batch, grad_dtype=jnp.bfloat16
    )
    rel = np.linalg.norm(np.asarray(bf16.matvec(v)) - expected) / np.linalg.norm(expected)
    assert rel < 2e-2  # bf16-squared G
