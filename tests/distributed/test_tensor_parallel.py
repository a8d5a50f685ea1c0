"""Tensor-parallel parameter sharding tests on the simulated mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hessian_llm_vision_tpu.models import GPT2Config, GPT2LMHead, losses
from hessian_llm_vision_tpu.parallel import make_mesh
from hessian_llm_vision_tpu.parallel.param_sharding import (
    shard_params_for_tp,
    tp_spec_tree,
)


def _model(key):
    # dims divisible by 4 so the model axis really shards
    cfg = GPT2Config(vocab_size=256, n_positions=32, n_embd=32, n_layer=2, n_head=2)
    model = GPT2LMHead(cfg)
    params = model.init_params(key, seq_len=16)
    return cfg, model, params


def test_tp_specs_hit_expected_leaves(key):
    _, _, params = _model(key)
    specs = tp_spec_tree(params)
    flat = {
        "/".join(str(getattr(k, "key", k)) for k in path): s
        for path, s in jax.tree_util.tree_flatten_with_path(specs)[0]
    }
    assert flat["h_0/attn/c_attn/kernel"] == jax.sharding.PartitionSpec(None, "model")
    assert flat["h_0/attn/c_proj/kernel"] == jax.sharding.PartitionSpec("model", None)
    assert flat["wte"] == jax.sharding.PartitionSpec("model", None)
    assert flat["ln_f/scale"] == jax.sharding.PartitionSpec()


def test_tp_forward_and_grad_match_replicated(key):
    cfg, model, params = _model(key)
    mesh = make_mesh(num_data=2, num_model=4)
    tp_params = shard_params_for_tp(params, mesh)
    # sharded leaves really are distributed
    k = tp_params["h_0"]["attn"]["c_attn"]["kernel"]
    assert not k.sharding.is_fully_replicated

    loss_fn = losses.lm_loss_fn(model)
    ids = jax.random.randint(key, (4, 16), 0, cfg.vocab_size)
    batch = {"input_ids": ids}

    l_rep, g_rep = jax.value_and_grad(loss_fn)(params, batch)
    l_tp, g_tp = jax.jit(jax.value_and_grad(loss_fn))(tp_params, batch)
    np.testing.assert_allclose(float(l_tp), float(l_rep), rtol=1e-5)
    for a, b in zip(
        jax.tree_util.tree_leaves(g_tp), jax.tree_util.tree_leaves(g_rep)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-5)


def test_tp_hvp_matches_replicated(key):
    cfg, model, params = _model(key)
    mesh = make_mesh(num_data=1, num_model=8)
    tp_params = shard_params_for_tp(params, mesh)
    from hessian_llm_vision_tpu.curvature import HessianOperator

    loss_fn = losses.lm_loss_fn(model)
    ids = jax.random.randint(key, (2, 16), 0, cfg.vocab_size)
    batch = {"input_ids": ids}
    op_rep = HessianOperator(loss_fn, params, batch)
    op_tp = HessianOperator(loss_fn, tp_params, batch)
    v = jax.random.normal(jax.random.fold_in(key, 1), (op_rep.dim,))
    np.testing.assert_allclose(
        np.asarray(op_tp(v)), np.asarray(op_rep(v)), atol=5e-4
    )


def _llama(key):
    from hessian_llm_vision_tpu.models.llama import LlamaConfig, LlamaLMHead

    # dims divisible by 8 so the model axis really shards; GQA (2 kv heads
    # per 4 q heads) exercises the smaller k/v fan-out under the same rule
    cfg = LlamaConfig(
        vocab_size=256, hidden_size=32, intermediate_size=64, num_layers=2,
        num_heads=4, num_kv_heads=2, max_position_embeddings=32,
    )
    model = LlamaLMHead(cfg)
    params = model.init_params(key, seq_len=16)
    return cfg, model, params


def test_tp_specs_hit_llama_leaves(key):
    _, _, params = _llama(key)
    specs = tp_spec_tree(params)
    flat = {
        "/".join(str(getattr(k, "key", k)) for k in path): s
        for path, s in jax.tree_util.tree_flatten_with_path(specs)[0]
    }
    P = jax.sharding.PartitionSpec
    assert flat["layer_0/self_attn/q_proj/kernel"] == P(None, "model")
    assert flat["layer_0/self_attn/k_proj/kernel"] == P(None, "model")
    assert flat["layer_0/self_attn/o_proj/kernel"] == P("model", None)
    assert flat["layer_0/mlp/gate_proj/kernel"] == P(None, "model")
    assert flat["layer_0/mlp/down_proj/kernel"] == P("model", None)
    assert flat["embed_tokens"] == P("model", None)
    assert flat["lm_head/kernel"] == P(None, "model")
    assert flat["layer_0/input_layernorm/scale"] == P()


@pytest.mark.slow
def test_tp_llama_grad_and_hvp_match_replicated(key):
    cfg, model, params = _llama(key)
    mesh = make_mesh(num_data=2, num_model=4)
    tp_params = shard_params_for_tp(params, mesh)
    assert not tp_params["layer_0"]["mlp"]["gate_proj"][
        "kernel"
    ].sharding.is_fully_replicated

    loss_fn = losses.lm_loss_fn(model)
    ids = jax.random.randint(key, (4, 16), 0, cfg.vocab_size)
    batch = {"input_ids": ids}
    l_rep, g_rep = jax.value_and_grad(loss_fn)(params, batch)
    l_tp, g_tp = jax.jit(jax.value_and_grad(loss_fn))(tp_params, batch)
    np.testing.assert_allclose(float(l_tp), float(l_rep), rtol=1e-5)
    for a, b in zip(
        jax.tree_util.tree_leaves(g_tp), jax.tree_util.tree_leaves(g_rep)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-5)

    from hessian_llm_vision_tpu.curvature import HessianOperator

    op_rep = HessianOperator(loss_fn, params, batch)
    op_tp = HessianOperator(loss_fn, tp_params, batch)
    v = jax.random.normal(jax.random.fold_in(key, 1), (op_rep.dim,))
    np.testing.assert_allclose(
        np.asarray(op_tp(v)), np.asarray(op_rep(v)), atol=5e-4
    )
