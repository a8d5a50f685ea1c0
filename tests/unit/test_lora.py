"""LoRA adapter tests: identity at init, trainability, adapter-subspace
Hessian through the standard curvature stack."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import optax

from hessian_llm_vision_tpu.models import GPT2Config, GPT2LMHead, losses
from hessian_llm_vision_tpu.models.lora import (
    lora_init,
    lora_loss_fn,
    merge_lora,
)


def _setup(key):
    cfg = GPT2Config.tiny()
    model = GPT2LMHead(cfg)
    params = model.init_params(key, seq_len=16)
    ids = jax.random.randint(key, (2, 16), 0, cfg.vocab_size)
    return cfg, model, params, {"input_ids": ids}


def test_lora_identity_at_init(key):
    cfg, model, params, batch = _setup(key)
    adapters = lora_init(params, rank=4, key=jax.random.fold_in(key, 1))
    merged = merge_lora(params, adapters)
    base_logits = model.apply({"params": params}, batch["input_ids"])
    lora_logits = model.apply({"params": merged}, batch["input_ids"])
    np.testing.assert_allclose(
        np.asarray(lora_logits), np.asarray(base_logits), atol=1e-6
    )


def test_lora_training_moves_only_adapters(key):
    cfg, model, params, batch = _setup(key)
    adapters = lora_init(params, rank=2, key=jax.random.fold_in(key, 1))
    loss = lora_loss_fn(losses.lm_loss_fn(model), params)
    tx = optax.adam(1e-2)
    st = tx.init(adapters)
    l0 = float(loss(adapters, batch))

    @jax.jit
    def step(ad, st):
        l, g = jax.value_and_grad(loss)(ad, batch)
        u, st = tx.update(g, st)
        return optax.apply_updates(ad, u), st, l

    for _ in range(20):
        adapters, st, l = step(adapters, st)
    assert float(l) < l0
    # base params untouched by construction (frozen closure)


@pytest.mark.slow
def test_lora_hessian_operator(key):
    from hessian_llm_vision_tpu.curvature import HessianOperator
    from hessian_llm_vision_tpu.krylov import lanczos, ritz_decomposition

    cfg, model, params, batch = _setup(key)
    adapters = lora_init(
        params, rank=2, key=jax.random.fold_in(key, 1),
        targets=r".*c_attn/kernel$",
    )
    loss = lora_loss_fn(losses.lm_loss_fn(model), params)
    op = HessianOperator(loss, adapters, batch)
    assert op.dim < 2000  # adapter subspace is tiny
    res = lanczos(op.matvec, op.dim, 10, key=jax.random.fold_in(key, 2), reorth=True)
    spec = ritz_decomposition(res)
    assert np.isfinite(np.asarray(spec.eigvals)).all()
    # symmetry of the restricted Hessian
    v = jax.random.normal(jax.random.fold_in(key, 3), (op.dim,))
    u = jax.random.normal(jax.random.fold_in(key, 4), (op.dim,))
    np.testing.assert_allclose(
        float(jnp.vdot(u, op(v))), float(jnp.vdot(op(u), v)), rtol=5e-3, atol=1e-5
    )


@pytest.mark.slow
def test_lanczos_sgd_on_lora_adapters(key):
    """Spectrum-aware LoRA training: the full LanczosSGD step runs on the
    adapter subspace (the headline composition claim)."""
    from hessian_llm_vision_tpu.optim import LanczosSGDConfig, make_lanczos_sgd_step

    cfg, model, params, batch = _setup(key)
    adapters = lora_init(params, rank=2, key=jax.random.fold_in(key, 1),
                         targets=r".*c_attn/kernel$")
    loss = lora_loss_fn(losses.lm_loss_fn(model), params)
    ocfg = LanczosSGDConfig(k=4, delta=1e-4, lr=1e-3, momentum=0.9,
                            normalization="sum")
    init_fn, step_fn = make_lanczos_sgd_step(loss, adapters, ocfg, batch_size=2)
    state = init_fn(adapters)
    losses_seen = []
    step = jax.jit(step_fn)
    for _ in range(5):
        state, m = step(state, batch)
        losses_seen.append(float(m["loss"]))
    assert np.isfinite(losses_seen).all()
    assert np.isfinite(float(m["eig_max"]))
