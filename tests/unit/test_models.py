"""Model family smoke + parity-property tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hessian_llm_vision_tpu.models import (
    GPT2Config,
    GPT2LMHead,
    NeoXConfig,
    NeoXLMHead,
    PYTHIA_CONFIGS,
    SpiralMLP,
    SimpleNet,
    VGG16,
    ResNet50,
    losses,
)
from hessian_llm_vision_tpu.models.gpt2 import num_params
from hessian_llm_vision_tpu.utils.flatten import tree_size


def test_gpt2_124m_param_count():
    cfg = GPT2Config.gpt2_124m()
    # HF GPT-2 124M: 124,439,808 params (tied embeddings)
    assert num_params(cfg) == 124_439_808


def test_gpt2_tiny_forward_and_loss(key):
    cfg = GPT2Config.tiny()
    model = GPT2LMHead(cfg)
    params = model.init_params(key, batch_size=2, seq_len=16)
    assert tree_size(params) == num_params(cfg)
    ids = jax.random.randint(key, (2, 16), 0, cfg.vocab_size)
    logits = model.apply({"params": params}, ids)
    assert logits.shape == (2, 16, cfg.vocab_size)
    loss_fn = losses.lm_loss_fn(model)
    loss = loss_fn(params, {"input_ids": ids})
    assert np.isfinite(float(loss))
    # ~log(vocab) at init
    assert abs(float(loss) - np.log(cfg.vocab_size)) < 1.0


def test_gpt2_variable_seq_len(key):
    cfg = GPT2Config.tiny()
    model = GPT2LMHead(cfg)
    params = model.init_params(key, seq_len=16)
    for T in (8, 32):
        ids = jnp.zeros((1, T), jnp.int32)
        assert model.apply({"params": params}, ids).shape == (1, T, cfg.vocab_size)


def test_lm_loss_masking(key):
    cfg = GPT2Config.tiny()
    model = GPT2LMHead(cfg)
    params = model.init_params(key)
    ids = jax.random.randint(key, (2, 16), 0, cfg.vocab_size)
    full = losses.lm_loss_fn(model)(
        params, {"input_ids": ids, "attention_mask": jnp.ones_like(ids)}
    )
    nomask = losses.lm_loss_fn(model)(params, {"input_ids": ids})
    np.testing.assert_allclose(float(full), float(nomask), rtol=1e-6)
    # masking out half the tokens changes the loss
    half = jnp.concatenate(
        [jnp.ones((2, 8), jnp.int32), jnp.zeros((2, 8), jnp.int32)], axis=1
    )
    masked = losses.lm_loss_fn(model)(
        params, {"input_ids": ids, "attention_mask": half}
    )
    assert abs(float(masked) - float(nomask)) > 1e-6


@pytest.mark.slow
def test_pythia_configs_and_forward(key):
    assert PYTHIA_CONFIGS["pythia-70m"].hidden_size == 512
    assert PYTHIA_CONFIGS["pythia-1.4b"].num_layers == 24
    cfg = NeoXConfig.tiny()
    model = NeoXLMHead(cfg)
    params = model.init_params(key, seq_len=12)
    ids = jax.random.randint(key, (2, 12), 0, cfg.vocab_size)
    logits = model.apply({"params": params}, ids)
    assert logits.shape == (2, 12, cfg.vocab_size)
    assert np.isfinite(np.asarray(logits)).all()


def test_rotary_is_position_dependent(key):
    """Same token at different positions must get different logits (rotary)."""
    cfg = NeoXConfig.tiny()
    model = NeoXLMHead(cfg)
    params = model.init_params(key, seq_len=8)
    ids = jnp.full((1, 8), 5, jnp.int32)
    logits = model.apply({"params": params}, ids)
    assert not np.allclose(np.asarray(logits[0, 0]), np.asarray(logits[0, 4]))


def test_spiral_mlp_trains(key):
    from hessian_llm_vision_tpu.data import make_spirals

    x, y = make_spirals(300, seed=1)
    model = SpiralMLP(width=32, depth=2)
    params = model.init(key, x[:4])["params"]

    def loss_fn(p, b):
        xx, yy = b
        return losses.softmax_cross_entropy(model.apply({"params": p}, xx), yy)

    import optax

    opt = optax.sgd(1.0, momentum=0.9)
    opt_state = opt.init(params)

    @jax.jit
    def step(p, s, b):
        l, g = jax.value_and_grad(loss_fn)(p, b)
        u, s = opt.update(g, s)
        return optax.apply_updates(p, u), s, l

    l0 = float(loss_fn(params, (x, y)))
    for _ in range(200):
        params, opt_state, l = step(params, opt_state, (x, y))
    assert float(l) < l0 * 0.7


def test_simplenet_shapes(key):
    model = SimpleNet()
    x = jnp.zeros((4, 28, 28, 1))
    params = model.init(key, x)["params"]
    assert model.apply({"params": params}, x).shape == (4, 10)
    assert tree_size(params) == 784 * 100 + 100 + 100 * 10 + 10


def test_vgg16_forward(key):
    model = VGG16(classifier_width=64)  # slim classifier for test speed
    x = jnp.zeros((2, 32, 32, 3))
    params = model.init(key, x)["params"]
    out = model.apply({"params": params}, x)
    assert out.shape == (2, 10)


@pytest.mark.slow
def test_resnet50_bn_modes(key):
    model = ResNet50(stage_sizes=(1, 1, 1, 1))  # shallow for test speed
    x = jax.random.normal(key, (2, 32, 32, 3))
    variables = model.init(key, x, use_running_average=False)
    params, batch_stats = variables["params"], variables["batch_stats"]
    out_train, mutated = model.apply(
        {"params": params, "batch_stats": batch_stats},
        x,
        use_running_average=False,
        mutable=["batch_stats"],
    )
    out_eval = model.apply(
        {"params": params, "batch_stats": batch_stats}, x, use_running_average=True
    )
    assert out_train.shape == out_eval.shape == (2, 10)
    # bn_train_mode loss closure differs from eval-mode closure
    lf_train = losses.classification_loss_fn_bn(model, batch_stats, bn_train_mode=True)
    lf_eval = losses.classification_loss_fn_bn(model, batch_stats, bn_train_mode=False)
    y = jnp.zeros((2,), jnp.int32)
    assert abs(float(lf_train(params, (x, y))) - float(lf_eval(params, (x, y)))) > 1e-8


def test_hvp_through_gpt2_tiny(key):
    """End-to-end: curvature engine through a real transformer."""
    from hessian_llm_vision_tpu.curvature import HessianOperator

    cfg = GPT2Config.tiny()
    model = GPT2LMHead(cfg)
    params = model.init_params(key, seq_len=8)
    ids = jax.random.randint(key, (2, 8), 0, cfg.vocab_size)
    op = HessianOperator(losses.lm_loss_fn(model), params, {"input_ids": ids})
    v = jax.random.normal(jax.random.fold_in(key, 1), (op.dim,))
    u = jax.random.normal(jax.random.fold_in(key, 2), (op.dim,))
    hv = op(v)
    assert np.isfinite(np.asarray(hv)).all()
    np.testing.assert_allclose(
        float(jnp.vdot(u, hv)), float(jnp.vdot(op(u), v)), rtol=2e-2, atol=1e-4
    )


def test_causal_lm_loss_include_padding():
    """include_padding=True reproduces the reference/HF labels=input_ids
    convention (mean over ALL shifted positions, pads included)."""
    import jax
    import jax.numpy as jnp
    from hessian_llm_vision_tpu.models.losses import causal_lm_loss

    key = jax.random.PRNGKey(0)
    B, T, V = 2, 6, 11
    logits = jax.random.normal(key, (B, T, V))
    ids = jax.random.randint(jax.random.PRNGKey(1), (B, T), 0, V)
    mask = jnp.asarray([[1, 1, 1, 1, 0, 0], [1, 1, 1, 1, 1, 1]])

    unmasked = causal_lm_loss(logits, ids, mask, include_padding=True)
    no_mask = causal_lm_loss(logits, ids, None)
    np.testing.assert_allclose(float(unmasked), float(no_mask), rtol=1e-6)

    masked = causal_lm_loss(logits, ids, mask)
    assert abs(float(masked) - float(unmasked)) > 1e-6  # they genuinely differ
    # manual all-positions mean
    logp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32))
    tll = jnp.take_along_axis(logp, ids[:, 1:][..., None], -1).squeeze(-1)
    np.testing.assert_allclose(float(unmasked), float(-tll.mean()), rtol=1e-6)


def test_llama_134m_param_count(key):
    """llama-134m is the GPT-2-124M-class LLaMA: 2x32000x768 untied
    embeddings + 12 layers of (4*768^2 MHA + 3*768*2048 SwiGLU + 2 RMSNorm)
    + final norm = 134,105,856 params (the at-scale spectrum workload for
    this family, artifacts/llama134m_r3)."""
    from hessian_llm_vision_tpu.models.llama import LLAMA_CONFIGS, LlamaLMHead

    cfg = LLAMA_CONFIGS["llama-134m"]
    # eval_shape: count without materializing 134M params on the test CPU
    params = jax.eval_shape(
        lambda k: LlamaLMHead(cfg).init_params(k, seq_len=8), key
    )
    expected = (
        2 * cfg.vocab_size * cfg.hidden_size
        + cfg.num_layers
        * (
            4 * cfg.hidden_size**2
            + 3 * cfg.hidden_size * cfg.intermediate_size
            + 2 * cfg.hidden_size
        )
        + cfg.hidden_size
    )
    assert expected == 134_105_856
    assert tree_size(params) == expected
