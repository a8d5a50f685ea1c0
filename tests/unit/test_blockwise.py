"""Parity: blockwise attention / chunked-vocab loss vs the dense paths.

The memory-light curvature configuration (models/attention.py scan over
query blocks + losses.chunked_causal_lm_loss scan over vocab-projection
chunks) must be numerically identical (<=1e-5) to the dense paths in
logits, loss, gradient AND HVP — the dense paths produced every round-1/2
artifact, so equality here carries the torch-parity chain
(tests/parity/test_torch_hvp_parity.py) over to the blockwise programs.
Reference role of the dense path being replaced: the hot loop at
/root/reference/gpt2_hessian.py:83-89.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hessian_llm_vision_tpu.curvature.hvp import hvp
from hessian_llm_vision_tpu.models import (
    GPT2Config,
    GPT2LMHead,
    LlamaConfig,
    LlamaLMHead,
    NeoXConfig,
    NeoXLMHead,
    causal_attention,
    losses,
)
from hessian_llm_vision_tpu.utils.flatten import Flattener

B, T = 2, 64


def _batch(vocab, seed=0, masked=True):
    rng = np.random.RandomState(seed)
    ids = rng.randint(0, vocab, size=(B, T)).astype(np.int32)
    batch = {"input_ids": jnp.asarray(ids)}
    if masked:
        mask = np.ones((B, T), np.int32)
        mask[0, T // 2 :] = 0  # one padded sequence
        batch["attention_mask"] = jnp.asarray(mask)
    return batch


def _tree_close(a, b, tol):
    fa = Flattener(a).flatten(a)
    fb = Flattener(b).flatten(b)
    np.testing.assert_allclose(np.asarray(fa), np.asarray(fb), atol=tol, rtol=tol)


def _hvp_close(a, b, rel=1e-5):
    """Norm-relative HVP comparison: different f32 summation orders leave
    a handful of ~1e-4 elementwise outliers; the vector-level error is the
    meaningful parity measure and must stay <=1e-5."""
    fa = np.asarray(Flattener(a).flatten(a))
    fb = np.asarray(Flattener(b).flatten(b))
    denom = max(np.linalg.norm(fa), 1e-30)
    assert np.linalg.norm(fa - fb) / denom <= rel
    np.testing.assert_allclose(fa, fb, atol=1e-3, rtol=1e-3)


def test_causal_attention_block_vs_dense():
    key = jax.random.PRNGKey(0)
    q, k, v = jax.random.normal(key, (3, B, T, 4, 8), jnp.float32)
    dense = causal_attention(q, k, v, block_q=None)
    for blk in (8, 16, 32, 64):
        block = causal_attention(q, k, v, block_q=blk)
        np.testing.assert_allclose(
            np.asarray(dense), np.asarray(block), atol=1e-5, rtol=1e-5
        )
    # grad parity through the scan/remat machinery
    f_dense = lambda q: causal_attention(q, k, v).sum()
    f_block = lambda q: causal_attention(q, k, v, block_q=16).sum()
    gd, gb = jax.grad(f_dense)(q), jax.grad(f_block)(q)
    np.testing.assert_allclose(np.asarray(gd), np.asarray(gb), atol=1e-5, rtol=1e-5)


def test_causal_attention_oversized_block_is_dense():
    """block_q >= T is the documented dense single-block path; a block
    that does not divide T is now an ERROR (see
    test_block_q_must_divide_seq_len) instead of the old silent dense
    fallback, which defeated the memory plan at OOM scales."""
    q, k, v = jax.random.normal(jax.random.PRNGKey(1), (3, B, 60, 2, 8))
    out = causal_attention(q, k, v, block_q=64)  # 64 >= 60 -> dense
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(causal_attention(q, k, v)), atol=0, rtol=0
    )


MODEL_CASES = [
    ("gpt2", lambda blk: GPT2LMHead(GPT2Config.tiny(attn_block_q=blk))),
    ("gpt2-untied", lambda blk: GPT2LMHead(
        GPT2Config.tiny(attn_block_q=blk, tie_word_embeddings=False))),
    ("neox", lambda blk: NeoXLMHead(NeoXConfig.tiny(attn_block_q=blk))),
    ("llama", lambda blk: LlamaLMHead(LlamaConfig.tiny(attn_block_q=blk))),
]


@pytest.mark.parametrize("name,make", MODEL_CASES, ids=[c[0] for c in MODEL_CASES])
@pytest.mark.slow
def test_blockwise_model_logits_grad_hvp_parity(name, make):
    dense_model, block_model = make(None), make(16)
    params = dense_model.init_params(jax.random.PRNGKey(0), seq_len=T)
    batch = _batch(dense_model.config.vocab_size)

    ld = dense_model.apply({"params": params}, batch["input_ids"])
    lb = block_model.apply({"params": params}, batch["input_ids"])
    np.testing.assert_allclose(np.asarray(ld), np.asarray(lb), atol=1e-5, rtol=1e-5)

    loss_d = losses.lm_loss_fn(dense_model)
    loss_b = losses.lm_loss_fn(block_model)
    gd = jax.grad(loss_d)(params, batch)
    gb = jax.grad(loss_b)(params, batch)
    _tree_close(gd, gb, 1e-5)

    fl = Flattener(params)
    vec = fl.unflatten(
        jax.random.normal(jax.random.PRNGKey(7), (fl.size,), jnp.float32)
    )
    hd = hvp(loss_d, params, batch, vec)
    hb = hvp(loss_b, params, batch, vec)
    _hvp_close(hd, hb)


@pytest.mark.parametrize("name,make", MODEL_CASES, ids=[c[0] for c in MODEL_CASES])
@pytest.mark.parametrize("include_padding", [False, True])
def test_chunked_loss_parity(name, make, include_padding):
    model = make(None)
    params = model.init_params(jax.random.PRNGKey(0), seq_len=T)
    batch = _batch(model.config.vocab_size)

    dense = losses.lm_loss_fn(model, include_padding=include_padding)
    for chunk in (16, 24, 63, 200):  # padded / uneven / clamped cases
        chunked = losses.lm_loss_fn(
            model, include_padding=include_padding, loss_chunk=chunk
        )
        np.testing.assert_allclose(
            float(dense(params, batch)),
            float(chunked(params, batch)),
            atol=1e-5,
            rtol=1e-5,
        )
    chunked = losses.lm_loss_fn(
        model, include_padding=include_padding, loss_chunk=16
    )
    _tree_close(jax.grad(dense)(params, batch), jax.grad(chunked)(params, batch), 1e-5)


def test_fully_chunked_hvp_parity():
    """The complete memory-light program (blockwise attn + chunked loss)
    HVP-matches the dense program — the configuration bench.py runs at
    124M bs16."""
    dense_model = GPT2LMHead(GPT2Config.tiny())
    light_model = GPT2LMHead(GPT2Config.tiny(attn_block_q=16))
    params = dense_model.init_params(jax.random.PRNGKey(0), seq_len=T)
    batch = _batch(dense_model.config.vocab_size, masked=False)

    loss_d = losses.lm_loss_fn(dense_model)
    loss_l = losses.lm_loss_fn(light_model, loss_chunk=16)
    np.testing.assert_allclose(
        float(loss_d(params, batch)), float(loss_l(params, batch)), atol=1e-5
    )
    fl = Flattener(params)
    vec = fl.unflatten(
        jax.random.normal(jax.random.PRNGKey(3), (fl.size,), jnp.float32)
    )
    hd = hvp(loss_d, params, batch, vec)
    hl = hvp(loss_l, params, batch, vec)
    _hvp_close(hd, hl)


@pytest.mark.slow
def test_blockwise_jit_and_donation_compatible():
    """The light program must jit cleanly (scan + remat under jvp-of-grad)."""
    model = GPT2LMHead(GPT2Config.tiny(attn_block_q=16))
    params = model.init_params(jax.random.PRNGKey(0), seq_len=T)
    batch = _batch(model.config.vocab_size, masked=False)
    loss = losses.lm_loss_fn(model, loss_chunk=16)
    fl = Flattener(params)

    @jax.jit
    def batch_hvp(v, params, ids):
        return fl.flatten(
            hvp(loss, params, {"input_ids": ids}, fl.unflatten(v))
        )

    v = jax.random.normal(jax.random.PRNGKey(1), (fl.size,), jnp.float32)
    out = batch_hvp(v, params, batch["input_ids"])
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.parametrize(
    "make",
    [
        lambda bp: GPT2LMHead(GPT2Config.tiny(block_matmul_precision=bp)),
        lambda bp: NeoXLMHead(NeoXConfig.tiny(block_matmul_precision=bp)),
        lambda bp: LlamaLMHead(LlamaConfig.tiny(block_matmul_precision=bp)),
    ],
    ids=["gpt2", "neox", "llama"],
)
def test_block_matmul_precision_plumbing(make):
    """The mixed curvature mode (blocks 'default', outer 'high') must trace
    through logits/grad/HVP.  On CPU every matmul precision lowers to f32,
    so the override is exactly value-preserving here — this pins the
    PLUMBING; the TPU-side accuracy/speed trade is measured by bench.py."""
    plain, mixed = make(None), make("default")
    params = plain.init_params(jax.random.PRNGKey(0), seq_len=T)
    batch = _batch(plain.config.vocab_size)

    with jax.default_matmul_precision("high"):
        lp = plain.apply({"params": params}, batch["input_ids"])
        lm = mixed.apply({"params": params}, batch["input_ids"])
    np.testing.assert_allclose(np.asarray(lp), np.asarray(lm), atol=1e-6)

    loss_p = losses.lm_loss_fn(plain)
    loss_m = losses.lm_loss_fn(mixed)
    fl = Flattener(params)
    vec = fl.unflatten(
        jax.random.normal(jax.random.PRNGKey(3), (fl.size,), jnp.float32)
    )
    hp = hvp(loss_p, params, batch, vec)
    hm = hvp(loss_m, params, batch, vec)
    _hvp_close(hp, hm, 1e-6)


def test_block_q_must_divide_seq_len(key):
    """A non-divisor block_q is an error, not a silent dense fallback
    (it would defeat the memory plan at exactly the scales that OOM)."""
    import pytest

    from hessian_llm_vision_tpu.models.attention import causal_attention

    q = jax.random.normal(key, (1, 12, 2, 4))
    with pytest.raises(ValueError, match="does not divide"):
        causal_attention(q, q, q, block_q=5)
    # block_q >= T stays the (documented) dense single-block path
    out = causal_attention(q, q, q, block_q=16)
    assert out.shape == q.shape


@pytest.mark.slow
def test_head_precision_plumbing():
    """head_precision (per-operand MXU precision on the vocab-head matmul,
    losses._head_precision_arg) must trace through loss/grad/HVP in every
    mode.  On CPU all precisions lower to f32, so each mode is exactly
    value-preserving — pins the plumbing; the TPU accuracy/speed trade is
    measured on-chip (.logs/head_prec_r3.log, bench.py)."""
    model = GPT2LMHead(GPT2Config.tiny())
    params = model.init_params(jax.random.PRNGKey(0), seq_len=T)
    batch = _batch(model.config.vocab_size)
    fl = Flattener(params)
    vec = fl.unflatten(
        jax.random.normal(jax.random.PRNGKey(3), (fl.size,), jnp.float32)
    )
    ref_loss = ref_hvp = None
    with jax.default_matmul_precision("high"):
        for mode in (None, "high", "act_high", "weight_high", "default"):
            lfn = losses.lm_loss_fn(model, loss_chunk=16, head_precision=mode)
            lo = lfn(params, batch)
            hv = hvp(lfn, params, batch, vec)
            if ref_loss is None:
                ref_loss, ref_hvp = lo, hv
            else:
                np.testing.assert_allclose(
                    np.asarray(lo), np.asarray(ref_loss), atol=1e-6
                )
                _hvp_close(hv, ref_hvp, 1e-6)
