"""GPT-2 decoder, TPU-first flax implementation.

Capability parity with the reference's HF ``GPT2LMHeadModel`` usage — from
scratch configs ``GPT2Config(vocab_size=len(tokenizer), n_positions=32/512)``
(/root/reference/gpt2.py:56-57, gpt2_hessian.py:131-132) and the pretrained
'gpt2'/'distilgpt2' checkpoints (ipynbs/cola-gpt2.ipynb cell 0).

TPU-first choices (not a port of HF modeling_gpt2):
* all matmuls via einsum with ``preferred dtype`` control so the MXU runs
  bf16 with f32 accumulation; params stay f32 (curvature needs f32 masters);
* attention uses one fused einsum pair + causal mask under ``jnp.where`` —
  static shapes, no KV cache (this is a training/curvature framework);
* weight tying (wte == lm_head) as in GPT-2, implemented by reusing the
  embedding matrix in the output projection — halves P for the Hessian;
* no dropout by default: every curvature computation in the reference runs
  ``model.eval()`` (gpt2_hessian.py:73-75), and deterministic losses keep
  HVPs symmetric.
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp

from hessian_llm_vision_tpu.models.attention import causal_attention
from hessian_llm_vision_tpu.models.precision import (
    per_layer_precision,
    precision_scope,
)


def maybe_constrain(x, sharding):
    """Assert ``sharding`` on the residual stream (no-op when None).

    The constraint is differentiable and exact — grads/HVPs through it
    match the unconstrained model to reduction-order tolerance
    (tests/distributed/test_seq_parallel.py); it only tells XLA's SPMD
    partitioner where the (B, T, C) activations live between blocks."""
    if sharding is None:
        return x
    return jax.lax.with_sharding_constraint(x, sharding)


@dataclasses.dataclass(frozen=True)
class GPT2Config:
    vocab_size: int = 50257
    n_positions: int = 1024
    n_embd: int = 768
    n_layer: int = 12
    n_head: int = 12
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32  # compute dtype; params always f32
    tie_word_embeddings: bool = True
    # blockwise-attention query-block size (None = dense (B,H,T,T) path);
    # the memory-light curvature configuration — see models/attention.py
    attn_block_q: int | None = None
    attn_remat: bool = True
    attn_unroll: bool = False
    # matmul precision override for the transformer BLOCKS only (None =
    # inherit the caller's jax.default_matmul_precision).  The mixed
    # curvature mode sets the outer context to "high" (bf16x3) and this to
    # "default" (1 bf16 MXU pass): blocks carry ~71% of the HVP FLOPs but
    # their rounding error is damped by the residual stream + layernorms,
    # while the vocab-head matmul/log-softmax (the direct loss path) keeps
    # 3-pass precision.  See bench.py mixed-mode parity measurements.
    # Also accepts an n_layer tuple of per-block precisions — the
    # auto-precision DEPTH escalation surface (models/precision.py,
    # krylov/autoprec.py).  Measured on the trained-124M checkpoint:
    # depth-prefix escalation does NOT recover accuracy (errors stay
    # O(0.1-10) for every prefix < L), so the planner also probes the
    # OP-TYPE splits below.
    block_matmul_precision: str | tuple | None = None
    # Op-type matmul precision overrides WITHIN every block (None =
    # inherit the block context).  Innermost scope wins:
    # block -> attn/mlp -> attn scores.  attn_scores_precision covers the
    # two attention-core einsums (q·k scores and att·v), the cheapest
    # escalation (~5% of block FLOPs at seq512); attn_matmul_precision
    # covers the whole attention sublayer (qkv/proj Denses + core);
    # mlp_matmul_precision covers the MLP (or MoE) sublayer.
    attn_matmul_precision: str | None = None
    mlp_matmul_precision: str | None = None
    attn_scores_precision: str | None = None
    # mixture-of-experts MLP: 0 = dense MLP (GPT-2 proper); E > 0 replaces
    # every block's MLP with a softmax-gated dense MoE of E experts whose
    # stacked (E, ...) weights shard over an 'ep' mesh axis — see
    # models/moe.py (beyond-parity expert-parallel capability)
    n_experts: int = 0
    # top-k expert routing (0 = dense softmax gating, the curvature-exact
    # default).  k > 0 switches the MoE forward to capacity-based sparse
    # dispatch (models/moe.py::_topk_moe): O(k/E) of the dense expert
    # FLOPs, static shapes, 'ep'-sharded.  Routing indices are
    # piecewise-constant, so HVPs ignore routing curvature — keep dense
    # gating for spectra (documented caveat).
    moe_top_k: int = 0
    moe_capacity_factor: float = 1.25
    # sequence-parallel residual stream: a jax Sharding for the (B, T, C)
    # activations, asserted after the embedding and after every block so
    # XLA's partitioner keeps the norm/MLP/loss regions sharded along T
    # (gathering only where attention needs the full context).  Build via
    # parallel.seq_parallel.seq_sharding(mesh); the single-example
    # long-context memory lever where data parallelism cannot shard.
    seq_sharding: object | None = None

    @property
    def head_dim(self) -> int:
        return self.n_embd // self.n_head

    @staticmethod
    def gpt2_124m(**overrides) -> "GPT2Config":
        return dataclasses.replace(GPT2Config(), **overrides)

    @staticmethod
    def moe_80m(**overrides) -> "GPT2Config":
        """MoE capstone config: 384h/6L/6H, 8 experts per block
        (models/moe.py) — the expert-parallel family's at-scale workload
        (~80M params (79,787,184), MoE weights dominating)."""
        base = GPT2Config(
            n_embd=384, n_layer=6, n_head=6, n_positions=512, n_experts=8
        )
        return dataclasses.replace(base, **overrides)

    @staticmethod
    def tiny(**overrides) -> "GPT2Config":
        """Test-scale config (used across the test suite)."""
        base = GPT2Config(
            vocab_size=256, n_positions=64, n_embd=32, n_layer=2, n_head=2
        )
        return dataclasses.replace(base, **overrides)


class CausalSelfAttention(nn.Module):
    config: GPT2Config

    @nn.compact
    def __call__(self, x, deterministic=True):
        cfg = self.config
        B, T, C = x.shape
        qkv = nn.Dense(3 * C, dtype=cfg.dtype, name="c_attn")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(t):
            return t.reshape(B, T, cfg.n_head, cfg.head_dim)

        q, k, v = heads(q), heads(k), heads(v)
        with precision_scope(cfg.attn_scores_precision):
            y = causal_attention(
                q, k, v, block_q=cfg.attn_block_q, remat=cfg.attn_remat,
                unroll=cfg.attn_unroll
            ).reshape(B, T, C)
        y = nn.Dense(C, dtype=cfg.dtype, name="c_proj")(y)
        if cfg.dropout > 0:
            y = nn.Dropout(cfg.dropout)(y, deterministic=deterministic)
        return y


class MLPBlock(nn.Module):
    config: GPT2Config

    @nn.compact
    def __call__(self, x, deterministic=True):
        cfg = self.config
        h = nn.Dense(4 * cfg.n_embd, dtype=cfg.dtype, name="c_fc")(x)
        h = nn.gelu(h, approximate=True)
        h = nn.Dense(cfg.n_embd, dtype=cfg.dtype, name="c_proj")(h)
        if cfg.dropout > 0:
            h = nn.Dropout(cfg.dropout)(h, deterministic=deterministic)
        return h


class Block(nn.Module):
    config: GPT2Config

    @nn.compact
    def __call__(self, x, deterministic=True):
        cfg = self.config
        with precision_scope(cfg.attn_matmul_precision):
            x = x + CausalSelfAttention(cfg, name="attn")(
                nn.LayerNorm(epsilon=1e-5, dtype=cfg.dtype, name="ln_1")(x),
                deterministic,
            )
        with precision_scope(cfg.mlp_matmul_precision):
            if cfg.n_experts:
                from hessian_llm_vision_tpu.models.moe import MoEMLP

                x = x + MoEMLP(cfg, name="moe")(
                    nn.LayerNorm(epsilon=1e-5, dtype=cfg.dtype, name="ln_2")(x),
                    deterministic,
                )
            else:
                x = x + MLPBlock(cfg, name="mlp")(
                    nn.LayerNorm(epsilon=1e-5, dtype=cfg.dtype, name="ln_2")(x),
                    deterministic,
                )
        return x


class GPT2LMHead(nn.Module):
    """GPT-2 with LM head; returns logits (B, T, vocab)."""

    config: GPT2Config

    @nn.compact
    def __call__(self, input_ids, deterministic=True, return_hidden=False):
        cfg = self.config
        B, T = input_ids.shape
        wte = self.param(
            "wte",
            nn.initializers.normal(0.02),
            (cfg.vocab_size, cfg.n_embd),
            jnp.float32,
        )
        wpe = self.param(
            "wpe",
            nn.initializers.normal(0.01),
            (cfg.n_positions, cfg.n_embd),
            jnp.float32,
        )
        x = wte[input_ids].astype(cfg.dtype) + wpe[:T][None].astype(cfg.dtype)
        x = maybe_constrain(x, cfg.seq_sharding)
        per_prec = per_layer_precision(cfg.block_matmul_precision, cfg.n_layer)
        for i in range(cfg.n_layer):
            with precision_scope(per_prec[i]):
                x = Block(cfg, name=f"h_{i}")(x, deterministic)
            x = maybe_constrain(x, cfg.seq_sharding)
        x = nn.LayerNorm(epsilon=1e-5, dtype=cfg.dtype, name="ln_f")(x)
        if return_hidden:
            # final pre-logit hidden states; combine with output_kernel()
            # for the chunked-vocab loss (losses.chunked_causal_lm_loss)
            return x
        if cfg.tie_word_embeddings:
            logits = jnp.einsum("btc,vc->btv", x, wte.astype(cfg.dtype))
        else:
            logits = nn.Dense(cfg.vocab_size, use_bias=False, name="lm_head")(x)
        return logits.astype(jnp.float32)

    def output_kernel(self, params):
        """(C, V) output-projection matrix: ``logits = hidden @ kernel``."""
        if self.config.tie_word_embeddings:
            return params["wte"].T
        return params["lm_head"]["kernel"]

    def init_params(self, rng, batch_size: int = 1, seq_len: int | None = None):
        T = seq_len or min(self.config.n_positions, 16)
        dummy = jnp.zeros((batch_size, T), jnp.int32)
        return self.init(rng, dummy)["params"]


def num_params(config: GPT2Config) -> int:
    """Closed-form parameter count (sanity against 124M / the MoE config)."""
    c, v, p, l = config.n_embd, config.vocab_size, config.n_positions, config.n_layer
    attn = (3 * c * c + 3 * c) + (c * c + c)
    if config.n_experts:
        e, f = config.n_experts, 4 * c
        mlp = (c * e + e) + e * ((c * f + f) + (f * c + c))  # gate + experts
    else:
        mlp = (4 * c * c + 4 * c) + (4 * c * c + c)
    per_block = attn + mlp + 4 * c
    total = v * c + p * c + l * per_block + 2 * c
    if not config.tie_word_embeddings:
        total += v * c
    return total
