"""LLaMA-family decoder, TPU-first flax implementation.

Capability parity with the reference's LLaMA loss-evaluation workload
(/root/reference/loss-llama.ipynb cell 0: ``AutoModelForCausalLM`` +
PEFT/LoRA; cells 6-8: per-batch loss sweep).  Architecture implemented
natively rather than wrapped: RMSNorm (no bias, no mean subtraction),
SwiGLU MLP (gate/up/down, SiLU), rotary position embeddings over the FULL
head dim, untied output head, bias-free linears, grouped-query attention
(``num_kv_heads < num_heads``) for the modern family members.

All matmuls run through flax Dense -> XLA dot_general (MXU); attention
logits accumulate f32.  Combine with ``models.lora.lorify`` for the
PEFT-style adapter workload and ``train.evaluation.per_batch_losses``
for the notebook's loss sweep.
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp

from hessian_llm_vision_tpu.models.gpt2 import maybe_constrain
from hessian_llm_vision_tpu.models.precision import (
    per_layer_precision,
    precision_scope,
)
from hessian_llm_vision_tpu.models.attention import causal_attention


@dataclasses.dataclass(frozen=True)
class LlamaConfig:
    vocab_size: int = 32000
    max_position_embeddings: int = 2048
    hidden_size: int = 4096
    intermediate_size: int = 11008
    num_layers: int = 32
    num_heads: int = 32
    num_kv_heads: int | None = None  # None -> MHA (= num_heads)
    rope_theta: float = 10000.0
    rms_eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32
    # blockwise-attention query-block size (None = dense); models/attention.py
    attn_block_q: int | None = None
    attn_remat: bool = True
    attn_unroll: bool = False
    # transformer-block matmul precision override (None = inherit); the
    # mixed curvature mode — see models/gpt2.py::GPT2Config
    block_matmul_precision: str | None = None
    # sequence-parallel residual-stream sharding (jax Sharding or None);
    # see models/gpt2.py::GPT2Config.seq_sharding
    seq_sharding: object | None = None

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    @property
    def kv_heads(self) -> int:
        return self.num_kv_heads or self.num_heads

    @staticmethod
    def tiny(**overrides) -> "LlamaConfig":
        base = LlamaConfig(
            vocab_size=256,
            max_position_embeddings=64,
            hidden_size=32,
            intermediate_size=96,
            num_layers=2,
            num_heads=4,
            num_kv_heads=2,
        )
        return dataclasses.replace(base, **overrides)


#: Named scales.  "llama-7b" matches the checkpoints the reference's
#: notebook evaluates; tiny/micro are for tests and CPU demos.
LLAMA_CONFIGS = {
    "llama-tiny": LlamaConfig.tiny(),
    "llama-micro": LlamaConfig(
        vocab_size=32000, hidden_size=256, intermediate_size=704,
        num_layers=4, num_heads=8, num_kv_heads=8,
        max_position_embeddings=512,
    ),
    # GPT-2-124M-class LLaMA (P = 134M: 2x32000x768 untied embeddings +
    # 12 layers of 4h^2 MHA + 3xh x 2048 SwiGLU) — the single-chip
    # at-scale spectrum workload for this family (artifacts/llama134m_r3)
    "llama-134m": LlamaConfig(
        vocab_size=32000, hidden_size=768, intermediate_size=2048,
        num_layers=12, num_heads=12, num_kv_heads=12,
        max_position_embeddings=512,
    ),
    "llama-7b": LlamaConfig(),  # 4096/11008/32L/32H MHA
}


class RMSNorm(nn.Module):
    eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (x.shape[-1],), jnp.float32)
        x32 = x.astype(jnp.float32)
        var = jnp.mean(x32 * x32, axis=-1, keepdims=True)
        normed = x32 * jax.lax.rsqrt(var + self.eps)
        return (normed * scale).astype(self.dtype)


def _rope_full(q, k, theta: float):
    """Rotary embeddings over the full head dim, HF rotate-half layout.

    q: (B, T, Hq, D), k: (B, T, Hk, D).
    """
    D = q.shape[-1]
    T = q.shape[1]
    inv_freq = 1.0 / (theta ** (jnp.arange(0, D, 2, dtype=jnp.float32) / D))
    freqs = jnp.outer(jnp.arange(T, dtype=jnp.float32), inv_freq)  # (T, D/2)
    emb = jnp.concatenate([freqs, freqs], axis=-1)  # (T, D)
    cos = jnp.cos(emb)[None, :, None, :]
    sin = jnp.sin(emb)[None, :, None, :]

    def rot(x):
        half = D // 2
        x1, x2 = x[..., :half], x[..., half:]
        rotated = jnp.concatenate([-x2, x1], axis=-1)
        return (x * cos.astype(x.dtype) + rotated * sin.astype(x.dtype))

    return rot(q), rot(k)


class LlamaAttention(nn.Module):
    config: LlamaConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        B, T, C = x.shape
        D, Hq, Hk = cfg.head_dim, cfg.num_heads, cfg.kv_heads
        dense = lambda n, name: nn.Dense(
            n, use_bias=False, dtype=cfg.dtype, name=name
        )
        q = dense(Hq * D, "q_proj")(x).reshape(B, T, Hq, D)
        k = dense(Hk * D, "k_proj")(x).reshape(B, T, Hk, D)
        v = dense(Hk * D, "v_proj")(x).reshape(B, T, Hk, D)
        q, k = _rope_full(q, k, cfg.rope_theta)
        if Hk != Hq:  # grouped-query: repeat kv heads across their group
            rep = Hq // Hk
            k = jnp.repeat(k, rep, axis=2)
            v = jnp.repeat(v, rep, axis=2)
        y = causal_attention(
            q, k, v, block_q=cfg.attn_block_q, remat=cfg.attn_remat,
            unroll=cfg.attn_unroll
        ).reshape(B, T, Hq * D)
        return dense(C, "o_proj")(y)


class LlamaMLP(nn.Module):
    """SwiGLU: down(silu(gate(x)) * up(x))."""

    config: LlamaConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        dense = lambda n, name: nn.Dense(
            n, use_bias=False, dtype=cfg.dtype, name=name
        )
        gate = dense(cfg.intermediate_size, "gate_proj")(x)
        up = dense(cfg.intermediate_size, "up_proj")(x)
        return dense(cfg.hidden_size, "down_proj")(nn.silu(gate) * up)


class LlamaBlock(nn.Module):
    """Sequential pre-norm residual (NOT NeoX-parallel):
    x += attn(rms1 x); x += mlp(rms2 x)."""

    config: LlamaConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        x = x + LlamaAttention(cfg, name="self_attn")(
            RMSNorm(cfg.rms_eps, cfg.dtype, name="input_layernorm")(x)
        )
        x = x + LlamaMLP(cfg, name="mlp")(
            RMSNorm(cfg.rms_eps, cfg.dtype, name="post_attention_layernorm")(x)
        )
        return x


class LlamaLMHead(nn.Module):
    config: LlamaConfig

    @nn.compact
    def __call__(self, input_ids, return_hidden=False):
        cfg = self.config
        emb = self.param(
            "embed_tokens",
            nn.initializers.normal(0.02),
            (cfg.vocab_size, cfg.hidden_size),
            jnp.float32,
        )
        x = emb[input_ids].astype(cfg.dtype)
        x = maybe_constrain(x, cfg.seq_sharding)
        per_prec = per_layer_precision(
            cfg.block_matmul_precision, cfg.num_layers
        )
        for i in range(cfg.num_layers):
            with precision_scope(per_prec[i]):
                x = LlamaBlock(cfg, name=f"layer_{i}")(x)
            x = maybe_constrain(x, cfg.seq_sharding)
        x = RMSNorm(cfg.rms_eps, cfg.dtype, name="norm")(x)
        if return_hidden:
            return x
        logits = nn.Dense(
            cfg.vocab_size, use_bias=False, dtype=cfg.dtype, name="lm_head"
        )(x)  # untied head
        return logits.astype(jnp.float32)

    def output_kernel(self, params):
        """(C, V) output-projection matrix: ``logits = hidden @ kernel``."""
        return params["lm_head"]["kernel"]

    def init_params(self, rng, batch_size: int = 1, seq_len: int | None = None):
        T = seq_len or min(self.config.max_position_embeddings, 16)
        dummy = jnp.zeros((batch_size, T), jnp.int32)
        return self.init(rng, dummy)["params"]
