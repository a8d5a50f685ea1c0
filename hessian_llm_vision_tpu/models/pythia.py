"""Pythia (GPT-NeoX architecture), TPU-first flax implementation.

Capability parity with the reference's ``AutoModelForCausalLM`` Pythia
70M / 160M ("pythia14") / 1.4B loads from offline dirs
(/root/reference/diego_pythia.py:25-27, diego_pythia_massive.py,
marc_pythia.py).  NeoX specifics implemented natively: rotary position
embeddings on a fraction of head dims (rotary_pct=0.25 for Pythia),
*parallel* attention+MLP residual (x + attn(ln1 x) + mlp(ln2 x)), untied
embeddings, no biasless LNs.
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
class NeoXConfig:
    vocab_size: int = 50304
    max_position_embeddings: int = 2048
    hidden_size: int = 512
    num_layers: int = 6
    num_heads: int = 8
    rotary_pct: float = 0.25
    rotary_emb_base: int = 10000
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

    @staticmethod
    def tiny(**overrides) -> "NeoXConfig":
        base = NeoXConfig(
            vocab_size=256,
            max_position_embeddings=64,
            hidden_size=32,
            num_layers=2,
            num_heads=2,
        )
        return dataclasses.replace(base, **overrides)


#: The Pythia scales the reference runs (diego_pythia{,_tiny,_massive}.py),
#: plus 410m — the intermediate EleutherAI scale, useful as the largest
#: model that fits a single-chip f32 T-only Lanczos when 1.4B does not.
PYTHIA_CONFIGS = {
    "pythia-70m": NeoXConfig(hidden_size=512, num_layers=6, num_heads=8),
    "pythia-160m": NeoXConfig(hidden_size=768, num_layers=12, num_heads=12),
    "pythia-410m": NeoXConfig(hidden_size=1024, num_layers=24, num_heads=16),
    "pythia-1.4b": NeoXConfig(hidden_size=2048, num_layers=24, num_heads=16),
}


def _rotary(q, k, base: int, rot_dim: int):
    """Apply rotary embeddings to the first ``rot_dim`` dims of q/k.

    q, k: (B, T, H, D).
    """
    B, T, H, D = q.shape
    inv_freq = 1.0 / (
        base ** (jnp.arange(0, rot_dim, 2, dtype=jnp.float32) / rot_dim)
    )
    t = jnp.arange(T, dtype=jnp.float32)
    freqs = jnp.outer(t, inv_freq)  # (T, rot_dim/2)
    emb = jnp.concatenate([freqs, freqs], axis=-1)  # (T, rot_dim)
    cos = jnp.cos(emb)[None, :, None, :]
    sin = jnp.sin(emb)[None, :, None, :]

    def rot(x):
        x_rot, x_pass = x[..., :rot_dim], x[..., rot_dim:]
        half = rot_dim // 2
        x1, x2 = x_rot[..., :half], x_rot[..., half:]
        rotated = jnp.concatenate([-x2, x1], axis=-1)
        x_rot = x_rot * cos.astype(x.dtype) + rotated * sin.astype(x.dtype)
        return jnp.concatenate([x_rot, x_pass], axis=-1)

    return rot(q), rot(k)


class NeoXAttention(nn.Module):
    config: NeoXConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        B, T, C = x.shape
        qkv = nn.Dense(3 * C, dtype=cfg.dtype, name="query_key_value")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(t):
            return t.reshape(B, T, cfg.num_heads, cfg.head_dim)

        q, k, v = heads(q), heads(k), heads(v)
        rot_dim = int(cfg.head_dim * cfg.rotary_pct)
        if rot_dim > 0:
            q, k = _rotary(q, k, cfg.rotary_emb_base, rot_dim)
        y = causal_attention(
            q, k, v, block_q=cfg.attn_block_q, remat=cfg.attn_remat,
            unroll=cfg.attn_unroll
        ).reshape(B, T, C)
        return nn.Dense(C, dtype=cfg.dtype, name="dense")(y)


class NeoXMLP(nn.Module):
    config: NeoXConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        h = nn.Dense(4 * cfg.hidden_size, dtype=cfg.dtype, name="dense_h_to_4h")(x)
        h = nn.gelu(h, approximate=True)
        return nn.Dense(cfg.hidden_size, dtype=cfg.dtype, name="dense_4h_to_h")(h)


class NeoXBlock(nn.Module):
    """Parallel-residual NeoX block: x + attn(ln1 x) + mlp(ln2 x)."""

    config: NeoXConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        attn_out = NeoXAttention(cfg, name="attention")(
            nn.LayerNorm(epsilon=1e-5, dtype=cfg.dtype, name="input_layernorm")(x)
        )
        mlp_out = NeoXMLP(cfg, name="mlp")(
            nn.LayerNorm(epsilon=1e-5, dtype=cfg.dtype, name="post_attention_layernorm")(x)
        )
        return x + attn_out + mlp_out


class NeoXLMHead(nn.Module):
    config: NeoXConfig

    @nn.compact
    def __call__(self, input_ids, return_hidden=False):
        cfg = self.config
        emb = self.param(
            "embed_in",
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
                x = NeoXBlock(cfg, name=f"layer_{i}")(x)
            x = maybe_constrain(x, cfg.seq_sharding)
        x = nn.LayerNorm(epsilon=1e-5, dtype=cfg.dtype, name="final_layer_norm")(x)
        if return_hidden:
            return x
        logits = nn.Dense(
            cfg.vocab_size, use_bias=False, dtype=cfg.dtype, name="embed_out"
        )(x)
        return logits.astype(jnp.float32)

    def output_kernel(self, params):
        """(C, V) output-projection matrix: ``logits = hidden @ kernel``."""
        return params["embed_out"]["kernel"]

    def init_params(self, rng, batch_size: int = 1, seq_len: int | None = None):
        T = seq_len or min(self.config.max_position_embeddings, 16)
        dummy = jnp.zeros((batch_size, T), jnp.int32)
        return self.init(rng, dummy)["params"]
