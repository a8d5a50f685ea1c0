"""Torch/HF checkpoint -> flax parameter converters.

Migration path for the reference's artifacts: its GPT-2 state_dicts
(``model_trained.pt`` etc, /root/reference/gpt2.py:68,87) and offline HF
Pythia checkpoints (/root/reference/diego_pythia.py:25-27) load into this
framework's models through these converters, so existing checkpoints keep
their spectra comparable.

HF GPT-2 stores its Dense kernels as Conv1D with weight shape
(in, out) — NOT transposed like nn.Linear — which matches flax's
``Dense.kernel`` convention directly; NeoX uses nn.Linear (out, in), which
must transpose.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np


def _np(t):
    return t.detach().cpu().numpy() if hasattr(t, "detach") else np.asarray(t)


def gpt2_from_torch_state_dict(sd: Dict[str, Any], config) -> Dict[str, Any]:
    """HF GPT2LMHeadModel state_dict -> GPT2LMHead params pytree.

    Accepts both prefixed (``transformer.h.0...``) and bare (``h.0...``)
    key styles, and the DataParallel ``module.`` prefix already stripped by
    ``io.checkpoints.load_torch_state_dict``.
    """
    sd = {k.removeprefix("module."): v for k, v in sd.items()}
    if any(k.startswith("transformer.") for k in sd):
        sd = {
            k.removeprefix("transformer."): v
            for k, v in sd.items()
            if k != "lm_head.weight"
        }

    def g(key):
        return _np(sd[key]).astype(np.float32)

    params: Dict[str, Any] = {
        "wte": g("wte.weight"),
        "wpe": g("wpe.weight"),
        "ln_f": {"scale": g("ln_f.weight"), "bias": g("ln_f.bias")},
    }
    for i in range(config.n_layer):
        p = f"h.{i}."
        params[f"h_{i}"] = {
            "ln_1": {"scale": g(p + "ln_1.weight"), "bias": g(p + "ln_1.bias")},
            "ln_2": {"scale": g(p + "ln_2.weight"), "bias": g(p + "ln_2.bias")},
            "attn": {
                # HF Conv1D weight is (in, out) == flax Dense kernel layout
                "c_attn": {
                    "kernel": g(p + "attn.c_attn.weight"),
                    "bias": g(p + "attn.c_attn.bias"),
                },
                "c_proj": {
                    "kernel": g(p + "attn.c_proj.weight"),
                    "bias": g(p + "attn.c_proj.bias"),
                },
            },
            "mlp": {
                "c_fc": {
                    "kernel": g(p + "mlp.c_fc.weight"),
                    "bias": g(p + "mlp.c_fc.bias"),
                },
                "c_proj": {
                    "kernel": g(p + "mlp.c_proj.weight"),
                    "bias": g(p + "mlp.c_proj.bias"),
                },
            },
        }
    return params  # numpy leaves; flax.apply accepts them directly


def gpt2_from_pretrained(name_or_path: str, config=None):
    """Load an HF GPT-2 (e.g. 'gpt2', 'distilgpt2', or a local dir) into
    (GPT2Config, params).  Requires the HF cache/local files (zero-egress)."""
    from transformers import GPT2LMHeadModel

    from hessian_llm_vision_tpu.models.gpt2 import GPT2Config

    hf = GPT2LMHeadModel.from_pretrained(name_or_path)
    hf_cfg = hf.config
    config = config or GPT2Config(
        vocab_size=hf_cfg.vocab_size,
        n_positions=hf_cfg.n_positions,
        n_embd=hf_cfg.n_embd,
        n_layer=hf_cfg.n_layer,
        n_head=hf_cfg.n_head,
    )
    params = gpt2_from_torch_state_dict(hf.state_dict(), config)
    return config, params


def neox_from_torch_state_dict(sd: Dict[str, Any], config) -> Dict[str, Any]:
    """HF GPTNeoXForCausalLM state_dict -> NeoXLMHead params pytree."""
    sd = {k.removeprefix("module."): v for k, v in sd.items()}
    if any(k.startswith("gpt_neox.") for k in sd):
        sd = {k.removeprefix("gpt_neox."): v for k, v in sd.items()}

    def g(key):
        return _np(sd[key]).astype(np.float32)

    def linear(prefix):
        # nn.Linear weight (out, in) -> flax kernel (in, out)
        return {"kernel": g(prefix + ".weight").T, "bias": g(prefix + ".bias")}

    params: Dict[str, Any] = {
        "embed_in": g("embed_in.weight"),
        "final_layer_norm": {
            "scale": g("final_layer_norm.weight"),
            "bias": g("final_layer_norm.bias"),
        },
        "embed_out": {"kernel": g("embed_out.weight").T},
    }
    for i in range(config.num_layers):
        p = f"layers.{i}."
        params[f"layer_{i}"] = {
            "input_layernorm": {
                "scale": g(p + "input_layernorm.weight"),
                "bias": g(p + "input_layernorm.bias"),
            },
            "post_attention_layernorm": {
                "scale": g(p + "post_attention_layernorm.weight"),
                "bias": g(p + "post_attention_layernorm.bias"),
            },
            "attention": {
                "query_key_value": _neox_qkv(sd, p, config),
                "dense": linear(p + "attention.dense"),
            },
            "mlp": {
                "dense_h_to_4h": linear(p + "mlp.dense_h_to_4h"),
                "dense_4h_to_h": linear(p + "mlp.dense_4h_to_h"),
            },
        }
    return params


def _neox_qkv(sd, p, config):
    """HF NeoX packs qkv per-head interleaved: weight rows are
    [h0_q, h0_k, h0_v, h1_q, ...] of head_dim each; our model expects
    [all_q | all_k | all_v] concatenated."""
    w = _np(sd[p + "attention.query_key_value.weight"]).astype(np.float32)
    b = _np(sd[p + "attention.query_key_value.bias"]).astype(np.float32)
    H, D, C = config.num_heads, config.head_dim, config.hidden_size
    w = w.reshape(H, 3, D, C)  # (head, qkv, head_dim, in)
    b = b.reshape(H, 3, D)
    w = np.concatenate([w[:, j].reshape(H * D, C) for j in range(3)], axis=0)
    b = np.concatenate([b[:, j].reshape(H * D) for j in range(3)], axis=0)
    return {"kernel": w.T, "bias": b}  # (in, 3C)


def llama_from_torch_state_dict(sd: Dict[str, Any], config) -> Dict[str, Any]:
    """HF LlamaForCausalLM state_dict -> LlamaLMHead params pytree.

    The reference evaluates LLaMA-family checkpoints via
    ``AutoModelForCausalLM`` (/root/reference/loss-llama.ipynb cell 0);
    this is the migration path for those weights.  All linears are
    bias-free nn.Linear (out, in) -> transpose; RMSNorms carry a single
    scale vector.
    """
    sd = {k.removeprefix("module."): v for k, v in sd.items()}
    if any(k.startswith("model.") for k in sd):
        sd = {
            (k.removeprefix("model.") if k != "lm_head.weight" else k): v
            for k, v in sd.items()
        }

    def g(key):
        return _np(sd[key]).astype(np.float32)

    def linear(prefix):
        return {"kernel": g(prefix + ".weight").T}

    # checkpoints saved with tie_word_embeddings=True (common for small
    # LLaMA-family models) omit lm_head.weight — resolve it to the input
    # embedding, mirroring HF's tied-weight resolution
    head = (
        linear("lm_head")
        if "lm_head.weight" in sd
        else {"kernel": g("embed_tokens.weight").T}
    )
    params: Dict[str, Any] = {
        "embed_tokens": g("embed_tokens.weight"),
        "norm": {"scale": g("norm.weight")},
        "lm_head": head,
    }
    for i in range(config.num_layers):
        p = f"layers.{i}."
        params[f"layer_{i}"] = {
            "input_layernorm": {"scale": g(p + "input_layernorm.weight")},
            "post_attention_layernorm": {
                "scale": g(p + "post_attention_layernorm.weight")
            },
            "self_attn": {
                "q_proj": linear(p + "self_attn.q_proj"),
                "k_proj": linear(p + "self_attn.k_proj"),
                "v_proj": linear(p + "self_attn.v_proj"),
                "o_proj": linear(p + "self_attn.o_proj"),
            },
            "mlp": {
                "gate_proj": linear(p + "mlp.gate_proj"),
                "up_proj": linear(p + "mlp.up_proj"),
                "down_proj": linear(p + "mlp.down_proj"),
            },
        }
    return params


def llama_from_pretrained(name_or_path: str, config=None):
    """Load an HF LLaMA-family checkpoint (local dir; zero-egress) into
    (LlamaConfig, params)."""
    from transformers import LlamaForCausalLM

    from hessian_llm_vision_tpu.models.llama import LlamaConfig

    hf = LlamaForCausalLM.from_pretrained(name_or_path)
    c = hf.config
    config = config or LlamaConfig(
        vocab_size=c.vocab_size,
        max_position_embeddings=c.max_position_embeddings,
        hidden_size=c.hidden_size,
        intermediate_size=c.intermediate_size,
        num_layers=c.num_hidden_layers,
        num_heads=c.num_attention_heads,
        num_kv_heads=c.num_key_value_heads,
        rope_theta=getattr(c, "rope_theta", 10000.0),
        rms_eps=c.rms_norm_eps,
    )
    params = llama_from_torch_state_dict(hf.state_dict(), config)
    return config, params


def neox_from_pretrained(name_or_path: str, config=None):
    from transformers import GPTNeoXForCausalLM

    from hessian_llm_vision_tpu.models.pythia import NeoXConfig

    hf = GPTNeoXForCausalLM.from_pretrained(name_or_path)
    c = hf.config
    config = config or NeoXConfig(
        vocab_size=c.vocab_size,
        max_position_embeddings=c.max_position_embeddings,
        hidden_size=c.hidden_size,
        num_layers=c.num_hidden_layers,
        num_heads=c.num_attention_heads,
        rotary_pct=c.rotary_pct,
        rotary_emb_base=c.rotary_emb_base,
    )
    params = neox_from_torch_state_dict(hf.state_dict(), config)
    return config, params
