"""Tensor-parallel parameter sharding over the 'model' mesh axis.

SURVEY.md §2.7: the reference has no TP; the TPU build adds an optional
``model`` axis for the Pythia-1.4B config (BASELINE.json config 5), where
replicated f32 params + optimizer state would crowd a single chip's HBM.

Megatron-style rules expressed as path-regex -> PartitionSpec; XLA's SPMD
partitioner propagates the weight shardings through the jitted computation
and inserts the ICI collectives itself — no manual comm code.  Column-
parallel for fan-out kernels (qkv, mlp up), row-parallel for fan-in kernels
(attn/mlp output projections), vocab-parallel for embeddings.
"""

from __future__ import annotations

import re
from typing import Any, Sequence, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from hessian_llm_vision_tpu.utils.trees import _key_str

# (path regex, spec) — first match wins; names match the GPT-2, NeoX and
# LLaMA module trees ('/'-joined).  Kernels are (in, out).  LLaMA
# (models/llama.py): q/k/v and SwiGLU gate/up are fan-out (column-parallel;
# GQA k/v just shard their smaller Hk*D fan-out), o_proj/down_proj are
# fan-in (row-parallel), embed_tokens/lm_head are vocab-parallel like
# wte/embed_out.
DEFAULT_TP_RULES: Sequence[Tuple[str, P]] = (
    (r".*(c_attn|query_key_value|c_fc|dense_h_to_4h)/kernel$", P(None, "model")),
    (r".*(c_attn|query_key_value|c_fc|dense_h_to_4h)/bias$", P("model")),
    (r".*(attn/c_proj|attention/dense|mlp/c_proj|dense_4h_to_h)/kernel$", P("model", None)),
    (r".*(q_proj|k_proj|v_proj|gate_proj|up_proj)/kernel$", P(None, "model")),
    (r".*(o_proj|down_proj)/kernel$", P("model", None)),
    (r".*(wte|embed_in|embed_tokens)$", P("model", None)),  # vocab-parallel
    (r".*(embed_out|lm_head)/kernel$", P(None, "model")),
    (r".*", P()),  # everything else replicated (LNs/RMSNorms, biases, wpe)
)


def tp_spec_tree(params: Any, rules: Sequence[Tuple[str, P]] = DEFAULT_TP_RULES) -> Any:
    """PartitionSpec pytree for ``params`` by first-matching rule."""
    compiled = [(re.compile(pat), spec) for pat, spec in rules]
    paths, treedef = jax.tree_util.tree_flatten_with_path(params)
    specs = []
    for path, leaf in paths:
        name = "/".join(_key_str(k) for k in path)
        for pat, spec in compiled:
            if pat.match(name):
                # drop axes that don't divide the dim (tiny test models)
                specs.append(_fit_spec(spec, leaf.shape))
                break
    return jax.tree_util.tree_unflatten(treedef, specs)


def _fit_spec(spec: P, shape) -> P:
    out = []
    for i, ax in enumerate(spec):
        if ax is None or i >= len(shape):
            out.append(None)
            continue
        out.append(ax)
    return P(*out) if out else P()


def shard_params_for_tp(
    params: Any,
    mesh: Mesh,
    rules: Sequence[Tuple[str, P]] = DEFAULT_TP_RULES,
) -> Any:
    """device_put params with Megatron-style shardings over ``mesh``.

    Leaves whose sharded dimension doesn't divide by the axis size fall
    back to replicated (keeps tiny test configs working on any mesh).
    """
    spec_tree = tp_spec_tree(params, rules)

    def put(x, spec):
        for i, ax in enumerate(spec):
            if ax is None:
                continue
            axes = ax if isinstance(ax, tuple) else (ax,)
            size = 1
            for a in axes:
                size *= mesh.shape[a]
            if x.shape[i] % size:
                spec = P()
                break
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(put, params, spec_tree)
