"""LoRA adapters over any flax model in this framework.

Capability parity with the reference's PEFT/LoRA usage for LLaMA-family
loss evaluation (/root/reference/loss-llama.ipynb cell 0), rebuilt natively:
adapters are ordinary pytrees (A: (in, r), B: (r, out), B zero-init so the
adapted model equals the base at init), merged into the target kernels at
apply time.  Because adapters are just params, the WHOLE curvature stack
applies unchanged — ``HessianOperator(lora_loss, lora_params, batch)`` gives
the loss Hessian restricted to the adapter subspace (P = 2 r Σ dims,
small enough for dense cross-checks), and LanczosSGD trains adapters
spectrum-aware.
"""

from __future__ import annotations

import re
from typing import Any, Callable, Dict

import jax
import jax.numpy as jnp

from hessian_llm_vision_tpu.utils.trees import _key_str

DEFAULT_TARGETS = (
    r".*(c_attn|c_fc|query_key_value|dense_h_to_4h|attn/c_proj"
    r"|attention/dense|mlp/c_proj|dense_4h_to_h"
    # LLaMA-family projections (the PEFT target_modules of the
    # reference's loss-llama workload)
    r"|q_proj|k_proj|v_proj|o_proj|gate_proj|up_proj|down_proj"
    r")/kernel$"
)


def _leaf_paths(params: Any):
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    return [
        ("/".join(_key_str(k) for k in path), leaf) for path, leaf in flat
    ], treedef


def lora_init(
    base_params: Any,
    rank: int,
    key: jax.Array,
    *,
    targets: str = DEFAULT_TARGETS,
    alpha: float | None = None,
) -> Dict[str, Any]:
    """Adapter pytree {path: {"A": (in, r), "B": (r, out)}} for every 2-D
    kernel matching ``targets``.  A ~ N(0, 1/r), B = 0."""
    pat = re.compile(targets)
    flat, _ = _leaf_paths(base_params)
    adapters: Dict[str, Any] = {}
    for i, (name, leaf) in enumerate(flat):
        if leaf.ndim != 2 or not pat.match(name):
            continue
        d_in, d_out = leaf.shape
        k = jax.random.fold_in(key, i)
        adapters[name] = {
            "A": jax.random.normal(k, (d_in, rank), jnp.float32) / rank,
            "B": jnp.zeros((rank, d_out), jnp.float32),
        }
    if not adapters:
        raise ValueError(f"no kernels match {targets!r}")
    return adapters


def merge_lora(
    base_params: Any, adapters: Dict[str, Any], scale: float = 1.0
) -> Any:
    """base + scale * A @ B on adapted kernels (differentiable in A, B)."""
    flat, treedef = _leaf_paths(base_params)
    leaves = []
    for name, leaf in flat:
        if name in adapters:
            ad = adapters[name]
            delta = (ad["A"].astype(jnp.float32) @ ad["B"].astype(jnp.float32))
            leaves.append(leaf + scale * delta.astype(leaf.dtype))
        else:
            leaves.append(leaf)
    return jax.tree_util.tree_unflatten(treedef, leaves)


def lora_loss_fn(
    loss_fn: Callable[[Any, Any], jax.Array],
    base_params: Any,
    scale: float = 1.0,
) -> Callable[[Dict[str, Any], Any], jax.Array]:
    """Lift ``loss_fn(params, batch)`` to ``loss(adapters, batch)`` with the
    base frozen — the closure every curvature engine/optimizer consumes."""

    def loss(adapters, batch):
        return loss_fn(merge_lora(base_params, adapters, scale), batch)

    return loss
