"""Sequence-parallel (context-parallel) residual-stream sharding.

SURVEY.md §2.7 marks SP as absent from the reference (its parallelism is
``DataParallel`` over the batch axis only).  This module adds it the
TPU-native way: a ``jax.Sharding`` for the (B, T, C) activations, asserted
between transformer blocks (``models/*::seq_sharding``) so XLA's SPMD
partitioner keeps the layernorm/MLP/vocab-head/loss regions sharded along
the SEQUENCE axis and inserts the all-gathers itself only where causal
attention needs the full context.

Why it matters for a curvature framework: the single-example long-context
HVP (the Pythia-1.4B bs1 memory plan, or seq-2048 spectra) has batch size
1 — the ``data`` axis cannot shard anything.  Sharding T instead divides
the dominant activation/tangent working set (4x-hidden MLP transients,
chunked-vocab logits) across the mesh.

Numerics: ``with_sharding_constraint`` is exact and differentiable; loss,
grad and HVP through a seq-sharded model are bit-compatible with the
unsharded model (pinned in tests/distributed/test_seq_parallel.py).

No reference counterpart — beyond-parity scaling capability.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def seq_sharding(
    mesh: Mesh,
    seq_axis: str = "model",
    data_axis: Optional[str] = "data",
) -> NamedSharding:
    """Sharding for the (B, T, C) residual stream: batch over ``data_axis``
    (pass None to replicate batch — the bs1 long-context case), sequence
    over ``seq_axis``, hidden replicated."""
    return NamedSharding(mesh, P(data_axis, seq_axis, None))


def seq_parallel_config(
    cfg: Any,
    mesh: Mesh,
    seq_axis: str = "model",
    data_axis: Optional[str] = "data",
) -> Any:
    """Return ``cfg`` (GPT2Config / LlamaConfig / NeoXConfig) with its
    residual stream constrained to :func:`seq_sharding` over ``mesh``."""
    return dataclasses.replace(
        cfg, seq_sharding=seq_sharding(mesh, seq_axis, data_axis)
    )
