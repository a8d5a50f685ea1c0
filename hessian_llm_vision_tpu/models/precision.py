"""Per-layer matmul-precision plumbing for the LM families.

``block_matmul_precision`` on the LM configs accepts three forms:

* ``None`` — inherit the caller's ``jax.default_matmul_precision`` (the
  strict curvature modes set that outer context to "high"/"highest");
* a string — one precision for EVERY transformer block (the round-3
  "mixed" mode: blocks "default" = 1-pass bf16, vocab head + loss keep
  the outer 3-pass precision);
* a sequence of length ``n_layer`` with ``None``/str entries — PER-BLOCK
  precision.  This is the auto-precision escalation surface: trained
  checkpoints concentrate curvature in the embedding + EARLY blocks
  (measured 10^5x depth-sharpness ratio at 2000 Adam steps,
  artifacts/trained124m_r3/README.md), so escalating a PREFIX of blocks
  to "high" recovers the f32 spectrum while the O(1)-curvature late
  blocks keep the fast 1-pass path.  See krylov/autoprec.py.

The reference never needed this dial — its CUDA matmuls are f32-native
(SURVEY.md §2.6); on TPU the bf16-family speed tiers make precision a
first-class, checkpoint-dependent safety decision.
"""

from __future__ import annotations

import contextlib
from typing import Optional, Sequence, Tuple, Union

import jax

BlockPrecision = Union[None, str, Sequence[Optional[str]]]

_VALID = (None, "default", "high", "highest")


def _check(p) -> None:
    # precision tiers plus dot-algorithm preset names (e.g.
    # "BF16_BF16_F32_X6" — measured on v5e: "highest" lowers to X6, and
    # X6 blocks are the accuracy floor for trained-checkpoint curvature);
    # jax.default_matmul_precision validates preset strings itself at
    # scope entry, so only obviously-wrong types are rejected here.
    if p is None or (isinstance(p, str) and (p in _VALID or p.isupper())):
        return
    raise ValueError(
        f"invalid block matmul precision {p!r}; expected one of "
        f"{_VALID} or a jax dot-algorithm preset name (e.g. "
        "'BF16_BF16_F32_X6')"
    )


def per_layer_precision(
    bmp: BlockPrecision, n_layers: int
) -> Tuple[Optional[str], ...]:
    """Normalize ``block_matmul_precision`` to an ``n_layers`` tuple."""
    if bmp is None or isinstance(bmp, str):
        per = (bmp,) * n_layers
    else:
        per = tuple(bmp)
        if len(per) != n_layers:
            raise ValueError(
                f"block_matmul_precision sequence has {len(per)} entries "
                f"for {n_layers} layers"
            )
    for p in per:
        _check(p)
    return per


def precision_scope(prec: Optional[str]):
    """Context manager: ``jax.default_matmul_precision`` or a no-op."""
    if prec is None:
        return contextlib.nullcontext()
    return jax.default_matmul_precision(prec)


def uniform_precision(bmp: BlockPrecision) -> Optional[str]:
    """Collapse a per-layer spec to one string if uniform, else raise.

    Used by code paths that cannot express per-layer precision (the
    pipelined loss scans one Block program over all stages)."""
    if bmp is None or isinstance(bmp, str):
        return bmp
    per = set(bmp)
    if len(per) == 1:
        return next(iter(per))
    raise ValueError(
        "this code path supports a single uniform block_matmul_precision; "
        f"got per-layer spec {tuple(bmp)!r}"
    )
