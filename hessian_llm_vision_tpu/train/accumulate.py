"""Micro-batch reshaping for gradient accumulation.

Reference semantics: accumulate ``.grad`` over ``accumulation_steps``
micro-batches, step every N (/root/reference/accum.py:138-234,
gpt2_adam_raw.py:110-113).  TPU-native: the step scans a stacked
micro-batch axis; this helper produces that axis.
"""

from __future__ import annotations

from typing import Any

import jax


def to_microbatches(batch: Any, accum_steps: int) -> Any:
    """Split the leading batch axis B into (accum_steps, B/accum_steps)."""

    def split(x):
        b = x.shape[0]
        if b % accum_steps:
            raise ValueError(f"batch {b} not divisible by accum_steps {accum_steps}")
        return x.reshape(accum_steps, b // accum_steps, *x.shape[1:])

    return jax.tree_util.tree_map(split, batch)
