"""Headless trace summarization over a real captured profile."""

import jax
import jax.numpy as jnp

from hessian_llm_vision_tpu.obs.timing import profile_trace
from hessian_llm_vision_tpu.obs.trace_summary import (
    find_trace_file,
    summarize_trace,
)


def test_summarize_real_trace(tmp_path):
    d = str(tmp_path / "trace")
    with profile_trace(d):
        x = jnp.ones((256, 256))
        for _ in range(3):
            x = x @ x / 256.0
        jax.block_until_ready(x)
    path = find_trace_file(d)
    assert path is not None
    rows = summarize_trace(d, top=10, device_only=False)
    assert rows and rows[0][1] > 0
    names = " ".join(r[0] for r in rows)
    assert len(names) > 0
