"""jax.profiler trace wrapper produces an inspectable trace dir."""

import glob
import os

import jax
import jax.numpy as jnp


def test_profile_trace(tmp_path):
    from hessian_llm_vision_tpu.obs.timing import profile_trace

    d = str(tmp_path / "trace")
    with profile_trace(d):
        x = jnp.ones((64, 64))
        jax.block_until_ready(x @ x)
    files = glob.glob(os.path.join(d, "**", "*"), recursive=True)
    assert any(os.path.isfile(f) for f in files), "no trace files written"
