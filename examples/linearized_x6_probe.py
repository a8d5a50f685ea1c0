"""Measure the linearized-HVP speedup on the compute-bound X6 tier.

The X6 roofline (artifacts/mfu_r5/x6_roofline.json) shows the faithful
trained-checkpoint tier is COMPUTE-bound at ~71% of the physical bf16
peak with every shape knob flat — the remaining lever is algorithmic:
``curvature/linearized.py`` splits the primal forward+backward out of
the matvec (tangent = 0.72x the HVP flops by XLA cost analysis).  The
residuals are 2.65 GiB/sequence at 124M seq512, so the mode fits
single-batch jobs at bs<=4 (refresh-scale); this probe measures, on the
real chip at blocks-X6 + head high:

* residual_program wall (the once-per-job primal),
* tangent_program steady wall via a chained dependent loop,
* the full-HVP program wall at the same shape,
* the implied k=10 (refresh) and k=35 (spectrum) job speedups.

Timing per the tunnel rules: chained dependent calls ending in a host
fetch (CLAUDE.md).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    cache = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from hessian_llm_vision_tpu.curvature.linearized import (
        linearized_hvp_programs,
        residual_bytes,
    )
    from hessian_llm_vision_tpu.data import random_token_batches
    from hessian_llm_vision_tpu.krylov.autoprec import X6
    from hessian_llm_vision_tpu.krylov.driver import _jitted_batch_hvp
    from hessian_llm_vision_tpu.models import GPT2Config, GPT2LMHead, losses
    from hessian_llm_vision_tpu.utils.flatten import Flattener

    seq_len = 512
    out_path = (
        sys.argv[1] if len(sys.argv) > 1
        else "artifacts/mfu_r5/linearized_x6.json"
    )
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    out = {"config": "gpt2-124M blocks-X6 + head high, seq512, single batch"}

    cfg = GPT2Config.gpt2_124m(
        n_positions=seq_len, attn_block_q=512, block_matmul_precision=X6,
    )
    model = GPT2LMHead(cfg)
    params = model.init_params(jax.random.PRNGKey(0), seq_len=seq_len)
    loss_fn = losses.lm_loss_fn(model, loss_chunk=512)
    fl = Flattener(params)
    v0 = jax.random.normal(jax.random.PRNGKey(3), (fl.size,), jnp.float32)
    v0 = v0 / jnp.linalg.norm(v0)

    @jax.jit
    def chain_step(v, w):
        # dependent chaining: next probe direction from the last output
        v = w / jnp.maximum(jnp.linalg.norm(w), 1e-30)
        return v

    for bs in (2, 4):
        row = {}
        try:
            data = random_token_batches(1, bs, seq_len, cfg.vocab_size, seed=0)
            batch = {"input_ids": jnp.asarray(data["input_ids"][0])}
            row["residual_gib_abstract"] = round(
                residual_bytes(loss_fn, params, batch) / 2**30, 2
            )
            resid_p, tangent_p = linearized_hvp_programs(
                loss_fn, "mean", "high", fl, None
            )
            hvp = _jitted_batch_hvp(loss_fn, "mean", "high", fl)

            # full HVP: warm + chained timing.  NOTE: timings must end
            # in a HOST SCALAR FETCH — this backend's block_until_ready
            # does not synchronize through the tunnel (measured: bs4
            # "HVPs" at 0.1 ms, below the HBM floor of reading their own
            # inputs)
            w = hvp(v0, params, batch)
            float(jnp.vdot(w, w))
            iters = 8
            t0 = time.perf_counter()
            v = v0
            for _ in range(iters):
                w = hvp(v, params, batch)
                v = chain_step(v, w)
            float(jnp.vdot(v, v))
            row["sec_per_full_hvp"] = round(
                (time.perf_counter() - t0) / iters, 4
            )

            # residual program: warm = the measurement of interest is the
            # steady dispatch (cached compile), take the 2nd call
            consts = resid_p(params, batch)
            float(jnp.linalg.norm(consts[0]))
            t0 = time.perf_counter()
            consts = resid_p(params, batch)
            float(jnp.linalg.norm(consts[0]))
            row["sec_residual_program"] = round(time.perf_counter() - t0, 4)

            # tangent program: warm + correctness vs the full HVP (the
            # linear map must agree on-chip, not just in the CPU parity
            # tier), then chained timing ending in a host fetch
            w = tangent_p(v0, consts, params, batch)
            w_ref = hvp(v0, params, batch)
            num = float(jnp.linalg.norm(w - w_ref))
            den = float(jnp.linalg.norm(w_ref))
            row["tangent_vs_hvp_rel_err"] = round(num / max(den, 1e-30), 8)
            t0 = time.perf_counter()
            v = v0
            for _ in range(iters):
                w = tangent_p(v, consts, params, batch)
                v = chain_step(v, w)
            float(jnp.vdot(v, v))
            row["sec_per_tangent"] = round((time.perf_counter() - t0) / iters, 4)
            del consts, w, v

            t_h, t_t, t_r = (row["sec_per_full_hvp"], row["sec_per_tangent"],
                             row["sec_residual_program"])
            for k in (10, 35):
                row[f"speedup_k{k}"] = round(
                    (k * t_h) / (t_r + k * t_t), 2
                )
            row["tangent_over_hvp"] = round(t_t / t_h, 3)
        except Exception as e:
            row["error"] = f"{type(e).__name__}: {e}"
        out[f"bs{bs}"] = row
        print(f"[bs{bs}]", json.dumps(row), flush=True)
        with open(out_path, "w") as f:
            json.dump(out, f, indent=1)
    print("wrote", out_path)


if __name__ == "__main__":
    main()
