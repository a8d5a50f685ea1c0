"""On-chip probe: per-operand vocab-head precision speed/accuracy points.

Headline context (bench.py): mixed mode = transformer blocks 1-pass bf16,
vocab head + loss bf16x3 (3 MXU passes, precision "high").  The head is
~29% of forward FLOPs but 3 passes => ~55% of mixed-mode MXU time.  JAX
exposes per-operand precision tuples — splitting ONE operand into hi/lo
bf16 costs 2 passes.  This probe measures, on the real chip at the bench
protocol (GPT-2 124M, bs8/seq512, blk/chunk 512):

  strict        blocks high,   head high        (round-2 parity anchor)
  mixed         blocks default, head high        (current headline)
  mixed_act     blocks default, head act_high    (activations split, 2-pass)
  mixed_weight  blocks default, head weight_high (weights split, 2-pass)
  fast          blocks default, head default     (1-pass, known ~2e-3 err)

For each: 10-iter Lanczos extreme Ritz values + wall-clock; errors are
relative to strict.  Run AFTER the chip is free (one TPU job at a time).

FROZEN METHODOLOGY NOTE: this probe hand-rolls the pre-fused host Lanczos
dispatch (per-batch HVP + local recurrence jit) because its committed
timings were measured under that pattern and must stay reproducible.
New measurement code should call ``dataset_spectrum_host(..., fused=True)``
(krylov/driver.py) — the production path bench.py runs — instead of
copying this loop.
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
    import os

    cache = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from hessian_llm_vision_tpu.curvature import HessianOperator
    from hessian_llm_vision_tpu.data import random_token_batches
    from hessian_llm_vision_tpu.models import GPT2Config, GPT2LMHead, losses
    from hessian_llm_vision_tpu.utils.flatten import Flattener

    num_batches, batch_size, seq_len, iters = 4, 8, 512, 10
    block_q = chunk = 512

    modes = {
        "strict": (None, "high"),
        "mixed": ("default", "high"),
        "mixed_act": ("default", "act_high"),
        "mixed_weight": ("default", "weight_high"),
        "fast": ("default", "default"),
    }

    cfg0 = GPT2Config.gpt2_124m(n_positions=seq_len, dtype=jnp.float32,
                                attn_block_q=block_q)
    model0 = GPT2LMHead(cfg0)
    params = model0.init_params(jax.random.PRNGKey(0), seq_len=seq_len)
    fl = Flattener(params)
    data = random_token_batches(num_batches, batch_size, seq_len,
                                cfg0.vocab_size, seed=0)
    batch_list = [jnp.asarray(data["input_ids"][i]) for i in range(num_batches)]

    @jax.jit
    def recurrence(w, q_cur, q_prev, beta_prev):
        alpha = jnp.vdot(q_cur, w)
        w = w - alpha * q_cur - beta_prev * q_prev
        beta = jnp.linalg.norm(w)
        return alpha, beta, w / jnp.maximum(beta, 1e-30)

    def spectrum(dhvp, key):
        q_cur = jax.random.normal(key, (fl.size,), jnp.float32)
        q_cur = q_cur / jnp.linalg.norm(q_cur)
        q_prev = jnp.zeros_like(q_cur)
        beta_prev = jnp.float32(0.0)
        alphas, betas = [], []
        for _ in range(iters):
            w = dhvp(q_cur)
            alpha, beta, q_next = recurrence(w, q_cur, q_prev, beta_prev)
            q_prev, q_cur, beta_prev = q_cur, q_next, beta
            alphas.append(alpha)
            betas.append(beta)
        a = np.asarray(jnp.stack(alphas))
        b = np.asarray(jnp.stack(betas))[:-1]
        T = np.diag(a) + np.diag(b, 1) + np.diag(b, -1)
        return np.linalg.eigvalsh(T)

    results = {}
    ref = None
    for name, (block_prec, head_prec) in modes.items():
        cfg = GPT2Config.gpt2_124m(
            n_positions=seq_len, dtype=jnp.float32, attn_block_q=block_q,
            block_matmul_precision=block_prec,
        )
        model = GPT2LMHead(cfg)
        lfn = losses.lm_loss_fn(model, loss_chunk=chunk,
                                head_precision=head_prec)

        @jax.jit
        def batch_hvp(v, params, ids, _lfn=lfn):
            op = HessianOperator(_lfn, params, {"input_ids": ids},
                                 flattener=fl, remat=False)
            return op.matvec(v)

        def dhvp(v, _bh=batch_hvp):
            w = _bh(v, params, batch_list[0])
            for ids in batch_list[1:]:
                w = w + _bh(v, params, ids)
            return w / num_batches

        ev = spectrum(dhvp, jax.random.PRNGKey(42))  # warm/compile
        t0 = time.perf_counter()
        ev = spectrum(dhvp, jax.random.PRNGKey(7))
        wall = time.perf_counter() - t0
        if name == "strict":
            ref = ev
        rel_max = abs(ev[-1] - ref[-1]) / abs(ref[-1])
        rel_min = abs(ev[0] - ref[0]) / abs(ref[0])
        results[name] = {
            "wall_s": round(wall, 3),
            "hvps_per_sec": round(iters * num_batches / wall, 3),
            "lambda_max": float(ev[-1]),
            "lambda_min": float(ev[0]),
            "rel_err_max": float(rel_max),
            "rel_err_min": float(rel_min),
        }
        print(name, json.dumps(results[name]), flush=True)
    print("RESULTS", json.dumps(results))


if __name__ == "__main__":
    main()
