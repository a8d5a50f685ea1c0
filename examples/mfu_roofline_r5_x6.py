"""Roofline + tuning pass for the blocks-X6 curvature regime (VERDICT r4 #2).

Round 4 certified blocks-X6 (bf16 6-pass dot algorithm, head/loss at
"high") as the faithful floor for trained-checkpoint curvature and made
it the auto-ladder default there — but it never got the performance
treatment the mixed tier got (artifacts/mfu_r4/): no cost analysis, no
leaf-op trace, no block/chunk/batch tuning.  Round-4 measured walls:
0.318 s per bs8 batch-HVP on the fused loop (3.14 HVP/s,
.logs/x6_bs8_probe.log), 0.187 s at bs4 (BENCH_r04).

This probe answers, in order:

1. **Which roofline binds at X6?**  XLA cost analysis (flops + bytes) of
   the X6 batch-HVP program vs the mixed one.  NOTE the flops XLA
   reports for a dot with a dot_algorithm are LOGICAL (pass-count
   invariant — verified by diffing the X6/mixed numbers); the physical
   MXU work is ~6x the blocks' logical dot flops + 3x the head's, so the
   script derives a physical-flops estimate from the logical count and
   the measured block/head split (blocks ~71% of HVP flops at seq512,
   models/gpt2.py:62-68).
2. **Where does the time go?**  Leaf-op trace ("XLA Ops" rows) of two
   fused X6 dataset iterations + device-busy fraction of span.
3. **What do the knobs buy?**  A/B arms over attn_block_q x loss_chunk,
   attention remat (its re-computed score einsums are 6-pass at X6),
   head tier (outer "high" 3-pass vs "highest"=X6), and batch scaling
   bs4/8/16 (the round-4 "bs16 is 7.9% slower" verdict was mixed-only).

Timing method per the repo's tunnel rules (CLAUDE.md): chained dependent
matvecs (a T-only Lanczos recurrence) ending in a host fetch — repeated
identical dispatches report ~0 ms through the async tunnel.  Accuracy is
NOT judged here (reorth=False recurrences at trained conditioning are
trajectory-chaotic, krylov/autoprec.py); certification stays with
bench.py's trained-ckpt ladder check.

Reference anchor: the trained 35-iter spectrum job this tier now runs,
/root/reference/gpt2_savehessian.py:202-208.
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

PEAK_TFLOPS_BF16 = 197.0
PEAK_HBM_GBS = 819.0
BLOCK_FLOP_FRAC = 0.71  # measured block share of HVP flops at seq512


def main():
    cache = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from hessian_llm_vision_tpu.data import random_token_batches
    from hessian_llm_vision_tpu.krylov.autoprec import X6
    from hessian_llm_vision_tpu.krylov.driver import (
        _jitted_batch_hvp,
        _tiny_lanczos_extremes,
        dataset_spectrum_host,
    )
    from hessian_llm_vision_tpu.models import GPT2Config, GPT2LMHead, losses
    from hessian_llm_vision_tpu.obs import profile_trace
    from hessian_llm_vision_tpu.utils.flatten import Flattener

    seq_len = 512
    out_path = (
        sys.argv[1] if len(sys.argv) > 1 else "artifacts/mfu_r5/x6_roofline.json"
    )
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    out = {"config": "gpt2-124M blocks-X6 curvature, seq512"}

    def save():
        with open(out_path, "w") as f:
            json.dump(out, f, indent=1)

    base = GPT2Config.gpt2_124m(n_positions=seq_len)
    params = GPT2LMHead(base).init_params(jax.random.PRNGKey(0), seq_len=seq_len)
    fl = Flattener(params)
    key = jax.random.PRNGKey(3)
    v0 = jax.random.normal(key, (fl.size,), jnp.float32)
    v0 = v0 / jnp.linalg.norm(v0)

    def make_hvp(block_q, chunk, outer, remat, block_prec):
        import dataclasses

        cfg = dataclasses.replace(
            base,
            attn_block_q=block_q,
            attn_remat=remat,
            block_matmul_precision=block_prec,
        )
        model = GPT2LMHead(cfg)
        loss_fn = losses.lm_loss_fn(model, loss_chunk=chunk)
        return _jitted_batch_hvp(loss_fn, "mean", outer, fl), loss_fn

    # (label, block_q, loss_chunk, outer_precision, attn_remat, bs, prec)
    arms = [
        ("x6_r4base_bq256_ck256_bs8", 256, 256, "high", True, 8, X6),
        ("x6_bq512_ck512_bs8", 512, 512, "high", True, 8, X6),
        ("x6_dense_attn_ck512_bs8", None, 512, "high", True, 8, X6),
        ("x6_bq512_ck512_noremat_bs8", 512, 512, "high", False, 8, X6),
        ("x6_headX6_bq512_ck512_bs8", 512, 512, "highest", True, 8, X6),
        ("x6_bq512_ck512_bs4", 512, 512, "high", True, 4, X6),
        ("x6_bq512_ck512_bs16", 512, 512, "high", True, 16, X6),
        ("mixed_bq512_ck512_bs8", 512, 512, "high", True, 8, "default"),
    ]

    out["arms"] = {}
    timing_iters = 8
    for label, bq, ck, outer, remat, bs, prec in arms:
        try:
            hvp, loss_fn = make_hvp(bq, ck, outer, remat, prec)
            data = random_token_batches(1, bs, seq_len, base.vocab_size, seed=0)
            batch = {"input_ids": jnp.asarray(data["input_ids"][0])}
            t0 = time.perf_counter()
            compiled = hvp.lower(
                jax.ShapeDtypeStruct((fl.size,), jnp.float32),
                jax.tree_util.tree_map(
                    lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), params
                ),
                {"input_ids": jax.ShapeDtypeStruct((bs, seq_len), jnp.int32)},
            ).compile()
            compile_s = time.perf_counter() - t0
            ca = compiled.cost_analysis()
            flops = float(ca.get("flops", 0.0))
            bytes_acc = float(ca.get("bytes accessed", 0.0))
            # warm the dispatch path, then chained-recurrence timing
            hvp(v0, params, batch).block_until_ready()
            t0 = time.perf_counter()
            _tiny_lanczos_extremes(hvp, v0, params, batch, timing_iters)
            dt = (time.perf_counter() - t0) / timing_iters
            # physical MXU flops: blocks at 6 passes (X6) or 1 (default);
            # embedding/head/loss at the outer tier (high=3, highest=X6=6)
            block_passes = 6 if prec == X6 else 1
            outer_passes = 6 if outer == "highest" else 3
            phys = flops * (
                BLOCK_FLOP_FRAC * block_passes
                + (1 - BLOCK_FLOP_FRAC) * outer_passes
            )
            row = {
                "sec_per_hvp": round(dt, 4),
                "hvps_per_sec": round(1.0 / dt, 2),
                "compile_or_cacheload_s": round(compile_s, 1),
                "xla_logical_flops": flops,
                "xla_bytes_accessed": bytes_acc,
                "arithmetic_intensity_logical": round(flops / bytes_acc, 1),
                "physical_flops_est": phys,
                "achieved_physical_tflops": round(phys / dt / 1e12, 1),
                "pct_of_bf16_peak": round(100 * phys / dt / 1e12 / PEAK_TFLOPS_BF16, 1),
                "roofline_floor_sec_compute": round(
                    phys / (PEAK_TFLOPS_BF16 * 1e12), 4
                ),
                "roofline_floor_sec_hbm": round(
                    bytes_acc / (PEAK_HBM_GBS * 1e9), 4
                ),
            }
            row["binding"] = (
                "compute"
                if row["roofline_floor_sec_compute"] > row["roofline_floor_sec_hbm"]
                else "hbm"
            )
            out["arms"][label] = row
            print(f"[{label}] {dt*1e3:.0f} ms/HVP  "
                  f"phys {row['achieved_physical_tflops']} TF/s "
                  f"({row['pct_of_bf16_peak']}% peak, {row['binding']}-bound "
                  f"floor c={row['roofline_floor_sec_compute']}s "
                  f"h={row['roofline_floor_sec_hbm']}s)", flush=True)
        except Exception as e:
            out["arms"][label] = {"error": f"{type(e).__name__}: {e}"}
            print(f"[{label}] FAILED {type(e).__name__}: {e}", flush=True)
        save()

    # ---- pick the fastest passing-certification shape (X6 blocks + high
    # head arms only) and measure the production fused loop + a leaf trace
    x6_rows = {
        k: v
        for k, v in out["arms"].items()
        if k.startswith("x6_") and "sec_per_hvp" in v and "headX6" not in k
        and "_bs8" in k
    }
    if x6_rows:
        best = min(x6_rows, key=lambda k: x6_rows[k]["sec_per_hvp"])
        out["best_bs8_arm"] = best
        _, bq, ck, outer, remat, bs, prec = next(
            a for a in arms if a[0] == best
        )
        hvp, loss_fn = make_hvp(bq, ck, outer, remat, prec)
        nb = 4
        data = random_token_batches(nb, bs, seq_len, base.vocab_size, seed=0)
        bd = [{"input_ids": jnp.asarray(data["input_ids"][i])} for i in range(nb)]
        r = dataset_spectrum_host(  # warm/compile the fused program
            loss_fn, params, bd, 2, v0=v0, flattener=fl,
            precision=outer, fused=True,
        )
        np.asarray(r.alphas)
        t0 = time.perf_counter()
        iters = 10
        r = dataset_spectrum_host(
            loss_fn, params, bd, iters, v0=v0, flattener=fl,
            precision=outer, fused=True,
        )
        np.asarray(r.alphas)
        wall = time.perf_counter() - t0
        out["fused_best"] = {
            "arm": best,
            "wall_s_10iter_4xbs8": round(wall, 2),
            "sec_per_batch_hvp": round(wall / (iters * nb), 4),
            "hvps_per_sec": round(iters * nb / wall, 2),
            "eta_35iter_trained_spectrum_s": round(wall / iters * 35, 1),
        }
        print(f"[fused {best}] {wall:.2f}s for {iters}x{nb} batch-HVPs "
              f"= {iters*nb/wall:.2f} HVP/s", flush=True)
        save()

        import tempfile

        from examples.mfu_roofline_r4 import leaf_op_summary

        tracedir = tempfile.mkdtemp(prefix="mfu_x6_trace_")
        with profile_trace(tracedir):
            r = dataset_spectrum_host(
                loss_fn, params, bd, 2, v0=v0, flattener=fl,
                precision=outer, fused=True,
            )
            jax.block_until_ready(r.alphas)
        rows, busy_us, span_us, _ = leaf_op_summary(tracedir)
        out["leaf_ops_top25_2iters"] = [
            {"op": n, "ms": round(d / 1e3, 2), "pct_busy": round(100 * d / busy_us, 1)}
            for n, d in rows
        ]
        out["device_busy_ms"] = round(busy_us / 1e3, 1)
        out["trace_span_ms"] = round(span_us / 1e3, 1)
        out["device_busy_frac_of_span"] = round(busy_us / span_us, 3)
        print("[leaf ops] busy", out["device_busy_ms"], "ms of span",
              out["trace_span_ms"], "ms", flush=True)
        for row in out["leaf_ops_top25_2iters"][:12]:
            print(f"  {row['ms']:8.2f} ms {row['pct_busy']:5.1f}%  "
                  f"{row['op'][:80]}", flush=True)
    save()
    print("wrote", out_path)


if __name__ == "__main__":
    main()
