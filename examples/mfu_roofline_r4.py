"""Roofline + leaf-op attack on the bench MFU gap (VERDICT r3 #3).

BENCH_r03: 47.6 TF/s achieved vs ~125 TF/s mixed-roofline peak (38.1%
analytic, 51.4% by XLA op count) with top_ops showing only container
rows (jit_step / while.15).  This probe produces the numbers that decide
whether the gap is compute or HBM:

1. XLA cost analysis of the mixed-precision batch HVP: FLOPs + bytes
   accessed -> arithmetic intensity -> which roofline binds on v5e
   (197 TF/s bf16 MXU / ~819 GB/s HBM).
2. A leaf-level trace breakdown: aggregate the XLA *Ops* rows (not the
   module/while containers), top 25, plus the device-busy fraction.
3. A bs16 A/B: the reference's own default batch (gpt2_savehessian.py
   bs16) as 2x16 vs the bench's 4x8 for the same 32-sequence dataset —
   bigger matmuls amortize fixed per-op cost if dispatch/fusion overhead
   is the gap.
"""

from __future__ import annotations

import collections
import glob
import gzip
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


def leaf_op_summary(logdir, top=25):
    """Aggregate ONLY leaf 'XLA Ops' thread rows of the newest trace."""
    hits = sorted(
        glob.glob(os.path.join(logdir, "**", "*.trace.json.gz"), recursive=True)
    )
    with gzip.open(hits[-1], "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    tid_names = {}
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tid_names[(e["pid"], e["tid"])] = e.get("args", {}).get("name", "")
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e.get("args", {}).get("name", "")
    agg = collections.Counter()
    t_min, t_max = np.inf, -np.inf
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        row = tid_names.get((e.get("pid"), e.get("tid")), "")
        proc = pid_names.get(e.get("pid"), "")
        if "TPU" not in proc.upper():
            continue
        if "XLA Ops" not in row:
            continue
        agg[e.get("name", "?")] += e["dur"]
        t_min = min(t_min, e["ts"])
        t_max = max(t_max, e["ts"] + e["dur"])
    busy_us = sum(agg.values())
    span_us = max(t_max - t_min, 1.0)
    rows = agg.most_common(top)
    return rows, busy_us, span_us, sum(agg.values())


def main():
    cache = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from hessian_llm_vision_tpu.curvature import HessianOperator
    from hessian_llm_vision_tpu.data import random_token_batches
    from hessian_llm_vision_tpu.krylov.driver import dataset_spectrum_host
    from hessian_llm_vision_tpu.models import GPT2Config, GPT2LMHead, losses
    from hessian_llm_vision_tpu.obs import profile_trace
    from hessian_llm_vision_tpu.utils.flatten import Flattener

    seq_len, iters = 512, 35
    out = {"config": "gpt2-124M mixed precision, seq512"}

    cfg = GPT2Config.gpt2_124m(
        n_positions=seq_len, attn_block_q=512, block_matmul_precision="default"
    )
    model = GPT2LMHead(cfg)
    params = model.init_params(jax.random.PRNGKey(0), seq_len=seq_len)
    loss_fn = losses.lm_loss_fn(model, loss_chunk=512)
    fl = Flattener(params)

    def batch_hvp_maker(bs):
        @jax.jit
        def batch_hvp(v, params, ids):
            op = HessianOperator(
                loss_fn, params, {"input_ids": ids}, flattener=fl, remat=False
            )
            return op.matvec(v)

        return batch_hvp

    # ---- 1) cost analysis: flops + bytes (XLA's cost model) --------------
    # The per-HVP seconds come LATER from the fused spectrum walls (the
    # production dispatch path).  A chained eager power loop is useless
    # here: jnp.linalg.norm between dispatches is an eager op, and this
    # backend dispatches eager ops through the tunnel synchronously
    # (measured 0.32 s/HVP for the same program the fused loop runs at
    # 0.138 s — pure round-trip tax, not device time).
    costs = {}
    for bs in (8, 16):
        hvp = batch_hvp_maker(bs)
        compiled = (
            jax.jit(hvp)
            .lower(
                jax.ShapeDtypeStruct((fl.size,), jnp.float32),
                jax.tree_util.tree_map(
                    lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), params
                ),
                jax.ShapeDtypeStruct((bs, seq_len), jnp.int32),
            )
            .compile()
        )
        ca = compiled.cost_analysis()
        costs[bs] = (
            float(ca.get("flops", 0.0)),
            float(ca.get("bytes accessed", 0.0)),
        )

    # ---- 2) leaf-op trace of one fused dataset iteration (4x bs8) -------
    num_batches, bs = 4, 8
    data = random_token_batches(num_batches, bs, seq_len, cfg.vocab_size, seed=0)
    batch_dicts = [
        {"input_ids": jnp.asarray(data["input_ids"][i])}
        for i in range(num_batches)
    ]
    v0 = jnp.ones((fl.size,), jnp.float32) / np.sqrt(fl.size)
    # warm
    res = dataset_spectrum_host(
        loss_fn, params, batch_dicts, 1, v0=v0, flattener=fl,
        precision="high", fused=True,
    )
    jax.block_until_ready(res.alphas)
    import tempfile

    tracedir = tempfile.mkdtemp(prefix="mfu_trace_")
    with profile_trace(tracedir):
        res = dataset_spectrum_host(
            loss_fn, params, batch_dicts, 2, v0=v0, flattener=fl,
            precision="high", fused=True,
        )
        jax.block_until_ready(res.alphas)
    rows, busy_us, span_us, _ = leaf_op_summary(tracedir)
    out["leaf_ops_top25_2iters"] = [
        {"op": n, "ms": round(d / 1e3, 2), "pct_busy": round(100 * d / busy_us, 1)}
        for n, d in rows
    ]
    out["device_busy_ms"] = round(busy_us / 1e3, 1)
    out["trace_span_ms"] = round(span_us / 1e3, 1)
    out["device_busy_frac_of_span"] = round(busy_us / span_us, 3)
    print("[leaf ops] busy", out["device_busy_ms"], "ms of span",
          out["trace_span_ms"], "ms")
    for r in out["leaf_ops_top25_2iters"][:15]:
        print(f"  {r['ms']:8.2f} ms {r['pct_busy']:5.1f}%  {r['op'][:80]}")

    # ---- 3) whole-spectrum A/B: 4x8 vs 2x16 (same 32 sequences) ---------
    for nb, bsz in ((4, 8), (2, 16)):
        data = random_token_batches(nb, bsz, seq_len, cfg.vocab_size, seed=0)
        bd = [
            {"input_ids": jnp.asarray(data["input_ids"][i])} for i in range(nb)
        ]
        r = dataset_spectrum_host(  # warm/compile
            loss_fn, params, bd, 2, key=jax.random.PRNGKey(42),
            flattener=fl, precision="high", fused=True,
        )
        np.asarray(r.alphas)
        t0 = time.perf_counter()
        r = dataset_spectrum_host(
            loss_fn, params, bd, iters, key=jax.random.PRNGKey(7),
            flattener=fl, precision="high", fused=True,
        )
        a = np.asarray(r.alphas)
        b = np.asarray(r.betas)
        wall = time.perf_counter() - t0
        T = np.diag(a) + np.diag(b, 1) + np.diag(b, -1)
        ev = np.linalg.eigvalsh(T)
        t = wall / (iters * nb)  # steady-state per batch-HVP (fused path)
        flops, bytes_acc = costs[bsz]
        t_compute = flops / (PEAK_TFLOPS_BF16 * 1e12)
        t_memory = bytes_acc / (PEAK_HBM_GBS * 1e9)
        out[f"spectrum_{nb}x{bsz}"] = {
            "wall_s": round(wall, 2),
            "sec_per_hvp": round(t, 4),
            "lambda_max": float(ev[-1]),
            "lambda_min": float(ev[0]),
            "xla_flops_per_hvp": flops,
            "xla_bytes_accessed_per_hvp": bytes_acc,
            "arithmetic_intensity_flops_per_byte": round(
                flops / bytes_acc, 1
            ),
            "ridge_intensity_needed_for_mixed_roof": round(
                125.0e12 / (PEAK_HBM_GBS * 1e9), 1
            ),
            "achieved_tflops_xla": round(flops / t / 1e12, 1),
            "achieved_hbm_gbs_at_xla_bytes": round(bytes_acc / t / 1e9, 1),
            "roofline_floor_sec_compute_at_bf16peak": round(t_compute, 4),
            "roofline_floor_sec_hbm_at_xla_bytes": round(t_memory, 4),
            "binding": "hbm" if t_memory > t_compute else "compute",
        }
        print(f"[spectrum {nb}x{bsz}] {wall:.2f}s "
              f"({t*1e3:.0f} ms/HVP)  ev=({ev[0]:.3f},{ev[-1]:.3f})")
        print(json.dumps(out[f"spectrum_{nb}x{bsz}"], indent=1))

    path = sys.argv[1] if len(sys.argv) > 1 else "artifacts/mfu_r4/roofline.json"
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()
