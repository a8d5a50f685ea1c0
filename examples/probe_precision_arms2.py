"""Second-pass X6-level op attribution on the trained checkpoint.

First pass (probe_precision_arms.py) certified: the trained-ckpt
curvature error lives in the transformer BLOCKS' matmul precision —
blocks at X6 + embedding/head at high errs 1.5e-4 vs the f32 referee
(PASSES the 1e-3 bar) while blocks at high errs 4.4e-1 regardless of the
head's precision.  This pass asks WHICH block matmuls need X6:
attention sublayer vs MLP sublayer vs just the attention-core einsums,
each with the rest of the block at high (3-pass).
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from probe_precision_arms import reorth_lanczos_with_basis, _ritz_vec, _rq_stats, _resid


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--batch_size", type=int, default=4)
    ap.add_argument("--batch_index", type=int, default=0)
    args = ap.parse_args()

    cache = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from hessian_llm_vision_tpu.data import load_local_corpus
    from hessian_llm_vision_tpu.io import load_checkpoint
    from hessian_llm_vision_tpu.krylov.autoprec import spec_to_overrides
    from hessian_llm_vision_tpu.krylov.driver import _jitted_batch_hvp
    from hessian_llm_vision_tpu.models import GPT2Config, GPT2LMHead, losses
    from hessian_llm_vision_tpu.utils.flatten import Flattener

    cfg = GPT2Config.gpt2_124m(n_positions=512)
    model = GPT2LMHead(cfg)
    params = model.init_params(jax.random.PRNGKey(0), seq_len=16)
    params = load_checkpoint(args.checkpoint, template=params)
    fl = Flattener(params)
    stacked = load_local_corpus(
        "/usr/local/lib/python3.12", max_length=512,
        batch_size=args.batch_size, seed=42,
    )
    batch = {"input_ids": jnp.asarray(stacked["input_ids"][args.batch_index])}

    def make_loss_fn(spec):
        m = GPT2LMHead(dataclasses.replace(cfg, **spec_to_overrides(spec)))
        return losses.lm_loss_fn(m)

    key = jax.random.PRNGKey(101)
    v0 = jax.random.normal(key, (fl.size,), jnp.float32)
    v0 = v0 / jnp.linalg.norm(v0)
    ref_hvp = _jitted_batch_hvp(make_loss_fn(None), "mean", "highest", fl)

    results = {"iters": args.iters, "batch_index": args.batch_index,
               "checkpoint": args.checkpoint, "arms": {}}

    def run_arm(name, spec, hvp_prec):
        hvp = _jitted_batch_hvp(make_loss_fn(spec), "mean", hvp_prec, fl)
        hvp(v0, params, batch).block_until_ready()
        a, b, Q = reorth_lanczos_with_basis(hvp, v0, params, batch, args.iters)
        T = np.diag(a) + np.diag(b, 1) + np.diag(b, -1)
        ev, es = np.linalg.eigh(T)
        out = {"spec": repr(spec), "hvp_precision": hvp_prec,
               "lambda_min": float(ev[0]), "lambda_max": float(ev[-1])}
        for tag, idx in (("max", -1), ("min", 0)):
            v = _ritz_vec(Q, jnp.asarray(es[:, idx], jnp.float32))
            v = v / jnp.linalg.norm(v)
            w = ref_hvp(v, params, batch)
            rho, _ = _rq_stats(w, v)
            out[f"rq_ref_{tag}"] = float(rho)
            out[f"relres_ref_{tag}"] = float(_resid(w, v, rho))
        del Q
        w = hvp(v0, params, batch)
        w.block_until_ready()
        t0 = time.perf_counter()
        for _ in range(5):
            w = hvp(w / jnp.linalg.norm(w), params, batch)
        jnp.vdot(w, w).block_until_ready()
        out["hvp_dispatch_sec"] = (time.perf_counter() - t0) / 5
        results["arms"][name] = out
        print(f"[{name}] theta=({out['lambda_min']:.6g}, "
              f"{out['lambda_max']:.6g}) rq_ref=({out['rq_ref_min']:.6g}, "
              f"{out['rq_ref_max']:.6g}) relres=({out['relres_ref_min']:.2e}, "
              f"{out['relres_ref_max']:.2e}) hvp {out['hvp_dispatch_sec']*1e3:.0f} ms")
        return out

    X6 = "BF16_BF16_F32_X6"
    ref = run_arm("referee_f32", None, "highest")
    arms = [
        ("scores_x6_rest_high",
         {"block_matmul_precision": "high", "attn_scores_precision": X6},
         "high"),
        ("attn_x6_mlp_high",
         {"block_matmul_precision": "high", "attn_matmul_precision": X6},
         "high"),
        ("mlp_x6_attn_high",
         {"block_matmul_precision": "high", "mlp_matmul_precision": X6},
         "high"),
        ("blocks_x6_rest_high", {"block_matmul_precision": X6}, "high"),
    ]
    for name, spec, prec in arms:
        out = run_arm(name, spec, prec)
        scale = max(abs(ref["lambda_min"]), abs(ref["lambda_max"]))
        out["ritz_rel_err_vs_ref"] = max(
            abs(out["lambda_min"] - ref["lambda_min"]),
            abs(out["lambda_max"] - ref["lambda_max"]),
        ) / scale
        print(f"    -> extreme-Ritz err vs referee: "
              f"{out['ritz_rel_err_vs_ref']:.3e}")

    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
