"""Certified precision-arm measurement on a trained checkpoint.

Round-4 measurement driver for the auto-precision design.  The round-3
probe (no-reorth 10-iter T extremes) is CHAOTIC at trained-checkpoint
conditioning; worse, the round-3 *headline* spectra disagree between
precisions at 124M ckpt2000 (35-iter dataset-mean λmax: 3.69e5 at
"high" vs 1.88e6 at "highest" — a 5.1× gap on bit-identical operators
up to matmul precision).  This script produces precision-INDEPENDENT
evidence for which arm to trust:

per arm (mixed / op-splits / strict-high / fast / referee-f32):
  1. run a CGS2-REORTHOGONALIZED k-iter Lanczos on the batch operator at
     that arm's precision, keeping the (bf16-stored) basis;
  2. extract the extreme Ritz PAIRS (θ, v);
  3. certify against the F32 REFEREE matvec: Rayleigh quotient
     ρ_ref(v) = vᵀH_ref v and residual ‖H_ref v − ρv‖.
     ρ_ref(v) is a hard lower bound on λmax(H_ref) for ANY unit v, so an
     arm whose vmax has ρ_ref ≈ θ_arm ≈ θ_ref found a true eigenpair; an
     arm whose θ_arm >> ρ_ref(v_arm) manufactured curvature from
     rounding noise; θ_ref > θ_arm ≈ ρ_ref means the arm MISSED a true
     direction.

Writes one JSON.  Run on the real TPU (one job at a time).

Usage:
    python examples/probe_precision_arms.py \
        --checkpoint artifacts/trained124m_r4/ckpt2000 \
        --out artifacts/trained124m_r4/precision_arms.json
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


def reorth_lanczos_with_basis(batch_hvp, v0, params, batch, k):
    """k-iter CGS2 Lanczos; returns (alphas, betas, Q[bf16 (k,P)])."""
    from hessian_llm_vision_tpu.krylov.driver import (
        _jitted_reorth_recurrence_step,
    )

    step = _jitted_reorth_recurrence_step(k, jnp.bfloat16)
    Q = jnp.zeros((k, v0.shape[0]), jnp.bfloat16)
    q_cur, q_prev = v0, jnp.zeros_like(v0)
    beta_prev = jnp.float32(0.0)
    alphas, betas = [], []
    for i in range(k):
        w = batch_hvp(q_cur, params, batch)
        alpha, beta, q_next, Q = step(
            w, Q, jnp.int32(i), q_cur, q_prev, beta_prev
        )
        q_prev, q_cur, beta_prev = q_cur, q_next, beta
        alphas.append(alpha)
        betas.append(beta)
    a = np.asarray(jnp.stack(alphas), np.float64)
    b = np.asarray(jnp.stack(betas[:-1]), np.float64)
    return a, b, Q


_ritz_vec = jax.jit(
    lambda Q, s: jnp.einsum("kp,k->p", Q.astype(jnp.float32), s)
)
_rq_stats = jax.jit(
    lambda w, v: (jnp.vdot(v, w), jnp.linalg.norm(v))
)
_resid = jax.jit(
    lambda w, v, rho: jnp.linalg.norm(w - rho * v) / jnp.maximum(
        jnp.abs(rho), 1e-30
    )
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--batch_size", type=int, default=4)
    ap.add_argument("--batch_index", type=int, default=0)
    args = ap.parse_args()

    import os

    cache = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from hessian_llm_vision_tpu.data import load_local_corpus
    from hessian_llm_vision_tpu.io import load_checkpoint
    from hessian_llm_vision_tpu.krylov.autoprec import (
        op_split_candidates,
        spec_to_overrides,
    )
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
    )  # pre-batched: (num_batches, batch_size, T)
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
        hvp(v0, params, batch).block_until_ready()  # warm (compile)
        t0 = time.perf_counter()
        a, b, Q = reorth_lanczos_with_basis(
            hvp, v0, params, batch, args.iters
        )
        probe_sec = time.perf_counter() - t0
        T = np.diag(a) + np.diag(b, 1) + np.diag(b, -1)
        ev, es = np.linalg.eigh(T)
        out = {"spec": repr(spec), "hvp_precision": hvp_prec,
               "lambda_min": float(ev[0]), "lambda_max": float(ev[-1]),
               "probe_sec_per_iter": probe_sec / args.iters}
        # certify extreme Ritz pairs under the F32 referee matvec
        for tag, idx in (("max", -1), ("min", 0)):
            v = _ritz_vec(Q, jnp.asarray(es[:, idx], jnp.float32))
            v = v / jnp.linalg.norm(v)
            w = ref_hvp(v, params, batch)
            rho, _ = _rq_stats(w, v)
            rel_res = _resid(w, v, rho)
            out[f"rq_ref_{tag}"] = float(rho)
            out[f"relres_ref_{tag}"] = float(rel_res)
        del Q
        # steady per-dispatch HVP time (chained dependent calls)
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

    ref = run_arm("referee_f32", None, "highest")
    X6 = "BF16_BF16_F32_X6"
    arms = [
        # measured: "highest" on this v5e lowers to the X6 dot algorithm
        # (x6_all reproduced the referee bit-for-bit at identical ms/HVP);
        # X9 is rejected by this libtpu.  The bracketing arms attribute
        # the "high" (3-pass) error between the transformer blocks and
        # the embedding/vocab-head path.
        ("x6_all", None, X6),
        ("strict_high", None, "high"),
        ("blocks_high_rest_x6", {"block_matmul_precision": "high"}, X6),
        ("blocks_x6_rest_high", {"block_matmul_precision": X6}, "high"),
        ("blocks_default_rest_x6", {"block_matmul_precision": "default"}, X6),
        ("mixed", "default", "high"),
    ]
    arms += [(lbl, spec, "high") for lbl, spec in op_split_candidates()]
    arms += [("fast_default", None, "default")]
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
