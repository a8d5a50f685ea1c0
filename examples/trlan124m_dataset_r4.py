"""124M DATASET-MEAN thick-restart eigenpairs on the fused fast path (r4).

Round-3's committed TRLan artifact (artifacts/trlan124m_r3) was
single-batch and host-unfused: 50 matvecs in 155.7 s = 3.1 s/HVP, 22x the
fused bench loop's per-HVP cost — the tunnel round-trip tax of ~4
dispatches + 3 blocking scalar fetches per inner iteration (VERDICT r3
#4).  This run exercises the fix: ``krylov.dataset_thick_restart_host``
drives ONE donating program per inner iteration (dataset-mean HVP scan +
CGS2 + row write, krylov/driver.py::_jitted_fused_trlan_step) with α/β
fetched once per restart cycle, on the DATASET-MEAN operator (the
reference's eigenbases are dataset-level, gpt2_savehessian.py:130-163).

Protocol (matches trlan124m_r3 except single-batch -> 4-batch dataset
mean): GPT-2 124M f32 random init, bs=8, seq=512, byte-level local
corpus, k=5 largest-|lambda|, 16-vector bf16-stored basis, tol 2e-3,
mixed precision (passes the parity bar at init; trained ckpts escalate
via --hvp_precision auto).
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
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "artifacts/trlan124m_r4"
    os.makedirs(out_dir, exist_ok=True)
    cache = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from hessian_llm_vision_tpu.data import load_local_corpus
    from hessian_llm_vision_tpu.krylov import dataset_thick_restart_host
    from hessian_llm_vision_tpu.models import GPT2Config, GPT2LMHead, losses
    from hessian_llm_vision_tpu.utils.flatten import Flattener

    num_batches, batch_size, seq_len = 4, 8, 512
    k, inner, tol = 5, 15, 2e-3
    # mixed precision: blocks 1-pass bf16, head+loss bf16x3 (the bench
    # headline mode; parity-certified at random init)
    cfg = GPT2Config.gpt2_124m(
        n_positions=seq_len, attn_block_q=512, block_matmul_precision="default"
    )
    model = GPT2LMHead(cfg)
    params = model.init_params(jax.random.PRNGKey(0), seq_len=seq_len)
    loss_fn = losses.lm_loss_fn(model, loss_chunk=512)
    fl = Flattener(params)

    corpus = load_local_corpus(
        "/usr/local/lib/python3.12", max_length=seq_len,
        batch_size=batch_size, seed=42,
    )
    batches = [
        {"input_ids": jnp.asarray(corpus["input_ids"][i])}
        for i in range(num_batches)
    ]

    v0 = jax.random.normal(jax.random.PRNGKey(997), (fl.size,), jnp.float32)
    v0 = v0 / jnp.linalg.norm(v0)

    t0 = time.perf_counter()
    res = dataset_thick_restart_host(
        loss_fn, params, batches, k,
        v0=v0, inner=inner, normalization="dataset", batch_size=batch_size,
        precision="high", store_dtype=jnp.bfloat16, which="lm", tol=tol,
        progress=True,
    )
    wall_total = time.perf_counter() - t0
    # compile is one-time (persistent cache); re-run one cycle-sized probe
    # is overkill — report total and the steady-state per-matvec estimate
    print(
        f"[trlan124m_r4] {'converged' if res.converged else 'NOT converged'}"
        f" after {res.restarts} restarts / {res.matvecs} dataset matvecs "
        f"({res.matvecs * num_batches} batch-HVPs) in {wall_total:.1f}s "
        f"(incl. compile)"
    )

    # timed SECOND run, fully warm (the honest wall-clock: artifact claim).
    # Drop the first run's (k, P) Ritz block FIRST: holding 2.5 GB of f32
    # vectors next to the fresh 4 GB basis + the bs8 HVP working set OOMs
    # the chip (measured).
    del res
    import gc

    gc.collect()
    t0 = time.perf_counter()
    res = dataset_thick_restart_host(
        loss_fn, params, batches, k,
        v0=v0, inner=inner, normalization="dataset", batch_size=batch_size,
        precision="high", store_dtype=jnp.bfloat16, which="lm", tol=tol,
        progress=True,
    )
    wall = time.perf_counter() - t0
    print(f"[trlan124m_r4] warm run: {wall:.1f}s for {res.matvecs} matvecs")

    V = res.vectors  # (k, P) f32 on device
    gammas = np.asarray((V @ v0)) ** 2
    gram = np.asarray(V @ V.T)
    sk = jax.random.normal(jax.random.PRNGKey(0), (fl.size, 8), jnp.bfloat16)
    sketch = np.asarray(
        jnp.matmul(V.astype(jnp.bfloat16), sk,
                   preferred_element_type=jnp.float32)
    )

    np.savez(
        os.path.join(out_dir, "spec.npz"),
        eigvals=np.asarray(res.eigvals, np.float32),
        gammas=gammas.astype(np.float32),
        V_gram=gram.astype(np.float32),
        V_sketch8_seed0=sketch.astype(np.float32),
        meta_iters=inner,
        meta_subsample=1.0,
        meta_vector_seed=997,
        meta_tr_matvecs=res.matvecs,
        meta_tr_restarts=res.restarts,
        meta_tr_converged=int(res.converged),
        meta_tr_max_residual=float(res.residuals.max()),
        meta_num_batches=num_batches,
        meta_normalization="dataset",
        meta_wall_s=wall,
    )
    summary = {
        "lambda_max": float(np.max(res.eigvals)),
        "lambda_min": float(np.min(res.eigvals)),
        "trace_estimate": float(np.dot(res.eigvals, gammas)),
        "weight_sum": float(gammas.sum()),
        "num_ritz": int(res.eigvals.size),
        "top5": np.sort(res.eigvals)[-5:].tolist(),
        "tr_matvecs": res.matvecs,
        "tr_restarts": res.restarts,
        "tr_converged": int(res.converged),
        "tr_max_residual": float(res.residuals.max()),
        "wall_s": wall,
        "wall_s_incl_compile": wall_total,
        "batch_hvps": res.matvecs * num_batches,
        "sec_per_dataset_matvec": wall / max(res.matvecs, 1),
        "protocol": "dataset-mean over 4x bs8/seq512 byte-corpus batches, "
        "mixed precision, k=5 lm, inner=15, bf16 basis, tol 2e-3, fused "
        "one-program-per-iteration path (r3 unfused single-batch: 155.7s)",
    }
    with open(os.path.join(out_dir, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main()
