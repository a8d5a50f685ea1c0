"""KPM spectral density of the GPT-2 124M Hessian, on one real chip.

Bench-protocol operator (bs8/seq512 x 4 batches, random tokens, mixed
precision: blocks 1-pass bf16 + vocab head/loss bf16x3) — the same
dataset-mean Hessian whose SLQ spectrum bench.py times.  KPM gives the
complementary view: a smooth density over the WHOLE support from
Chebyshev moments, at one matvec per moment and 2 P-vectors of memory
(krylov/kpm.py).  One TPU job at a time (CLAUDE.md).

Writes artifacts/kpm124m_r3/{moments.npz, density.png} + stdout summary.
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

from hessian_llm_vision_tpu.cli.common import maybe_force_cpu


def main():
    class _A:
        cpu = "--cpu" in sys.argv

    maybe_force_cpu(_A())

    from hessian_llm_vision_tpu.curvature import DatasetHessianOperator
    from hessian_llm_vision_tpu.data import random_token_batches
    from hessian_llm_vision_tpu.krylov import kpm_density
    from hessian_llm_vision_tpu.models import GPT2Config, GPT2LMHead, losses
    from hessian_llm_vision_tpu.utils.flatten import Flattener

    num_batches, batch_size, seq_len = 4, 8, 512
    moments, probes = 80, 2

    cfg = GPT2Config.gpt2_124m(
        n_positions=seq_len, dtype=jnp.float32, attn_block_q=512,
        block_matmul_precision="default",  # bench.py mixed headline mode
    )
    model = GPT2LMHead(cfg)
    params = model.init_params(jax.random.PRNGKey(0), seq_len=seq_len)
    loss_fn = losses.lm_loss_fn(model, loss_chunk=512)
    fl = Flattener(params)

    data = random_token_batches(
        num_batches, batch_size, seq_len, cfg.vocab_size, seed=0
    )
    stacked = jnp.asarray(data["input_ids"])  # (4, 8, 512)

    # dataset-mean Hessian as ONE scan-over-batches program with explicit
    # params/batches jit args (curvature/operators.py marks the matvec
    # program-backed, so the KPM range estimation's ensure_program never
    # re-jits it — tracing through a closure lowers the 124M params as
    # inline HLO constants, which the remote compiler rejects: HTTP 413)
    op = DatasetHessianOperator(
        loss_fn, params, {"input_ids": stacked},
        normalization="mean", precision="high", flattener=fl,
    )
    matvec = op.matvec

    # warm/compile (one matvec)
    t0 = time.perf_counter()
    jax.block_until_ready(matvec(jnp.zeros((fl.size,), jnp.float32)))
    print(f"compile+first matvec {time.perf_counter() - t0:.1f}s", flush=True)

    t0 = time.perf_counter()
    res = kpm_density(
        matvec, fl.size, moments, jax.random.PRNGKey(7),
        num_probes=probes, progress=True,
    )
    wall = time.perf_counter() - t0
    n_mv = probes * (moments - 1) + 12  # recurrence matvecs + range probe
    print(
        f"KPM {moments} moments x {probes} probes: {wall:.1f}s "
        f"({n_mv * num_batches / wall:.2f} HVPs/s) "
        f"range [{res.center - res.radius:.4f}, {res.center + res.radius:.4f}] "
        f"E[lambda] {res.trace_estimate():.3e}"
    )

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                       "artifacts", "kpm124m_r3")
    os.makedirs(out, exist_ok=True)
    grid = np.linspace(res.center - res.radius * 0.999,
                       res.center + res.radius * 0.999, 4000)
    rho = res.density(grid)
    np.savez(
        os.path.join(out, "moments.npz"),
        moments=res.moments, raw_moments=res.raw_moments,
        center=res.center, radius=res.radius, grid=grid, density=rho,
        num_probes=probes, wall_s=wall,
        protocol=json.dumps({
            "model": "gpt2-124m random-init", "batches": num_batches,
            "batch_size": batch_size, "seq_len": seq_len,
            "precision": "mixed", "moments": moments, "probes": probes,
        }),
    )
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(7, 4))
        ax.semilogy(grid, np.maximum(rho, 1e-8))
        ax.set_xlabel(r"$\lambda$")
        ax.set_ylabel(r"KPM density $\rho(\lambda)$")
        ax.set_title(f"GPT-2 124M Hessian density (KPM, {moments} moments)")
        fig.tight_layout()
        fig.savefig(os.path.join(out, "density.png"), dpi=120)
    except Exception as e:  # plotting is optional
        print(f"plot skipped: {e}")
    print(f"artifact -> {out}")


if __name__ == "__main__":
    main()
