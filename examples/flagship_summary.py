"""Summarize the flagship 124M LanczosSGD-vs-Adam runs into one artifact.

Reads the PickleStatsLogger streams of two training runs (the reference's
``training_stats.pkl`` format), writes a loss-curve PNG + a JSON summary
(first/final/min loss, EMA, mean step time, measured LanczosSGD overhead)
— the round-2 equivalent of the reference's
results/tensorboard_longlanczos_logs artifact
(/root/reference/gpt2_hessian_gpu.py:209-240, BASELINE.md rows).

Usage:
  python examples/flagship_summary.py <adam_stats.pkl> <lanczos_stats.pkl> <outdir>
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hessian_llm_vision_tpu.obs.loggers import PickleStatsLogger  # noqa: E402


def load_curve(path):
    rows = PickleStatsLogger.read(path)
    steps = np.asarray([r["step"] for r in rows])
    loss = np.asarray([r["loss"] for r in rows])
    ema = np.asarray([r.get("ema_loss") or r["loss"] for r in rows])
    dt = np.asarray([r["step_time"] for r in rows])
    return steps, loss, ema, dt


def stats(steps, loss, ema, dt):
    return {
        "steps_logged": int(len(steps)),
        "last_step": int(steps[-1]),
        "first_loss": float(loss[0]),
        "final_loss": float(loss[-1]),
        "min_loss": float(loss.min()),
        "final_ema": float(ema[-1]),
        # drop the first interval (contains compile time)
        "mean_step_sec": float(dt[1:].mean()) if len(dt) > 1 else float(dt[0]),
        # robust to the compile-time first row and artifact-save last row;
        # refresh-amortized cost still included via the mean above
        "median_step_sec": float(np.median(dt[1:])) if len(dt) > 1 else float(dt[0]),
    }


def main():
    adam_pkl, lanczos_pkl, outdir = sys.argv[1], sys.argv[2], sys.argv[3]
    os.makedirs(outdir, exist_ok=True)
    a = load_curve(adam_pkl)
    l = load_curve(lanczos_pkl)
    sa, sl = stats(*a), stats(*l)
    overhead = sl["mean_step_sec"] / sa["mean_step_sec"] - 1.0
    summary = {
        "workload": "GPT-2 124M, byte-level local corpus (real on-disk text), "
        f"bs=8 seq=512, {sl['last_step'] + 1} steps, single real TPU chip",
        "adam": sa,
        "lanczos_sgd": sl,
        "lanczos_overhead_vs_adam": round(overhead, 4),
        "reference_baseline": "results/tensorboard_longlanczos_logs: "
        "10.72 -> 3.85/1.36 over 1284 steps on 4x GPU (BASELINE.md); "
        "LanczosSGD/Adam step ratio ~18x on A100 at k=100",
    }
    with open(os.path.join(outdir, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary, indent=2))

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(8, 4.5))
    ax.plot(a[0], a[2], label=f"Adam (final ema {sa['final_ema']:.2f})")
    ax.plot(l[0], l[2], label=f"LanczosSGD k=10 (final ema {sl['final_ema']:.2f})")
    ax.plot(a[0], a[1], alpha=0.25, lw=0.7, color="C0")
    ax.plot(l[0], l[1], alpha=0.25, lw=0.7, color="C1")
    ax.set_xlabel("step")
    ax.set_ylabel("loss (EMA 0.99 bold)")
    ax.set_title("GPT-2 124M on real text — spectrum-aware vs Adam (1 TPU chip)")
    ax.legend()
    fig.tight_layout()
    png = os.path.join(outdir, "loss_curves.png")
    fig.savefig(png, dpi=130)
    print(f"plot -> {png}")


if __name__ == "__main__":
    main()
