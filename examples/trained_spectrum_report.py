"""Finalize the trained-checkpoint spectrum artifact (train -> savehessian).

The reference's central workflow is: train GPT-2, checkpoint, then run
Lanczos on the checkpointed Hessian (gpt2_adam_raw.py -> the
gpt2_savehessian.py `--checkpoint` path, load_model.py:96-140).  The
``artifacts/trained124m_r3`` run reproduces it end-to-end on one TPU chip:
2x1000 Adam steps on the real local byte-level corpus (with a state
save/resume boundary at step 1000), then SLQ + deflated-KPM spectra of the
step-1000 and step-2000 checkpoints.

This script distills the run into ``summary.json`` + the headline figure:

* sharpness growth through training: lambda_max 4.96 (random init, same
  loss/scale protocol — artifacts/kpm_deflate124m_r3) -> 1.01e4 (step
  1000) -> 3.69e5 (step 2000);
* the step-2000 two-scale picture: 4 exact (residual-certified) outlier
  spikes DETACHED from the KPM bulk — the trained-checkpoint structure the
  reference observes in its trained spectra (GPT2 spectrum.ipynb) and the
  regime artifacts/kpm_deflate124m_r3's README predicted deflation pays
  off in;
* the measured precision A/B: on trained checkpoints the 'mixed'
  (blocks-at-bf16) HVP precision — validated to <=5e-4 extreme-Ritz error
  at random init — breaks down (lambda_max 5.8x inflated at step 2000);
  'high' (bf16x3) agrees with 'strict' (f32 HIGHEST) to 9e-5.  The
  spectrum CLI default is 'high'; this artifact is why it stays that way.

Usage:
  python examples/trained_spectrum_report.py [artifacts/trained124m_r3]
"""

from __future__ import annotations

import json
import os
import re
import sys

import numpy as np


def _slq(npz):
    ev, ga = np.asarray(npz["eigvals"], np.float64), np.asarray(npz["gammas"], np.float64)
    return {
        "lambda_max": float(ev.max()),
        "lambda_min": float(ev.min()),
        "trace_estimate": float(ev @ ga),
        "weight_sum": float(ga.sum()),
        "num_ritz": int(ev.size),
        "top5": np.sort(ev)[-5:].tolist(),
    }


def _parse_train_log(path):
    """(steps, losses, emas) from a cli.train log; [] if the log is absent."""
    steps, losses, emas = [], [], []
    if not os.path.exists(path):
        return steps, losses, emas
    pat = re.compile(r"^step (\d+)\s+loss ([\d.]+)\s+ema ([\d.]+)")
    with open(path) as f:
        for line in f:
            m = pat.match(line)
            if m:
                steps.append(int(m.group(1)))
                losses.append(float(m.group(2)))
                emas.append(float(m.group(3)))
    return steps, losses, emas


def main():
    art = sys.argv[1] if len(sys.argv) > 1 else "artifacts/trained124m_r3"
    s1000 = np.load(os.path.join(art, "spec_step1000_high.npz"))
    s2000 = np.load(os.path.join(art, "spec_step2000_high_kpm.npz"))
    # mixed-precision runs of the SAME checkpoints (the A/B's broken arm)
    s1000_mixed = np.load(os.path.join(art, "spec_step1000.npz"))
    s2000_mixed = np.load(os.path.join(art, "spec_step2000.npz"))

    summary = {
        "protocol": {
            "model": "gpt2-124M",
            "dataset": "local:/usr/local/lib/python3.12 (byte-level real text)",
            "train": "Adam lr 1e-3, bs8/seq512, 0->1000 steps, state-resume, "
                     "1000->2000 steps (logs: .logs/train124m_s{1000,2000}.log)",
            "spectrum": "35-iter fused host-loop SLQ, 8xbs4/seq512 real-text "
                        "batches, --hvp_precision high; step 2000 adds "
                        "--kpm 60 --kpm_probes 2 --kpm_deflate 4",
        },
        "train_loss_init": 11.0492,     # .logs/train124m_s1000.log step 0
        "train_loss_ema_step1000": None,  # filled from logs below when present
        "train_loss_ema_step2000": None,
        "lambda_max_init_protocol": 4.960876,  # artifacts/kpm_deflate124m_r3 (random init, random tokens)
        "step1000": _slq(s1000),
        "step2000": _slq(s2000),
        "step2000_kpm": {
            "deflate_eigvals": np.asarray(s2000["meta_kpm_deflate_eigvals"]).tolist(),
            "deflate_residuals": np.asarray(s2000["meta_kpm_deflate_residuals"]).tolist(),
            "deflate_converged": bool(np.asarray(s2000["meta_kpm_deflate_converged"])),
            "kpm_center": float(s2000["meta_kpm_center"]),
            "kpm_radius": float(s2000["meta_kpm_radius"]),
            "kpm_probes": int(s2000["meta_kpm_probes"]),
        },
        # mixed (blocks bf16) vs high (bf16x3) vs strict (f32 HIGHEST) on the
        # SAME step-2000 checkpoint + batches + probe.  strict values are the
        # 10-iter run in .logs/spec124m_s2000_strict.log (350.9 s — why it is
        # the referee, not the default).
        "precision_ab_step2000": {
            "mixed_lambda_max": _slq(s2000_mixed)["lambda_max"],
            "high_lambda_max": _slq(s2000)["lambda_max"],
            "strict10_lambda_max": 369216.59375,
            "strict10_lambda_min": -311993.125,
            "mixed_over_high_ratio": _slq(s2000_mixed)["lambda_max"] / _slq(s2000)["lambda_max"],
            "high_vs_strict_rel": abs(_slq(s2000)["lambda_max"] - 369216.59375) / 369216.59375,
        },
        "precision_ab_step1000": {
            "mixed_lambda_max": _slq(s1000_mixed)["lambda_max"],
            "high_lambda_max": _slq(s1000)["lambda_max"],
        },
    }

    # spike-vs-bulk detachment: the trained-checkpoint structure
    spikes = np.asarray(summary["step2000_kpm"]["deflate_eigvals"], np.float64)
    # bulk edge = where the deflated KPM density's support ends (report run:
    # [-214734, 196863]); recompute from moments for reproducibility
    from hessian_llm_vision_tpu.krylov.kpm import KPMDensity

    dens = KPMDensity(
        moments=np.asarray(s2000["meta_kpm_moments"], np.float64),
        raw_moments=np.asarray(s2000["meta_kpm_raw_moments"], np.float64),
        center=summary["step2000_kpm"]["kpm_center"],
        radius=summary["step2000_kpm"]["kpm_radius"],
        num_probes=summary["step2000_kpm"]["kpm_probes"],
    )
    grid = np.linspace(dens.center - dens.radius, dens.center + dens.radius, 4001)
    rho = np.maximum(dens.density(grid), 0.0)
    mass = rho / max(rho.sum(), 1e-300)
    cdf = np.cumsum(mass)
    bulk_lo = float(grid[int(np.searchsorted(cdf, 0.001))])
    bulk_hi = float(grid[int(np.searchsorted(cdf, 0.999))])
    summary["step2000_kpm"]["bulk_range_998"] = [bulk_lo, bulk_hi]
    summary["step2000_kpm"]["spike_detachment"] = float(spikes.max() / bulk_hi)

    for tag, log in (("step1000", ".logs/train124m_s1000.log"),
                     ("step2000", ".logs/train124m_s2000.log")):
        _, _, emas = _parse_train_log(log)
        if emas:
            summary[f"train_loss_ema_{tag}"] = emas[-1]

    out = os.path.join(art, "summary.json")
    with open(out, "w") as f:
        json.dump(summary, f, indent=2)
    print(f"summary -> {out}")

    # ---- figure: sharpness growth + the two-scale trained spectrum --------
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(11, 4))

    xs = [0, 1000, 2000]
    ys = [summary["lambda_max_init_protocol"],
          summary["step1000"]["lambda_max"],
          summary["step2000"]["lambda_max"]]
    ax1.semilogy(xs, ys, "o-", color="tab:blue", label="high (bf16x3)")
    mixed = [summary["lambda_max_init_protocol"],
             summary["precision_ab_step1000"]["mixed_lambda_max"],
             summary["precision_ab_step2000"]["mixed_lambda_max"]]
    ax1.semilogy(xs, mixed, "x--", color="tab:red", alpha=0.7,
                 label="mixed (blocks bf16) — inflated")
    ax1.semilogy([2000], [summary["precision_ab_step2000"]["strict10_lambda_max"]],
                 "s", color="tab:green", label="strict (f32)")
    ax1.set_xlabel("Adam step")
    ax1.set_ylabel(r"$\lambda_{\max}$ (SLQ)")
    ax1.set_title("GPT-2 124M sharpness through training")
    ax1.legend(fontsize=8)
    ax1.grid(alpha=0.3)

    ax2.fill_between(grid, rho, color="tab:blue", alpha=0.4,
                     label="KPM bulk (deflated op)")
    for i, s in enumerate(spikes):
        ax2.axvline(s, color="tab:red", lw=1.2,
                    label="exact spikes (thick restart)" if i == 0 else None)
    slq_ev = np.asarray(s2000["eigvals"], np.float64)
    slq_ga = np.asarray(s2000["gammas"], np.float64)
    ax2.stem(slq_ev, slq_ga * rho.max() / max(slq_ga.max(), 1e-30),
             linefmt="grey", markerfmt="k.", basefmt=" ",
             label="SLQ nodes (scaled)")
    ax2.set_xlabel(r"$\lambda$")
    ax2.set_yticks([])
    ax2.set_title("step 2000: detached outliers + bulk")
    ax2.legend(fontsize=8)

    fig.tight_layout()
    png = os.path.join(art, "spectra_through_training.png")
    fig.savefig(png, dpi=130)
    print(f"figure -> {png}")
    print(json.dumps({k: summary[k] for k in
                      ("precision_ab_step2000", "step2000_kpm")}, indent=2))


if __name__ == "__main__":
    main()
