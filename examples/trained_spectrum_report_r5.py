"""Finalize the ROUND-5 trained-checkpoint landscape artifact.

VERDICT r4 #1: the trained-endpoint bulk/blockwise landscape was still
characterized at the precision round 4 itself invalidated ('high' errs
0.44 on this checkpoint).  Round 5 recomputes everything at the
auto-certified faithful tier (blocks-X6 + head high) on the regenerated
checkpoints (artifacts/trained124m_r4/ckpt{1000,2000}):

* step-1000 and step-2000 deflated-KPM two-scale densities (exact
  residual-certified spikes + KPM bulk of the deflated operator),
  ``--hvp_precision auto`` end to end (the persisted plan file is part
  of the artifact);
* converged tight-tolerance thick-restart extremes from two independent
  probe seeds (997 / 1999) — the certification that settled the
  λmax question (see summary['lambda_max_provenance']);
* the 15-group block sweep at pinned blocks-X6.

Usage:
  python examples/trained_spectrum_report_r5.py [artifacts/trained124m_r5]
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _slq(npz):
    ev = np.asarray(npz["eigvals"], np.float64)
    ga = np.asarray(npz["gammas"], np.float64)
    return {
        "lambda_max": float(ev.max()),
        "lambda_min": float(ev.min()),
        "trace_estimate": float(ev @ ga),
        "weight_sum": float(ga.sum()),
        "num_ritz": int(ev.size),
        "top5": np.sort(ev)[-5:].tolist(),
    }


def _kpm_block(npz):
    from hessian_llm_vision_tpu.krylov.kpm import KPMDensity

    out = {
        "deflate_eigvals": np.asarray(
            npz["meta_kpm_deflate_eigvals"], np.float64
        ).tolist(),
        "deflate_residuals": np.asarray(
            npz["meta_kpm_deflate_residuals"], np.float64
        ).tolist(),
        "deflate_converged": bool(int(npz["meta_kpm_deflate_converged"])),
        "kpm_center": float(npz["meta_kpm_center"]),
        "kpm_radius": float(npz["meta_kpm_radius"]),
        "kpm_probes": int(npz["meta_kpm_probes"]),
    }
    dens = KPMDensity(
        moments=np.asarray(npz["meta_kpm_moments"], np.float64),
        raw_moments=np.asarray(npz["meta_kpm_raw_moments"], np.float64),
        center=out["kpm_center"],
        radius=out["kpm_radius"],
        num_probes=out["kpm_probes"],
    )
    grid = np.linspace(
        dens.center - dens.radius, dens.center + dens.radius, 4001
    )
    rho = np.maximum(dens.density(grid), 0.0)
    mass = rho / max(rho.sum(), 1e-300)
    cdf = np.cumsum(mass)
    lo = float(grid[int(np.searchsorted(cdf, 0.001))])
    hi = float(grid[int(np.searchsorted(cdf, 0.999))])
    out["bulk_range_998"] = [lo, hi]
    spikes = np.asarray(out["deflate_eigvals"], np.float64)
    out["spike_detachment"] = float(np.abs(spikes).max() / max(abs(lo), hi))
    return out, dens, grid, rho


def main():
    art = sys.argv[1] if len(sys.argv) > 1 else "artifacts/trained124m_r5"
    s1000 = np.load(os.path.join(art, "spec_step1000_auto.npz"))
    s2000 = np.load(os.path.join(art, "spec_step2000_auto.npz"))
    k1000, _, _, _ = _kpm_block(s1000)
    k2000, dens, grid, rho = _kpm_block(s2000)

    summary = {
        "protocol": {
            "model": "gpt2-124M",
            "dataset": "local:/usr/local/lib/python3.12 (byte-level real text)",
            "checkpoints": "artifacts/trained124m_r4/ckpt{1000,2000} "
            "(regenerated round 5; training EMAs match round 3/4 to 1e-4)",
            "spectrum": "35-iter fused host-loop SLQ, 8xbs4/seq512 "
            "real-text batches, --hvp_precision auto (resolved blocks-X6 + "
            "head high on BOTH checkpoints; plan persisted, see "
            "ckpt2000.autoprec.json) + --kpm 60 --kpm_probes 2 "
            "--kpm_deflate 4 --tr_dtype bfloat16",
            "scripts": ".logs/trained124m_r5.sh, .logs/r5_phase2.sh",
        },
        "auto_tier_step1000_err": 4.97e-5,
        "auto_tier_step2000_err": 3.04e-4,
        "step1000": _slq(s1000),
        "step2000": _slq(s2000),
        "step1000_kpm": k1000,
        "step2000_kpm": k2000,
    }

    # converged tight-tol thick-restart extremes, two independent seeds
    trlan = {}
    for seed in (997, 1999):
        p = os.path.join(art, f"trlan2000_x6_seed{seed}.npz")
        if os.path.exists(p):
            d = np.load(p)
            ev = np.sort(np.asarray(d["eigvals"], np.float64))
            trlan[f"seed{seed}"] = ev.tolist()
    summary["trlan2000_x6_seeds"] = trlan
    if len(trlan) == 2:
        a, b = (np.asarray(v) for v in trlan.values())
        summary["trlan_seed_agreement_rel"] = float(
            np.max(np.abs(a - b) / np.maximum(np.abs(a), 1e-30))
        )
    summary["lambda_max_provenance"] = (
        "certified lambda_max of THIS checkpoint instance = the converged "
        "thick-restart value (independent seeds agree; kpm_deflate's "
        "largest spike matches to ~1e-4).  Round 4 certified 1.5702e6 on "
        "ITS OWN regenerated ckpt2000 instance: three of four extreme "
        "spikes agree across instances to <=0.6% while the top "
        "(embedding) spike moved ~20% — the sharpened endpoint's top "
        "eigenvalue is training-trajectory-instance sensitive even when "
        "loss EMAs match to 1e-4."
    )

    # 15-group block sweep at pinned blocks-X6
    blocks_path = os.path.join(art, "blocks", "layerwise_summary.json")
    if os.path.exists(blocks_path):
        with open(blocks_path) as f:
            summary["blocks_x6"] = json.load(f)

    # the persisted-plan reuse evidence (item 5 measured on this workload)
    plan_path = os.path.join(art, "ckpt2000.autoprec.json")
    if os.path.exists(plan_path):
        with open(plan_path) as f:
            plan = json.load(f)
        summary["persisted_plan"] = {
            "fingerprint_kind": plan["fingerprint"].split(":")[0],
            "winning_tier": plan["plan"]["label"],
            "arms_probed": [a["label"] for a in plan["plan"]["arms"]],
            "reuse_log": ".logs/spec124m_r5_s2000_reuse3.log — 'reusing "
            "persisted plan ... 0 probe HVPs' on the real trained-ckpt job",
        }

    out = os.path.join(art, "summary.json")
    with open(out, "w") as f:
        json.dump(summary, f, indent=2)
    print(f"summary -> {out}")

    # ---- figure: faithful two-scale density + sharpness growth ----------
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(11, 4))
    xs = [1000, 2000]
    ax1.semilogy(
        xs,
        [summary["step1000"]["lambda_max"], summary["step2000"]["lambda_max"]],
        "o-", color="tab:blue", label=r"$\lambda_{\max}$ (X6, SLQ)",
    )
    spikes2000 = np.asarray(k2000["deflate_eigvals"])
    ax1.semilogy(
        [2000], [np.abs(spikes2000).max()], "s", color="tab:green",
        label="converged spike (certified)",
    )
    ax1.semilogy(
        xs,
        [max(map(abs, k1000["bulk_range_998"])),
         max(map(abs, k2000["bulk_range_998"]))],
        "^--", color="tab:orange", label="bulk edge (deflated KPM)",
    )
    ax1.set_xlabel("Adam step")
    ax1.set_title("two-scale growth at the faithful tier")
    ax1.legend(fontsize=8)

    ax2.plot(grid, rho, color="tab:blue", lw=1)
    for s in spikes2000:
        ax2.axvline(s, color="tab:red", ls=":", alpha=0.8)
    ax2.set_yscale("log")
    ax2.set_xlabel(r"$\lambda$")
    ax2.set_title("step 2000: deflated-KPM bulk + certified spikes (X6)")
    fig.tight_layout()
    fpath = os.path.join(art, "two_scale_r5.png")
    fig.savefig(fpath, dpi=120)
    print(f"figure -> {fpath}")


if __name__ == "__main__":
    main()
