"""Render a layer-wise spectrum artifact set as a table + depth plot.

Input: the ``<prefix>_<leaf>.npz`` files written by
``spectrum --layerwise --out_spectrum <prefix>`` (one block spectrum per
parameter leaf).  Output: a sorted per-layer λmax/λmin table on stdout, a
JSON summary, and a λmax-by-depth plot — the analysis the reference
printed inline during layer-wise Lanczos training
(/root/reference/lanczostrain_layer_hand.py:183-185) and explored in
``Layer Hessian concept test.ipynb``.

Usage:
  python examples/layerwise_table.py <prefix> <outdir>
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hessian_llm_vision_tpu.io import load_spectrum  # noqa: E402


def main():
    prefix, outdir = sys.argv[1], sys.argv[2]
    os.makedirs(outdir, exist_ok=True)
    rows = []
    for path in sorted(glob.glob(prefix + "_*.npz")):
        leaf = os.path.basename(path)[len(os.path.basename(prefix)) + 1 : -4]
        spec = load_spectrum(path)
        ev = np.sort(np.asarray(spec.eigvals))
        # per-leaf artifacts ("h_0.attn..."), per-block ones ("h_0",
        # "layer_0" from --layerwise_group block), any family naming
        m = re.match(r"(?:h|blocks?|layers?)_(\d+)(?:\.|$)", leaf)
        rows.append(
            {
                "leaf": leaf,
                "depth": int(m.group(1)) if m else None,
                "lambda_max": float(ev[-1]),
                "lambda_min": float(ev[0]),
            }
        )
    if not rows:
        raise SystemExit(f"no spectra matching {prefix}_*.npz")

    rows.sort(key=lambda r: -r["lambda_max"])
    print(f"{'leaf':55s} {'λmax':>10s} {'λmin':>10s}")
    for r in rows:
        print(f"{r['leaf']:55s} {r['lambda_max']:10.4f} {r['lambda_min']:10.4f}")

    with open(os.path.join(outdir, "layerwise_summary.json"), "w") as f:
        json.dump(rows, f, indent=2)

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    by_depth = {}
    for r in rows:
        if r["depth"] is not None:
            by_depth.setdefault(r["depth"], []).append(r["lambda_max"])
    if by_depth:
        depths = sorted(by_depth)
        fig, ax = plt.subplots(figsize=(7, 4))
        ax.plot(depths, [max(by_depth[d]) for d in depths], "o-",
                label="max over leaves")
        ax.plot(depths, [float(np.median(by_depth[d])) for d in depths], "s--",
                label="median over leaves")
        ax.set_xlabel("transformer block depth")
        ax.set_ylabel("block λmax")
        ax.set_yscale("symlog", linthresh=1e-2)
        ax.set_title("Per-layer Hessian λmax by depth")
        ax.legend()
        fig.tight_layout()
        fig.savefig(os.path.join(outdir, "layerwise_lambda_max.png"), dpi=130)
        print(f"plot -> {outdir}/layerwise_lambda_max.png")


if __name__ == "__main__":
    main()
