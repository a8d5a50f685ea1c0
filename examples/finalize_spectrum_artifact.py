"""Finalize an at-scale spectrum artifact dir: summary.json + README fill.

Reads ``<dir>/spec.npz`` (written by ``cli.spectrum --out_spectrum``),
computes the headline quantities the golden tests pin (λmax, λmin, trace
estimate, SLQ weight sum), writes ``<dir>/summary.json``, and replaces any
``TBD`` placeholders in ``<dir>/README.md`` with the measured values.

Usage:
  python examples/finalize_spectrum_artifact.py artifacts/llama134m_r3 [wall_s]
"""

from __future__ import annotations

import json
import os
import re
import sys

import numpy as np


def main():
    art = sys.argv[1]
    wall_s = float(sys.argv[2]) if len(sys.argv) > 2 else None
    spec = os.path.join(art, "spec.npz")
    d = np.load(spec)
    ev, ga = np.asarray(d["eigvals"]), np.asarray(d["gammas"])
    summary = {
        "lambda_max": float(ev.max()),
        "lambda_min": float(ev.min()),
        "trace_estimate": float(np.dot(ev, ga)),
        "weight_sum": float(ga.sum()),
        "num_ritz": int(ev.size),
        "top5": np.sort(ev)[-5:].tolist(),
    }
    for k in d.files:  # carry saved metadata (iters, seeds, hutchpp, ...)
        if k not in ("eigvals", "gammas", "V"):
            v = d[k]
            summary[k] = v.item() if getattr(v, "size", 2) == 1 else v.tolist()
            if k.startswith("meta_tr_"):
                # golden contracts read the unprefixed name (tr_converged)
                summary[k[len("meta_"):]] = summary[k]
    if wall_s is not None:
        summary["wall_s"] = wall_s
    out = os.path.join(art, "summary.json")
    with open(out, "w") as f:
        json.dump(summary, f, indent=2)
    print(f"summary -> {out}")
    print(json.dumps(summary, indent=2))

    readme = os.path.join(art, "README.md")
    if os.path.exists(readme):
        with open(readme) as f:
            text = f.read()
        fills = {
            "lambda_max": f"{summary['lambda_max']:.4f}",
            "lambda_min": f"{summary['lambda_min']:.4f}",
            "trace estimate": f"{summary['trace_estimate']:.3e}",
        }
        for key, val in fills.items():
            # fill "| <row label containing key> | TBD ... |" table rows
            text = re.sub(
                rf"(\|[^|\n]*{re.escape(key)}[^|\n]*\|\s*)TBD[^|\n]*",
                rf"\g<1>{val} ",
                text,
                flags=re.IGNORECASE,
            )
        with open(readme, "w") as f:
            f.write(text)
        left = text.count("TBD")
        print(f"README updated ({left} TBD remaining)")


if __name__ == "__main__":
    main()
