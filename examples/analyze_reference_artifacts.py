"""Analyze the reference repo's published spectrum artifacts with this
framework — the migration path for existing results.

Reproduces the reference's analysis notebooks (eigeninfo/GPT2 spectrum.ipynb:
stem plot, trace estimate; SURVEY.md §2.4/L9) directly over its committed
torch ``results.ckpt`` files, and compares the two GPT-2 spectra.

    python examples/analyze_reference_artifacts.py [--reference DIR] [--out DIR]
"""

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--reference", default="/root/reference")
    p.add_argument("--out", default="/tmp/reference_analysis")
    args = p.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from hessian_llm_vision_tpu.io import load_reference_spectrum
    from hessian_llm_vision_tpu.krylov import (
        density_overlap,
        ritz_relative_error,
        spectral_density,
        summarize,
        trace_estimate,
    )

    os.makedirs(args.out, exist_ok=True)
    paths = sorted(
        glob.glob(os.path.join(args.reference, "eigeninfo", "*", "results.ckpt"))
    ) + glob.glob(os.path.join(args.reference, "Lanczos_Scratch", "*.ckpt"))
    if not paths:
        raise SystemExit(f"no reference artifacts under {args.reference}")

    specs = {}
    for path in paths:
        name = os.path.basename(os.path.dirname(path)) or os.path.basename(path)
        spec = load_reference_spectrum(path)
        specs[name] = spec
        info = summarize(spec)
        print(f"\n{name}")
        print(f"  ritz values: {info['num_ritz']}")
        print(f"  lambda_max {info['lambda_max']:.4f}   "
              f"lambda_min {info['lambda_min']:.4f}")
        print(f"  top-5: {np.round(info['top5'], 4).tolist()}")
        print(f"  E[lambda] (trace/P estimate): {info['trace_estimate']:.3e}")
        print(f"  SLQ weight sum: {info['weight_sum']:.6f}")

        # stem + density figure (the GPT2 spectrum.ipynb cells 2-4)
        try:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt

            fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(11, 4))
            ev = np.asarray(spec.eigvals)
            ga = np.maximum(np.asarray(spec.gammas), 1e-12)
            ax1.stem(ev, ga)
            ax1.set_yscale("log")
            ax1.set_title(f"{name}: SLQ stem")
            grid = jnp.linspace(ev.min() - 5, ev.max() + 5, 400)
            dens = spectral_density(spec, grid, sigma=(ev.max() - ev.min()) / 80)
            ax2.plot(np.asarray(grid), np.asarray(dens))
            ax2.set_yscale("log")
            ax2.set_title("broadened density")
            fig.tight_layout()
            out = os.path.join(args.out, f"{name}.png".replace("=", "_"))
            fig.savefig(out, dpi=110)
            plt.close(fig)
            print(f"  figure -> {out}")
        except ImportError:
            pass

    # pairwise comparison of the two GPT-2 eigeninfo spectra
    names = [n for n in specs if n.startswith("gpt2")]
    if len(names) >= 2:
        a, b = specs[names[0]], specs[names[1]]
        print(f"\n{names[0]} vs {names[1]}:")
        print(f"  top-5 Ritz max rel err: {ritz_relative_error(a, b, top_k=5):.3f}")
        print(f"  density overlap: {density_overlap(a, b):.4f}")
        print("  (different checkpoints/subsampling -> genuinely different "
              "spectra; the overlap quantifies it)")


if __name__ == "__main__":
    main()
