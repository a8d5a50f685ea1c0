"""Spectrum CLI report/artifact stage: console report (with the
ghost-cluster detector), npz/torch artifact save, stem plot, --compare_to
metrics.  (Split out of cli/spectrum.py in round 5 — VERDICT r4 #6.)"""

from __future__ import annotations

import numpy as np


def report_and_outputs(args, spec, wall, dim, num_batches,
                        n_matvecs=None, partial_measure=False):
    from hessian_llm_vision_tpu.io import save_spectrum
    from hessian_llm_vision_tpu.krylov import trace_estimate

    ev = np.sort(np.asarray(spec.eigvals))
    print(f"P = {dim}")
    print(f"lambda_max = {ev[-1]:.6f}  lambda_min = {ev[0]:.6f}")
    print(f"top-5 Ritz: {np.round(ev[-5:], 4).tolist()}")
    # ghost-cluster detector: a T-only (unreorthogonalized) Lanczos at
    # ill conditioning replicates a converged extreme into a cluster of
    # near-identical Ritz values while the estimate itself drifts —
    # measured at trained-124M/kappa~1e7: two 35-iter runs at the SAME
    # faithful precision gave lambda_max 1.88e6 vs 1.57e6, each with a
    # 5-wide cluster within 1e-4 relative, where the converged
    # (thick-restart) value is 1.5702e6 with residual ~1e-10*lambda
    # (artifacts/trained124m_r4).  A genuine SLQ top-5 has spread.
    if not partial_measure and len(ev) >= 3:
        top = ev[-3:]
        scale = max(abs(float(top[-1])), 1e-30)
        if float(top[-1] - top[0]) / scale < 1e-4:
            print(
                "WARNING: the top 3 Ritz values agree to <1e-4 relative — "
                "the signature of LOST ORTHOGONALITY (ghost copies of one "
                "eigenpair), typical for T-only Lanczos on trained/ill-"
                "conditioned checkpoints; lambda_max may be off by tens of "
                "percent. Use --thick_restart K for converged, residual-"
                "certified extremes."
            )
    if partial_measure:
        # gammas cover only the converged pairs — NOT the full SLQ measure
        print(f"partial E[lambda] over the {len(ev)} converged pairs = "
              f"{float(trace_estimate(spec)):.6e} "
              f"(weight sum {float(np.sum(np.asarray(spec.gammas))):.3e}; "
              "not a trace estimate)")
    else:
        print(f"trace estimate (E[lambda]) = "
              f"{float(trace_estimate(spec)):.6e}")
    # each operator matvec costs num_batches HVPs for multi-batch dataset
    # operators — count HVPs, not matvecs, so HVPs/s is comparable across
    # paths
    hvps = (n_matvecs * num_batches) if n_matvecs is not None else (
        args.lanczos_iters * num_batches
    )
    print(f"wall-clock: {wall:.2f}s ({hvps / wall:.2f} HVPs/s)")

    if args.out_spectrum:
        if args.out_spectrum.endswith((".ckpt", ".pt")):
            # reference-ecosystem interchange: torch dict format
            from hessian_llm_vision_tpu.io import save_reference_spectrum

            save_reference_spectrum(args.out_spectrum, spec)
            print(f"spectrum (torch format) -> {args.out_spectrum}")
        else:
            save_spectrum(
                args.out_spectrum,
                spec,
                iters=args.lanczos_iters,
                subsample=args.subsample,
                vector_seed=args.vector_seed,
                **getattr(args, "_extra_meta", {}),
            )
            print(f"spectrum -> {args.out_spectrum}.npz"
                  if not args.out_spectrum.endswith(".npz")
                  else f"spectrum -> {args.out_spectrum}")
    if args.plot:
        plot_spectrum(spec, args.plot)
    if args.compare_to:
        from hessian_llm_vision_tpu.io import load_spectrum, load_reference_spectrum
        from hessian_llm_vision_tpu.krylov import (
            density_overlap,
            ritz_relative_error,
            wasserstein_distance,
        )

        other = (
            load_reference_spectrum(args.compare_to)
            if args.compare_to.endswith((".ckpt", ".pt"))
            else load_spectrum(args.compare_to)
        )
        err = ritz_relative_error(spec, other, top_k=5)
        print(f"top-5 Ritz max relative error vs {args.compare_to}: {err:.2e}")
        print(f"density overlap: {density_overlap(spec, other):.4f}")
        print(f"spectral W1 distance: {wasserstein_distance(spec, other):.4e}")
        if spec.ritz_vectors is not None and other.ritz_vectors is not None:
            from hessian_llm_vision_tpu.krylov import subspace_overlap

            ov = subspace_overlap(
                np.asarray(spec.ritz_vectors), np.asarray(other.ritz_vectors)
            )
            print(f"Ritz subspace overlap (mean cos^2 principal angles): "
                  f"{ov:.4f}")


def plot_spectrum(spec, path):
    """Stem plot of (eigvals, gammas), log-y — the reference's spectral
    density visualisation (First Principles Lanczos.ipynb cell 2)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(7, 4))
    ev = np.asarray(spec.eigvals)
    ga = np.maximum(np.asarray(spec.gammas), 1e-12)
    ax.stem(ev, ga)
    ax.set_yscale("log")
    ax.set_xlabel("Ritz value")
    ax.set_ylabel("SLQ weight")
    fig.tight_layout()
    fig.savefig(path, dpi=120)
    print(f"plot -> {path}")
