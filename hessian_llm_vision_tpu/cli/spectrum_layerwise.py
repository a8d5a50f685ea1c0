"""--layerwise spectrum paths: per-leaf / per-block sweeps (host-loop
masked-HVP program at LLM scale, per-leaf operators below it), shared
outputs and the per-block stem-plot grid.  (Split out of cli/spectrum.py
in round 5 — VERDICT r4 #6.)"""

from __future__ import annotations

import jax
import numpy as np


def layerwise_main(args, wl):
    """Per-leaf (or per-block, --layerwise_group block) spectra
    (gpt2_savehessian_layer.py; visual-eigen.ipynb cells 12-13)."""
    from hessian_llm_vision_tpu.curvature import LayerHessianOperator
    from hessian_llm_vision_tpu.io import save_spectrum
    from hessian_llm_vision_tpu.krylov import lanczos, ritz_decomposition
    from hessian_llm_vision_tpu.utils import trees
    from hessian_llm_vision_tpu.utils.flatten import tree_size

    group_regex = args.group_regex
    if group_regex is None and args.layerwise_group == "block":
        group_regex = trees.BLOCK_GROUP_REGEX

    if args.host_loop:
        # LLM scale: ONE masked-HVP program for every leaf (the fused
        # per-leaf operators below compile one program per leaf, which
        # exceeds the backend compile budget at 124M)
        from hessian_llm_vision_tpu.krylov import layerwise_spectrum_host

        results_t = layerwise_spectrum_host(
            wl.loss_fn,
            wl.params,
            wl.batches[0],
            args.lanczos_iters,
            key=jax.random.PRNGKey(args.vector_seed),
            normalization="mean",
            batch_size=wl.batch_size,
            precision=args.hvp_precision,
            progress=True,
            group_regex=group_regex,
        )
        results = {
            label: ritz_decomposition(res) for label, res in results_t.items()
        }
        if not results:
            raise SystemExit(
                "--layerwise grouping matched no parameter leaves "
                f"(group_regex={group_regex!r})"
            )
        layerwise_outputs(args, results)
        return results

    labels, spans = trees.partition_labels(wl.params)
    if group_regex is not None:
        import re

        labels, spans = trees.group_spans(labels, spans, group_regex)
        if not labels:
            raise SystemExit(
                f"--layerwise grouping regex {group_regex!r} matches no "
                "parameter leaves"
            )
        pat = re.compile(group_regex)

        def _make_pred(target):
            def pred(n):
                m = pat.search(n)
                return bool(m) and (m.group(1) if m.groups() else m.group(0)) == target
            return pred
    else:
        def _make_pred(target):
            return lambda n: n == target
    key = jax.random.PRNGKey(args.vector_seed)
    results = {}
    for i, (label, (off, size)) in enumerate(zip(labels, spans)):
        if size < 2:
            continue
        mask = trees.subtree_mask(wl.params, _make_pred(label))
        op = LayerHessianOperator(
            wl.loss_fn, wl.params, wl.batches[0], mask,
            normalization="mean", batch_size=wl.batch_size,
        )
        iters = min(args.lanczos_iters, size)
        res = lanczos(op.matvec, op.dim, iters, key=jax.random.fold_in(key, i),
                      reorth=True)
        spec = ritz_decomposition(res)
        ev = np.asarray(spec.eigvals)
        results[label] = spec
        print(f"{label:60s} P={size:9d} max={ev[-1]:10.4f} min={ev[0]:10.4f}")
    layerwise_outputs(args, results)
    return results


def layerwise_outputs(args, results):
    """Shared --out_spectrum / --plot handling for both layerwise paths."""
    from hessian_llm_vision_tpu.io import save_spectrum

    if args.out_spectrum:
        for label, spec in results.items():
            safe = label.replace("/", ".")
            save_spectrum(f"{args.out_spectrum}_{safe}", spec)
        print(f"{len(results)} block spectra -> {args.out_spectrum}_*.npz")
    if args.plot:
        plot_layer_grid(results, args.plot)


def plot_layer_grid(results, path):
    """Grid of per-block stem plots, log-y — the reference's per-layer
    eigenvalue figure (ipynbs/visual-eigen.ipynb cell 13)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    labels = list(results)
    n = len(labels)
    if n == 0:
        raise ValueError("no spectra to plot")
    ncols = 2 if n > 1 else 1
    nrows = (n + ncols - 1) // ncols
    fig, axes = plt.subplots(
        nrows=nrows, ncols=ncols, figsize=(7 * ncols, 2.5 * nrows),
        squeeze=False,
    )
    flat_axes = axes.flatten()
    for ax, label in zip(flat_axes, labels):
        spec = results[label]
        ev = np.asarray(spec.eigvals)
        ga = np.maximum(np.asarray(spec.gammas), 1e-12)
        ax.stem(ev, ga)
        ax.set_yscale("log")
        ax.set_title(f"{label} eigenvalues")
    for ax in flat_axes[n:]:
        ax.axis("off")
    fig.tight_layout()
    fig.savefig(path, dpi=120)
    plt.close(fig)
    print(f"layer grid plot -> {path}")
