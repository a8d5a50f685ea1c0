"""Post-hoc Hessian spectrum of a model/checkpoint.

The reference's analyze entry (gpt2_savehessian.py, gpt2_savehessian_layer.py,
gpt2_savehessian_noise.py, diego_pythia*.py, gpt2_calchessian.py, cifar SLQ)
in one CLI: dataset-averaged (or single-batch) Hessian, seeded-probe Lanczos
with optional Ritz basis, optional layer restriction, optional multi-probe
SLQ averaging (the d.sh seed grid, in-process), per-iteration resumable
T-checkpointing, spectrum artifact + optional density plot.

Examples:
  python -m hessian_llm_vision_tpu.cli.spectrum --model gpt2-tiny \
      --lanczos_iters 20 --basis --out_spectrum /tmp/spec --cpu
  python -m hessian_llm_vision_tpu.cli.spectrum --model gpt2 --checkpoint ck \
      --subsample 0.0001 --lanczos_iters 35 --batch_size 16 --max_length 512
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from hessian_llm_vision_tpu.cli.common import (
    add_common_args,
    build_workload,
    maybe_force_cpu,
    resolve_mixed_precision,
)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    add_common_args(p)
    p.add_argument("--lanczos_iters", type=int, default=35)
    p.add_argument("--basis", action="store_true",
                   help="store the Krylov basis / save Ritz vectors")
    p.add_argument("--normalization", default="dataset",
                   help="mean | sum | dataset (artifact scaling convention)")
    p.add_argument("--vector_seed", type=int, default=997)
    p.add_argument("--probes", type=int, default=1,
                   help=">1: in-process multi-probe SLQ averaging (d.sh grid)")
    p.add_argument("--hutchpp", type=int, default=0, metavar="M",
                   help="also estimate tr(H) with Hutch++ using M matvecs "
                   "(krylov/trace.py; O(1/M) error vs SLQ's per-probe "
                   "variance). In-core operator paths only")
    p.add_argument("--kpm", type=int, default=0, metavar="M",
                   help="also estimate the spectral DENSITY by the kernel "
                   "polynomial method with M Jackson-damped Chebyshev "
                   "moments (krylov/kpm.py; smooth whole-support density "
                   "at 2 P-vectors of memory; range auto-estimated by a "
                   "12-iter Lanczos probe). Moments land in the npz as "
                   "meta_kpm_*. In-core operator paths only")
    p.add_argument("--kpm_probes", type=int, default=4,
                   help="Rademacher probes averaged per --kpm estimate")
    p.add_argument("--kpm_deflate", type=int, default=0, metavar="K",
                   help="with --kpm M: thick-restart the K largest-|lambda| "
                   "eigenpairs to convergence first (EXACT spikes with "
                   "residual certificates), then run KPM on the deflated "
                   "operator (I-UU^T)A(I-UU^T) — the Chebyshev support "
                   "shrinks to the bulk, improving bulk resolution by "
                   "~(full range / bulk range) at the same moment count "
                   "(krylov/deflate.py)")
    p.add_argument("--layer", default=None,
                   help="restrict to parameter subtree whose path contains this")
    p.add_argument("--layerwise", action="store_true",
                   help="block-diagonal spectrum: one spectrum per leaf")
    p.add_argument("--layerwise_group", default="leaf",
                   choices=["leaf", "block"],
                   help="'leaf': one spectrum per parameter leaf "
                   "(gpt2_savehessian_layer.py); 'block': one per repeated "
                   "transformer block h_i/blocks_i/layers_i, skipping "
                   "embeddings/head (the visual-eigen.ipynb cell-12 sweep)")
    p.add_argument("--group_regex", default=None,
                   help="custom grouping regex for --layerwise (capture "
                   "group 1 = block label); overrides --layerwise_group")
    p.add_argument("--t_checkpoint", default=None,
                   help="save T + full Lanczos state every iteration "
                   "(resumable, diego_pythia mode)")
    p.add_argument("--state_every", type=int, default=None,
                   help="write the FULL resume state (2xP f32) only every N "
                   "iterations; the tiny T stays per-iteration. Default is "
                   "scale-aware: 1 below 1e8 params, 5 above (a 124M "
                   "--t_checkpoint run otherwise writes ~1 GB per iter)")
    p.add_argument("--resume_spectrum", default=None,
                   help="resume an interrupted --t_checkpoint run from its "
                   ".state.npz file")
    p.add_argument("--host_basis", action="store_true",
                   help="keep the Krylov basis in host RAM (basis > HBM; "
                   "the reference's CPU-offload mode)")
    p.add_argument("--host_loop", action="store_true",
                   help="host-driven T-only spectrum over one cached "
                   "per-batch HVP program (LLM scale: bounded compile unit, "
                   "no (k,P) basis in HBM)")
    p.add_argument("--fused_step", action="store_true",
                   help="with --host_loop + a single batch: fuse HVP + "
                   "recurrence into one DONATING program (>1B-param memory "
                   "plan: params + 2 live P-buffers instead of 4)")
    p.add_argument("--fused_iter", action="store_true",
                   help="with --host_loop: run each whole iteration "
                   "(scan-over-batches HVP reduce + recurrence) as ONE "
                   "donating program — 1 tunnel dispatch/iter instead of "
                   "~2+batches (bench.py headline mode; hessian/ggn/fisher)")
    p.add_argument("--probe_parallel", action="store_true",
                   help="with --host_loop and --probes N on a multi-device "
                   "mesh: run all probes concurrently, probe axis sharded "
                   "over devices (one fused program, zero collectives — "
                   "the d.sh probe grid in mesh wall-time of one probe). "
                   "Single chip: the program is N HVPs big; use sequential "
                   "--probes instead at LLM scale")
    p.add_argument("--linearized", action="store_true",
                   help="with --host_loop + a single batch: pay the primal "
                   "forward+backward ONCE and run every Lanczos iteration "
                   "on the cached linearization (0.51x the HVP wall measured "
                   "on-chip at the blocks-X6 tier; curvature/linearized.py)."
                   "  Residuals are ~2.65 GiB/sequence at 124M seq512: "
                   "bs2 territory on a 16 GB chip")
    p.add_argument("--qprev_bf16", action="store_true",
                   help="store the lagged Lanczos vector in bf16 (frees "
                   "half a P-buffer; ~1e-3 extreme-Ritz perturbation)")
    p.add_argument("--bigmodel", action="store_true",
                   help="pytree-native fused step with low-precision-stored "
                   "Krylov vectors and full donation — the >1B-param plan "
                   "that fits Pythia-1.4B on one 16 GB chip (single batch)")
    p.add_argument("--bigmodel_q", default="bfloat16",
                   choices=["bfloat16", "float32"],
                   help="Krylov vector storage dtype for --bigmodel")
    p.add_argument("--operator", default="hessian",
                   help="hessian | ggn | fisher (GGN = J^T H_out J, Fisher = "
                   "GGN of the NLL — colaexp.py parity; single-batch)")
    p.add_argument("--thick_restart", type=int, default=0, metavar="K",
                   help="compute K CONVERGED extremal eigenpairs by "
                   "thick-restart Lanczos (Wu & Simon) inside a fixed "
                   "--lanczos_iters-vector basis buffer — converged "
                   "eigenbases at bounded memory, beyond the reference's "
                   "one-pass bases. In-core operator paths only")
    p.add_argument("--tr_which", default="lm",
                   choices=["lm", "la", "sa", "both"],
                   help="which end of the spectrum --thick_restart targets "
                   "(largest magnitude / algebraic ends / both)")
    p.add_argument("--tr_dtype", default="float32",
                   choices=["float32", "bfloat16"],
                   help="basis-buffer storage dtype for --thick_restart "
                   "(bfloat16 halves the (inner+1, P) buffer; recurrence "
                   "arithmetic stays f32 — the --bigmodel_q convention)")
    p.add_argument("--tr_tol", type=float, default=1e-6,
                   help="relative residual tolerance for --thick_restart "
                   "(scale = max|theta|; raise to ~2e-3 with bf16 storage)")
    p.add_argument("--no_reorth", action="store_true")
    p.add_argument("--precision_check", action="store_true",
                   help="before the spectrum, run a short T-only Lanczos "
                   "on batch 1 in BOTH the requested precision and an f32 "
                   "referee (2x--precision_check_iters HVPs + one compile) "
                   "and warn when the extreme Ritz values disagree beyond "
                   "the 2e-3 parity bar — low-precision curvature error is "
                   "CHECKPOINT-dependent (mixed: <=5e-4 at init, 5.8x "
                   "lambda_max inflation after 2000 Adam steps; "
                   "artifacts/trained124m_r3)")
    p.add_argument("--precision_check_iters", type=int, default=10,
                   help="Lanczos iterations per arm of --precision_check; "
                   "calibrated on-chip at 124M: 10 iters separates the "
                   "regimes cleanly (init mixed 7.3e-4 PASS vs trained "
                   "5.3e-1 FAIL), 5 iters is under-converged and false-"
                   "positives marginally (init 2.1e-3)")
    p.add_argument("--hvp_precision", default="auto",
                   choices=["auto", "high", "highest", "default", "mixed"],
                   help="matmul precision under the curvature trace "
                   "(host-loop paths). 'auto' (default) probes THIS "
                   "checkpoint: short Lanczos arms vs an f32 referee, "
                   "escalating transformer-block precision front-to-back "
                   "until the extreme-Ritz error meets the 1e-3 parity "
                   "bar (krylov/autoprec.py; adds ~6x10 probe HVPs + one "
                   "compile per new arm, cached). 'high' (bf16x3) is the "
                   "parity-grade strict mode; 'default' (1 bf16 MXU pass) "
                   "is 1.68x faster at ~2e-3 error; 'mixed' pins blocks "
                   "'default' + vocab head 'high' (LM models only; SAFE "
                   "AT INIT ONLY — trained ckpts inflate lambda_max 5.8x, "
                   "which is why 'auto' exists)")
    p.add_argument("--out_spectrum", default=None)
    p.add_argument("--plot", default=None, help="save stem/density plot PNG")
    p.add_argument("--compare_to", default=None,
                   help="npz or reference torch .ckpt spectrum to compare "
                   "against (prints max relative Ritz error)")
    return p


def _make_operator(args, wl):
    from hessian_llm_vision_tpu.curvature import (
        DatasetHessianOperator,
        GGNOperator,
        FisherOperator,
        HessianOperator,
        LayerHessianOperator,
    )
    from hessian_llm_vision_tpu.utils import trees

    batches = wl.batches
    n_total = len(batches) * wl.batch_size
    if args.operator in ("ggn", "fisher"):
        if wl.model_fn is None:
            raise SystemExit(f"--operator {args.operator} unsupported for "
                             f"model {wl.name!r} (no model_fn)")
        if len(batches) > 1:
            print(f"[{args.operator}] single-batch operator: using batch 1 "
                  f"of {len(batches)}")
        maker = GGNOperator if args.operator == "ggn" else FisherOperator
        return maker(wl.model_fn, wl.out_loss_fn, wl.params, batches[0],
                     damping=0.0)
    if args.operator != "hessian":
        raise SystemExit(f"unknown --operator {args.operator!r}")
    if args.layer:
        mask = trees.subtree_mask(
            wl.params, lambda name, key=args.layer: key in name
        )
        n_sel = sum(
            bool(m) for m in jax.tree_util.tree_leaves(mask)
        )
        if n_sel == 0:
            raise SystemExit(f"--layer {args.layer!r} matches no parameters")
        print(f"[layer] restricting to {n_sel} parameter leaves")
        if len(batches) > 1:
            print(f"[layer] single-batch operator: using batch 1 of "
                  f"{len(batches)} (combine with --num_batches 1 to silence)")
        return LayerHessianOperator(
            wl.loss_fn,
            wl.params,
            batches[0],
            mask,
            normalization="mean" if args.normalization == "dataset" else args.normalization,
            batch_size=wl.batch_size,
        )
    if len(batches) == 1:
        return HessianOperator(
            wl.loss_fn,
            wl.params,
            batches[0],
            normalization="mean" if args.normalization == "dataset" else args.normalization,
            batch_size=wl.batch_size,
            dataset_size=n_total,
        )
    stacked = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *batches
    )
    return DatasetHessianOperator(
        wl.loss_fn,
        wl.params,
        stacked,
        normalization=args.normalization,
        batch_size=wl.batch_size,
        dataset_size=n_total,
        remat=False,  # remat trades compute for memory; CLI-scale jobs don't need it
    )


# split-module surface (round 5): the stages live in sibling modules;
# re-exported here so existing imports of the old underscore names keep
# working (tests/examples import _report_and_outputs through this module)
from hessian_llm_vision_tpu.cli.spectrum_kpm import run_kpm  # noqa: E402,F401
from hessian_llm_vision_tpu.cli.spectrum_layerwise import (  # noqa: E402,F401
    layerwise_main,
    layerwise_outputs,
    plot_layer_grid,
)
from hessian_llm_vision_tpu.cli.spectrum_report import (  # noqa: E402,F401
    plot_spectrum,
    report_and_outputs,
)

_run_kpm = run_kpm
_report_and_outputs = report_and_outputs
_plot = plot_spectrum
_layerwise_main = layerwise_main

def main(argv=None):
    args = build_parser().parse_args(argv)
    maybe_force_cpu(args)

    resolve_mixed_precision(args, "hvp_precision")

    from hessian_llm_vision_tpu.io import save_spectrum, save_tridiag
    from hessian_llm_vision_tpu.krylov import (
        lanczos,
        lanczos_checkpointed,
        ritz_decomposition,
        trace_estimate,
    )
    from hessian_llm_vision_tpu.krylov.slq import slq_multi_probe

    wl = build_workload(args)

    # curvature over top-k MoE routing is region-conditional (piecewise-
    # constant routing carries no curvature) — loud warning, not a docstring
    from hessian_llm_vision_tpu.models.moe import warn_if_topk_curvature

    warn_if_topk_curvature(wl.model, what="spectrum")

    from hessian_llm_vision_tpu.cli.spectrum_flags import validate_flags

    validate_flags(args)

    # --hvp_precision auto (the default): probe this checkpoint, escalate
    # only the blocks that own the error, resolve to a concrete precision
    # plan.  Runs AFTER the flag validations so bad flag combos error
    # before any probe compiles.
    from hessian_llm_vision_tpu.cli.common import resolve_auto_precision

    wl = resolve_auto_precision(args, wl)

    if args.precision_check:
        if args.operator != "hessian":
            # the probe gates the HESSIAN matvec program; a GGN/Fisher job
            # runs a different jvp/vjp program with its own precision
            # sensitivity — a Hessian verdict would describe an operator
            # the job never dispatches
            raise SystemExit(
                f"--precision_check supports --operator hessian only "
                f"(the {args.operator} matvec is a different program; "
                "probe it via krylov.matvec_precision_probe on a GGN "
                "closure if needed)"
            )
        from hessian_llm_vision_tpu.cli.common import (
            referee_loss_fn_for,
            report_precision_probe,
        )
        from hessian_llm_vision_tpu.krylov import matvec_precision_probe

        stats = matvec_precision_probe(
            wl.loss_fn, wl.params, wl.batches[0],
            key=jax.random.PRNGKey(args.vector_seed),
            precision=args.hvp_precision,
            referee_loss_fn=referee_loss_fn_for(args),
            ritz_iters=args.precision_check_iters,
        )
        report_precision_probe(
            stats, args.precision_check_iters, what="HVP",
            hint="the spectrum's extreme eigenvalues will be unreliable; "
                 "rerun with --hvp_precision high (or highest) and without "
                 "--block_precision",
        )

    if args.layerwise:
        dropped = [
            flag
            for flag, set_ in [
                ("--probes", args.probes > 1),
                ("--basis", args.basis),
                ("--t_checkpoint", bool(args.t_checkpoint)),
                ("--resume_spectrum", bool(args.resume_spectrum)),
                ("--compare_to", bool(args.compare_to)),
                ("--operator " + args.operator, args.operator != "hessian"),
                ("--fused_step", args.fused_step),
                ("--bigmodel", args.bigmodel),
                ("--host_basis", args.host_basis),
            ]
            if set_
        ]
        if dropped:
            raise SystemExit(
                f"--layerwise does not support {', '.join(dropped)}; "
                "each block runs a plain T-only (or in-core) Hessian "
                "Lanczos"
            )
        from hessian_llm_vision_tpu.cli.spectrum_layerwise import layerwise_main

        return layerwise_main(args, wl)

    key = jax.random.PRNGKey(args.vector_seed)

    from hessian_llm_vision_tpu.cli.spectrum_paths import (
        host_loop_main,
        incore_main,
    )

    if args.host_loop:
        return host_loop_main(args, wl, key)
    return incore_main(args, wl, key, _make_operator)


if __name__ == "__main__":
    main()
