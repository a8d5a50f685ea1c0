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

    # loud-flags policy: error on silently-dropped combinations instead of
    # running a job that never produces the asked-for output
    if args.kpm and (
        args.layerwise or args.thick_restart
        or (args.host_loop and args.operator != "hessian")
        or args.bigmodel
    ):
        raise SystemExit(
            "--kpm works on the in-core operator paths and on "
            "--host_loop with --operator hessian (drop --layerwise/"
            "--thick_restart/--bigmodel, or call krylov.kpm_density "
            "directly on a program-backed matvec)"
        )
    if not args.kpm and args.kpm_probes != 4:
        raise SystemExit("--kpm_probes has no effect without --kpm M")
    if args.kpm_deflate and not args.kpm:
        raise SystemExit("--kpm_deflate has no effect without --kpm M")
    if args.hutchpp and (args.host_loop or args.layerwise):
        raise SystemExit(
            "--hutchpp applies to the in-core operator paths only "
            "(drop --host_loop/--layerwise, or use krylov.trace directly "
            "with a host-loop matvec)"
        )
    if args.qprev_bf16 and not args.fused_step:
        raise SystemExit("--qprev_bf16 requires --fused_step (the plain "
                         "host loop keeps all flat vectors f32)")
    if args.fused_iter and (
        not args.host_loop or args.fused_step or args.bigmodel
    ):
        raise SystemExit(
            "--fused_iter needs --host_loop "
            "(and is exclusive with --fused_step/--bigmodel)"
        )
    if args.probe_parallel and (
        not args.host_loop or args.probes < 2 or args.fused_step
        or args.bigmodel or bool(args.t_checkpoint)
    ):
        raise SystemExit(
            "--probe_parallel needs --host_loop and --probes >= 2; it does "
            "not support --fused_step/--bigmodel (single-probe memory "
            "plans) or --t_checkpoint (no per-probe resume state)"
        )
    if args.host_loop and (args.basis or args.host_basis):
        # the host-loop branch is the T-only memory plan: no stored Krylov
        # basis, Spectrum(ritz_vectors=None) — silently dropping the flag
        # would hand --compare_to nothing to overlap against
        raise SystemExit(
            "--host_loop is T-only (no Ritz vectors / stored basis); drop "
            "--basis/--host_basis, or use the in-core path (--basis / "
            "--host_basis) or --thick_restart K for converged eigenpairs"
        )
    if (args.bigmodel or args.fused_step) and not args.host_loop:
        # without --host_loop these silently fall through to the flat
        # in-core/checkpointed paths, whose P-vector copies OOM exactly
        # the >1B models the flags exist for (measured: a 1.4B
        # --bigmodel-without---host_loop run needed 20.4 GB)
        raise SystemExit(
            "--bigmodel/--fused_step are --host_loop modes; add --host_loop"
        )
    if args.thick_restart and (
        args.host_loop or args.layerwise or args.fused_step or args.bigmodel
    ):
        raise SystemExit(
            "--thick_restart applies to the in-core operator paths only "
            "(drop --host_loop/--layerwise/--fused_step/--bigmodel)"
        )
    if not args.thick_restart and args.tr_which != "lm":
        raise SystemExit(
            "--tr_which has no effect without --thick_restart K "
            "(--kpm_deflate always deflates largest-|lambda|)"
        )
    if (
        not args.thick_restart
        and not args.kpm_deflate
        and (args.tr_dtype != "float32" or args.tr_tol != 1e-6)
    ):
        raise SystemExit(
            "--tr_dtype/--tr_tol have no effect without --thick_restart K "
            "or --kpm_deflate K"
        )
    if not args.layerwise and (
        args.layerwise_group != "leaf" or args.group_regex
    ):
        raise SystemExit(
            "--layerwise_group/--group_regex have no effect without "
            "--layerwise"
        )

    if not args.precision_check and args.precision_check_iters != 10:
        raise SystemExit(
            "--precision_check_iters has no effect without --precision_check"
        )
    if args.precision_check and args.precision_check_iters < 1:
        raise SystemExit("--precision_check_iters must be >= 1")

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
        return _layerwise_main(args, wl)

    key = jax.random.PRNGKey(args.vector_seed)

    if args.host_loop:
        from hessian_llm_vision_tpu.krylov import dataset_spectrum_host

        def cb(i, alphas, betas):
            save_tridiag(args.t_checkpoint, alphas, betas,
                         vector_seed=args.vector_seed, iter=i)

        # no --t_checkpoint -> callback=None: a non-None callback forces a
        # synchronous device->host T fetch per iteration, serializing host
        # dispatch against device compute through the tunnel (the ~1.8x
        # stall the fused iteration exists to remove)
        cb = cb if args.t_checkpoint else None
        t0 = time.time()
        # --probes > 1: sequential seeded probes, SLQ-averaged (the d.sh
        # data_seed x vector_seed grid, in one process, at any model scale)
        all_ev, all_ga = [], []
        if args.operator in ("ggn", "fisher") and wl.model_fn is None:
            raise SystemExit(f"--operator {args.operator} unsupported for "
                             f"model {wl.name!r} (no model_fn)")
        if args.probe_parallel:
            from hessian_llm_vision_tpu.parallel import (
                probe_parallel_spectrum_host,
            )

            probe_results = probe_parallel_spectrum_host(
                wl.loss_fn, wl.params, wl.batches, args.lanczos_iters,
                key=key, n_probes=args.probes,
                normalization=args.normalization, batch_size=wl.batch_size,
                precision=args.hvp_precision, operator=args.operator,
                model_fn=wl.model_fn, out_loss_fn=wl.out_loss_fn,
                progress=True,
            )
            for pi, res in enumerate(probe_results):
                s = ritz_decomposition(res)
                all_ev.append(np.asarray(s.eigvals))
                all_ga.append(np.asarray(s.gammas))
                print(f"probe {pi + 1}/{args.probes}: "
                      f"lambda_max {all_ev[-1].max():.4f}")
        for pi in range(0 if args.probe_parallel else max(args.probes, 1)):
            if args.bigmodel:
                if len(wl.batches) != 1 or args.operator != "hessian":
                    raise SystemExit(
                        "--bigmodel needs a single batch (--num_batches 1) "
                        "and --operator hessian"
                    )
                from hessian_llm_vision_tpu.krylov.driver import (
                    bigmodel_spectrum_host,
                )

                res = bigmodel_spectrum_host(
                    wl.loss_fn,
                    wl.params,
                    wl.batches[0],
                    args.lanczos_iters,
                    key=jax.random.fold_in(key, pi),
                    normalization=(
                        "mean"
                        if args.normalization == "dataset"
                        else args.normalization
                    ),
                    batch_size=wl.batch_size,
                    q_dtype=args.bigmodel_q,
                    callback=cb,
                    progress=args.probes == 1,
                    precision=args.hvp_precision,
                )
            elif args.fused_step:
                if len(wl.batches) != 1 or args.operator != "hessian":
                    raise SystemExit(
                        "--fused_step needs a single batch (--num_batches 1) "
                        "and --operator hessian"
                    )
                from hessian_llm_vision_tpu.krylov.driver import (
                    single_batch_spectrum_host_fused,
                )

                res = single_batch_spectrum_host_fused(
                    wl.loss_fn,
                    wl.params,
                    wl.batches[0],
                    args.lanczos_iters,
                    key=jax.random.fold_in(key, pi),
                    normalization=(
                        "mean"
                        if args.normalization == "dataset"
                        else args.normalization
                    ),
                    batch_size=wl.batch_size,
                    qprev_bf16=args.qprev_bf16,
                    callback=cb,
                    progress=args.probes == 1,
                    precision=args.hvp_precision,
                )
            else:
                res = dataset_spectrum_host(
                    wl.loss_fn,
                    wl.params,
                    wl.batches,
                    args.lanczos_iters,
                    key=jax.random.fold_in(key, pi),
                    normalization=args.normalization,
                    batch_size=wl.batch_size,
                    callback=cb,
                    progress=args.probes == 1,
                    operator=args.operator,
                    model_fn=wl.model_fn,
                    out_loss_fn=wl.out_loss_fn,
                    precision=args.hvp_precision,
                    fused=args.fused_iter,
                )
            s = ritz_decomposition(res)
            all_ev.append(np.asarray(s.eigvals))
            all_ga.append(np.asarray(s.gammas))
            if args.probes > 1:
                print(f"probe {pi + 1}/{args.probes}: "
                      f"lambda_max {all_ev[-1].max():.4f}")
        from hessian_llm_vision_tpu.krylov.slq import Spectrum

        spec = Spectrum(
            eigvals=jnp.asarray(np.concatenate(all_ev)),
            gammas=jnp.asarray(np.concatenate(all_ga) / len(all_ga)),
            ritz_vectors=None,
        )
        wall = time.time() - t0
        from hessian_llm_vision_tpu.utils.flatten import tree_size

        if args.kpm:
            # the LLM-scale KPM path: DatasetHessianOperator's matvec is
            # ONE program (scan-over-batches body traced once — inside the
            # remote-compile ceiling) with explicit params/batches args,
            # so it runs at any model size the host loop itself handles
            # (artifacts/kpm124m_r3 is this path at 124M)
            from hessian_llm_vision_tpu.curvature import (
                DatasetHessianOperator,
            )

            stacked = jax.tree_util.tree_map(
                lambda *xs: jnp.stack(xs), *wl.batches
            )
            op_kpm = DatasetHessianOperator(
                wl.loss_fn, wl.params, stacked,
                normalization=args.normalization,
                batch_size=wl.batch_size,
                precision=args.hvp_precision,
            )
            _run_kpm(args, op_kpm.matvec, op_kpm.dim)

        _report_and_outputs(args, spec, wall, tree_size(wl.params),
                            len(wl.batches) * max(args.probes, 1))
        return spec

    op = _make_operator(args, wl)
    hvp_batches = (
        1
        if (args.layer or args.operator != "hessian" or len(wl.batches) == 1)
        else len(wl.batches)
    )
    t0 = time.time()

    if args.thick_restart:
        dropped = [
            flag
            for flag, set_ in [
                ("--probes", args.probes > 1),
                ("--host_basis", args.host_basis),
                ("--t_checkpoint", bool(args.t_checkpoint)),
                ("--resume_spectrum", bool(args.resume_spectrum)),
                ("--no_reorth", args.no_reorth),
                ("--hutchpp", bool(args.hutchpp)),
            ]
            if set_
        ]
        if dropped:
            raise SystemExit(
                f"--thick_restart does not support {', '.join(dropped)}"
            )
        from hessian_llm_vision_tpu.krylov import lanczos_thick_restart
        from hessian_llm_vision_tpu.krylov.slq import Spectrum

        # draw the probe HERE and pass it in, so the gammas below use the
        # same v0 by construction (not by replaying the internal RNG)
        v0 = jax.random.normal(key, (op.dim,), jnp.float32)
        v0 = v0 / jnp.linalg.norm(v0)
        tr_dtype = (
            jnp.bfloat16 if args.tr_dtype == "bfloat16" else jnp.float32
        )
        if args.operator == "hessian" and not args.layer:
            # fused fast path: one donating program per inner iteration
            # (matvec + CGS2 + row write), scalars fetched once per
            # restart cycle — 22x the unfused dispatch economics at 124M
            # through the tunnel (krylov/driver.py::dataset_thick_restart_host)
            from hessian_llm_vision_tpu.krylov.driver import (
                dataset_thick_restart_host,
            )

            res = dataset_thick_restart_host(
                wl.loss_fn, wl.params, wl.batches, args.thick_restart,
                v0=v0, inner=args.lanczos_iters,
                normalization=args.normalization,
                batch_size=wl.batch_size,
                precision=args.hvp_precision,
                which=args.tr_which, tol=args.tr_tol,
                store_dtype=tr_dtype, progress=True,
            )
        else:
            res = lanczos_thick_restart(
                op.matvec, op.dim, args.thick_restart, v0=v0,
                inner=args.lanczos_iters, which=args.tr_which,
                progress=True, tol=args.tr_tol, store_dtype=tr_dtype,
            )
        # gammas = (u_i . v0)^2: the probe's true spectral-measure weight
        # on each CONVERGED eigenvector (what SLQ gammas estimate) — a
        # PARTIAL measure over k pairs, not the unit SLQ weight vector
        g = (res.vectors @ v0) ** 2
        spec = Spectrum(
            eigvals=jnp.asarray(res.eigvals, jnp.float32),
            gammas=g,
            ritz_vectors=res.vectors if args.basis else None,
        )
        status = "converged" if res.converged else "NOT converged"
        print(
            f"thick-restart: {status} after {res.restarts} restarts / "
            f"{res.matvecs} matvecs; max residual {res.residuals.max():.2e}"
        )
        wall = time.time() - t0
        args._extra_meta = {
            **getattr(args, "_extra_meta", {}),
            "tr_matvecs": res.matvecs,
            "tr_restarts": res.restarts,
            "tr_converged": int(res.converged),
            "tr_max_residual": float(res.residuals.max()),
        }
        _report_and_outputs(args, spec, wall, op.dim, hvp_batches,
                            n_matvecs=res.matvecs, partial_measure=True)
        return spec

    if args.probes > 1:
        spec = slq_multi_probe(
            op.matvec,
            op.dim,
            args.lanczos_iters,
            key,
            args.probes,
            reorth=not args.no_reorth,
        )
    elif args.host_basis:
        from hessian_llm_vision_tpu.krylov import lanczos_host_basis

        def cb(i, alphas, betas):
            if args.t_checkpoint:
                save_tridiag(args.t_checkpoint, alphas, betas,
                             vector_seed=args.vector_seed, iter=i)

        res = lanczos_host_basis(
            op.matvec, op.dim, args.lanczos_iters, key=key,
            reorth=not args.no_reorth, callback=cb,
        )
        spec = ritz_decomposition(res, with_vectors=args.basis)
    elif args.t_checkpoint or args.resume_spectrum:
        from hessian_llm_vision_tpu.io.spectra import (
            load_lanczos_state,
            save_lanczos_state,
        )

        t_path = args.t_checkpoint or (
            args.resume_spectrum.replace(".state.npz", "").replace(".state", "")
        )

        def cb(i, alphas, betas):
            save_tridiag(t_path, alphas, betas,
                         vector_seed=args.vector_seed, iter=i)
            print(f"step {i + 1}  T checkpointed")

        # the full state is 2xP f32 (~1 GB at 124M); throttled, while
        # T (KBs) still checkpoints every iteration above.  Scale-aware
        # default: >=1e8 params -> every 5 iters (<=8 GB of writes per 35)
        state_every = args.state_every
        if state_every is None:
            state_every = 5 if op.dim >= 10**8 else 1

        def scb(i, st):
            if (i + 1) % max(state_every, 1) == 0 or (
                i + 1
            ) == args.lanczos_iters:
                save_lanczos_state(t_path + ".state", **st)

        resume = None
        if args.resume_spectrum:
            resume = load_lanczos_state(args.resume_spectrum)
            print(f"resuming at iteration {len(resume['alphas'])} "
                  f"<- {args.resume_spectrum}")

        res = lanczos_checkpointed(
            op.matvec, op.dim, args.lanczos_iters,
            key=None if resume else key,
            callback=cb, state_callback=scb, resume_state=resume,
        )
        spec = ritz_decomposition(res, with_vectors=False)
    else:
        res = lanczos(
            op.matvec,
            op.dim,
            args.lanczos_iters,
            key=key,
            reorth=not args.no_reorth,
            store_basis=args.basis or not args.no_reorth,
        )
        spec = ritz_decomposition(res, with_vectors=args.basis)
    wall = time.time() - t0
    if args.hutchpp:
        from hessian_llm_vision_tpu.krylov import hutchpp_trace

        t1 = time.time()
        # vmapped=False: probes loop over the one cached matvec program
        # (flat memory — the krylov/driver.py host-loop discipline)
        from hessian_llm_vision_tpu.utils.programs import ensure_program

        tr = hutchpp_trace(
            ensure_program(op.matvec), op.dim, args.hutchpp,
            jax.random.PRNGKey(args.vector_seed + 1), vmapped=False,
        )
        print(f"trace (hutch++ {args.hutchpp} matvecs) = {float(tr):.6e} "
              f"({time.time() - t1:.2f}s)")
        # machine-readable too: lands in the npz as meta_hutchpp_trace
        # (merge, same as _run_kpm / thick-restart — don't clobber other
        # producers' metadata)
        args._extra_meta = {**getattr(args, "_extra_meta", {}),
                            "hutchpp_trace": float(tr),
                            "hutchpp_matvecs": args.hutchpp}
    if args.kpm:
        _run_kpm(args, op.matvec, op.dim)
    _report_and_outputs(args, spec, wall, op.dim, hvp_batches)
    return spec


def _run_kpm(args, matvec, dim):
    """Shared --kpm runner: moments land in args._extra_meta -> the npz.

    With --kpm_deflate K: exact extremal spikes (thick restart) + KPM bulk
    of the deflated operator (krylov/deflate.py) — the kpm_* meta keys then
    describe the BULK density, plus kpm_deflate_* for the spikes."""
    from hessian_llm_vision_tpu.krylov import deflated_density, kpm_density
    from hessian_llm_vision_tpu.utils.programs import ensure_program

    t1 = time.time()
    if args.kpm_deflate:
        bf16 = args.tr_dtype == "bfloat16"
        dres = deflated_density(
            ensure_program(matvec), dim, args.kpm_deflate, args.kpm,
            jax.random.PRNGKey(args.vector_seed + 2),
            num_probes=args.kpm_probes, progress=True,
            # LLM-scale memory plan (the --thick_restart knobs): bf16
            # restart buffer AND bf16 deflation basis, looser residual bar
            tol=args.tr_tol,
            store_dtype=jnp.bfloat16 if bf16 else jnp.float32,
            deflate_dtype=jnp.bfloat16 if bf16 else None,
        )
        kres = dres.bulk
        status = "converged" if dres.converged else "NOT converged"
        print(
            f"deflated {args.kpm_deflate} extremal pairs ({status}, max "
            f"residual {dres.residuals.max():.2e}): "
            f"{np.round(np.sort(dres.eigvals), 4).tolist()}"
        )
        print(
            f"KPM bulk density ({args.kpm} moments x {args.kpm_probes} "
            f"probes on the deflated operator): bulk range "
            f"[{kres.center - kres.radius:.4f}, "
            f"{kres.center + kres.radius:.4f}], "
            f"combined E[lambda] = {dres.trace_estimate():.6e} "
            f"({time.time() - t1:.2f}s, {dres.matvecs} matvecs)"
        )
        args._extra_meta = {
            **getattr(args, "_extra_meta", {}),
            "kpm_deflate_eigvals": np.asarray(dres.eigvals),
            "kpm_deflate_residuals": np.asarray(dres.residuals),
            "kpm_deflate_converged": int(dres.converged),
            "kpm_deflate_matvecs": dres.matvecs,
        }
    else:
        kres = kpm_density(
            ensure_program(matvec), dim, args.kpm,
            jax.random.PRNGKey(args.vector_seed + 2),
            num_probes=args.kpm_probes,
        )
        print(
            f"KPM density ({args.kpm} moments x {args.kpm_probes} probes): "
            f"range [{kres.center - kres.radius:.4f}, "
            f"{kres.center + kres.radius:.4f}], "
            f"E[lambda] = {kres.trace_estimate():.6e} "
            f"({time.time() - t1:.2f}s)"
        )
    args._extra_meta = {
        **getattr(args, "_extra_meta", {}),
        "kpm_moments": kres.moments,
        "kpm_raw_moments": kres.raw_moments,
        "kpm_center": kres.center,
        "kpm_radius": kres.radius,
        "kpm_probes": kres.num_probes,
    }


def _report_and_outputs(args, spec, wall, dim, num_batches,
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
        _plot(spec, args.plot)
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


def _layerwise_main(args, wl):
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
        _layerwise_outputs(args, results)
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
    _layerwise_outputs(args, results)
    return results


def _layerwise_outputs(args, results):
    """Shared --out_spectrum / --plot handling for both layerwise paths."""
    from hessian_llm_vision_tpu.io import save_spectrum

    if args.out_spectrum:
        for label, spec in results.items():
            safe = label.replace("/", ".")
            save_spectrum(f"{args.out_spectrum}_{safe}", spec)
        print(f"{len(results)} block spectra -> {args.out_spectrum}_*.npz")
    if args.plot:
        _plot_layer_grid(results, args.plot)


def _plot_layer_grid(results, path):
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


def _plot(spec, path):
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


if __name__ == "__main__":
    main()
