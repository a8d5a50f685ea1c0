"""The spectrum CLI's two main computation paths, split out of
main() (round 5 — VERDICT r4 #6):

* :func:`host_loop_main` — the T-only host-driven paths (dataset host
  loop / fused iteration / fused single-batch step / bigmodel / probe-
  parallel), LLM scale;
* :func:`incore_main` — the in-core operator paths (stored-basis
  lanczos, multi-probe SLQ, host-basis offload, resumable checkpointing,
  thick restart, Hutch++).

Both consume the parsed args + built workload and end in
``report_and_outputs``; flags are validated before entry
(cli/spectrum_flags.py).
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from hessian_llm_vision_tpu.cli.spectrum_kpm import run_kpm
from hessian_llm_vision_tpu.cli.spectrum_report import report_and_outputs


def host_loop_main(args, wl, key):
    """--host_loop: T-only spectrum over cached per-batch programs."""
    from hessian_llm_vision_tpu.io import save_tridiag
    from hessian_llm_vision_tpu.krylov import ritz_decomposition

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
        if args.linearized:
            if len(wl.batches) != 1:
                raise SystemExit(
                    "--linearized needs a single batch (--num_batches 1): "
                    "the cached residuals are per-batch and cost ~2.65 GiB "
                    "per 124M/seq512 sequence"
                )
            from hessian_llm_vision_tpu.krylov.driver import (
                linearized_spectrum_host,
            )

            res = linearized_spectrum_host(
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
                callback=cb,
                progress=args.probes == 1,
                precision=args.hvp_precision,
            )
        elif args.bigmodel:
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
        run_kpm(args, op_kpm.matvec, op_kpm.dim)

    report_and_outputs(args, spec, wall, tree_size(wl.params),
                        len(wl.batches) * max(args.probes, 1))
    return spec


def incore_main(args, wl, key, make_operator):
    """In-core operator paths (stored basis / thick restart / probes)."""
    from hessian_llm_vision_tpu.io import save_tridiag
    from hessian_llm_vision_tpu.krylov import (
        lanczos,
        lanczos_checkpointed,
        ritz_decomposition,
    )
    from hessian_llm_vision_tpu.krylov.slq import slq_multi_probe

    op = make_operator(args, wl)
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
        report_and_outputs(args, spec, wall, op.dim, hvp_batches,
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
        run_kpm(args, op.matvec, op.dim)
    report_and_outputs(args, spec, wall, op.dim, hvp_batches)
    return spec
