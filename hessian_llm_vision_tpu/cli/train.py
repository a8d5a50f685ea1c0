"""Training CLI — vanilla SGD/Adam baselines and LanczosSGD.

Collapses the reference's per-experiment scripts (gpt2_multigpu.py,
gpt2_adam_raw.py, gpt2_sgdraw.py, gpt2_hessian*.py, clean_lanczostrain.py,
train_lanczos.py, accum.py) into one config-driven entry.

Examples:
  python -m hessian_llm_vision_tpu.cli.train --model gpt2-tiny --optimiser adam \
      --lr 1e-3 --epochs 1 --cpu
  python -m hessian_llm_vision_tpu.cli.train --model gpt2 --optimiser lanczos \
      --k 10 --delta 1e-4 --accumulation_steps 8 --lanczos_momentum 0.9
"""

from __future__ import annotations

import argparse
import os

from hessian_llm_vision_tpu.cli.common import (
    add_common_args,
    build_workload,
    maybe_force_cpu,
    resolve_mixed_precision,
)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    add_common_args(p)
    p.add_argument("--optimiser", default="sgd",
                   help="sgd | adam | raw | lanczos | lanczos-host | "
                   "lanczos-layer | lanczos-layer-host | gn | ngd")
    p.add_argument("--basis_bf16", action=argparse.BooleanOptionalAction,
                   default=None,
                   help="lanczos-host: store the frozen Ritz basis bf16 "
                   "(half HBM + bf16-streaming adjust, measured faster AND "
                   "smaller at 124M — bench.py adjusted_step_sec_bf16_basis)."
                   "  Default: ON for models >=1e8 params, off below; "
                   "--no-basis_bf16 forces f32")
    p.add_argument("--refresh_batch_size", type=int, default=None,
                   help="lanczos-host: run refresh HVPs on only the first N "
                   "sequences (frees HBM headroom at 124M+)")
    p.add_argument("--refresh_linearized", action="store_true",
                   help="lanczos-host: pay the refresh's primal fwd+bwd once "
                   "per refresh, run the k Lanczos HVPs on the cached "
                   "linearization (0.72x flops/HVP measured; "
                   "curvature/linearized.py).  Residuals are ~2.65 GiB per "
                   "sequence at 124M/seq512 — combine with "
                   "--refresh_batch_size 2 there")
    p.add_argument("--refresh_precision", default="high",
                   choices=["high", "highest", "default", "mixed", "auto"],
                   help="lanczos-host: matmul precision for refresh HVPs — "
                   "'default' (1 bf16 MXU pass) is 1.68x faster at ~1e-3 "
                   "Ritz error, fine for delta-damped training refreshes; "
                   "'mixed' = blocks 'default' + vocab head 'high' "
                   "(1.5x faster at <5e-4 extreme-Ritz error, LMs only). "
                   "Those errors are measured at INIT-scale curvature; "
                   "when resuming a trained checkpoint add "
                   "--precision_check (landscape sharpening makes bf16 "
                   "refresh error checkpoint-dependent; "
                   "artifacts/trained124m_r3).  'auto' resolves the tier "
                   "by probing the STARTING params (post-resume) and "
                   "installs the in-training precision guard "
                   "(optim/precision_guard.py): periodic re-probes + "
                   "λmax-growth-triggered escalation")
    p.add_argument("--precision_recheck", type=int, default=0,
                   help="lanczos-host/-layer-host: re-probe the refresh "
                   "precision against the f32 referee every N refreshes "
                   "and auto-escalate the tier on a breach (0 = off; "
                   "--refresh_precision auto defaults this to 10).  A "
                   "4x λmax growth since the last probe always triggers "
                   "a re-probe when the guard is installed")
    p.add_argument("--precision_check", action="store_true",
                   help="lanczos-host/-layer-host: before training, probe "
                   "the refresh-precision HVP against an f32 referee at "
                   "the starting params (2x10 HVPs) and warn above the "
                   "2e-3 extreme-Ritz bar — catches low-precision refresh "
                   "corruption when resuming trained checkpoints")
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--momentum", type=float, default=0.9)
    p.add_argument("--beta2", type=float, default=0.999,
                   help="Adam beta2 (gpt2_adam.py:18, optun_adam.py)")
    p.add_argument("--wd", type=float, default=0.0)
    p.add_argument("--epochs", type=int, default=1)
    p.add_argument("--max_steps", type=int, default=0,
                   help="stop after exactly N optimizer steps across epochs "
                   "(0 = run all epochs) — the reference's 10k-logged-steps "
                   "protocol (training/adam/1 TB logs)")
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--delta", type=float, default=None,
                   help="LanczosSGD damping (default 1e-4) or, with "
                   "--optimiser adam, the Adam eps (default 1e-8) — the "
                   "reference's flag semantics (gpt2_adam.py:19,79)")
    p.add_argument("--accumulation_steps", type=int, default=1)
    p.add_argument("--lanczos_momentum", type=float, default=0.0)
    p.add_argument("--refresh_every", type=int, default=1)
    p.add_argument("--damping", type=float, default=1e-3,
                   help="GN/NGD curvature damping (colaexp.py PSD shift)")
    p.add_argument("--cg_iters", type=int, default=20)
    p.add_argument("--linear_decay_steps", type=int, default=0)
    p.add_argument("--log_every", type=int, default=10)
    p.add_argument("--save_checkpoint", default=None)
    p.add_argument("--save_state", default=None,
                   help="save the FULL train state (params+optimizer+step) "
                   "for mid-training resume")
    p.add_argument("--resume_state", default=None,
                   help="resume from a --save_state checkpoint")
    p.add_argument("--tensorboard", action="store_true")
    p.add_argument("--snapshot_every", type=int, default=0,
                   help="every N steps, compute a T-only Lanczos spectrum of "
                   "the current batch and log/save it (interleaved "
                   "spectrum-during-training, train_lanczos.py)")
    p.add_argument("--snapshot_iters", type=int, default=10)
    p.add_argument("--post_spectrum_iters", type=int, default=0,
                   help="after training, run a random-seeded Lanczos of this "
                   "depth and save {eigvals,gammas,V} (the reference's "
                   "post-training eigenspace.pth, train_lanczos.py:372-410)")
    p.add_argument("--post_spectrum_out", default=None)
    return p


def _refresh_probe_batch(args, wl, accum):
    """Probe batch mirroring the refresh's memory plan: one micro-batch,
    further sliced by --refresh_batch_size — probing the full
    un-microbatched batch could OOM a job those flags make fit."""
    import jax

    probe_n = None
    if accum > 1:
        probe_n = max(wl.batch_size // accum, 1)
    if args.refresh_batch_size:
        probe_n = min(probe_n or args.refresh_batch_size,
                      args.refresh_batch_size)
    batch = wl.batches[0]
    if probe_n is not None:
        batch = jax.tree_util.tree_map(lambda x: x[:probe_n], batch)
    return batch


def main(argv=None) -> float:
    args = build_parser().parse_args(argv)
    maybe_force_cpu(args)

    # refresh HVPs run blocks 'default' + vocab head 'high'; the plain
    # grad step already runs at ambient 'default' precision either way
    resolve_mixed_precision(args, "refresh_precision")

    from hessian_llm_vision_tpu.io import run_dir_name, save_checkpoint
    from hessian_llm_vision_tpu.obs import (
        MultiLogger,
        PickleStatsLogger,
        TensorBoardLogger,
    )
    from hessian_llm_vision_tpu.optim import linear_decay
    from hessian_llm_vision_tpu.train import to_microbatches, train

    if args.delta is None:
        args.delta = 1e-8 if args.optimiser == "adam" else 1e-4

    wl = build_workload(args)
    if args.optimiser not in ("sgd", "adam", "raw"):
        # every other optimiser consumes curvature (Lanczos refreshes /
        # GN/NGD solves) — loud guard against top-k-routed MoE configs
        from hessian_llm_vision_tpu.models.moe import warn_if_topk_curvature

        warn_if_topk_curvature(wl.model, what=f"train --optimiser {args.optimiser}")
    lr = (
        linear_decay(args.lr, args.linear_decay_steps)
        if args.linear_decay_steps
        else args.lr
    )

    rundir = run_dir_name(
        args.out,
        args.optimiser,
        args.subsample,
        lr=args.lr,
        delta=args.delta,
        batchsize=args.batch_size,
        k=args.k,
        accum=args.accumulation_steps,
        lanczosmomentum=args.lanczos_momentum,
    )
    os.makedirs(rundir, exist_ok=True)
    loggers = [PickleStatsLogger(os.path.join(rundir, "training_stats.pkl"))]
    if args.tensorboard:
        loggers.append(TensorBoardLogger(os.path.join(rundir, "tensorboard_logs")))
    logger = MultiLogger(loggers)

    accum = args.accumulation_steps
    if args.precision_check and args.optimiser not in (
        "lanczos-host", "lanczos-layer-host"
    ):
        raise SystemExit(
            "--precision_check probes the HOST trainers' refresh HVPs; "
            "use --optimiser lanczos-host/lanczos-layer-host (for spectrum "
            "jobs use spectrum --precision_check)"
        )
    if (
        args.refresh_precision == "auto" or args.precision_recheck > 0
    ) and args.optimiser not in ("lanczos-host", "lanczos-layer-host"):
        raise SystemExit(
            "--refresh_precision auto / --precision_recheck guard the HOST "
            "trainers' refresh HVPs; use --optimiser lanczos-host/"
            "lanczos-layer-host"
        )
    if args.precision_recheck < 0:
        raise SystemExit("--precision_recheck must be >= 0")
    if args.refresh_linearized and args.optimiser != "lanczos-host":
        raise SystemExit(
            "--refresh_linearized applies to --optimiser lanczos-host"
        )
    if args.optimiser == "lanczos-layer" and accum > 1:
        raise SystemExit(
            "--optimiser lanczos-layer does not support "
            "--accumulation_steps > 1 (per-leaf Lanczos runs on the full "
            "batch; drop the flag or use --optimiser lanczos)"
        )
    from hessian_llm_vision_tpu.cli.train_optimizers import build_optimizer

    init_fn, step_fn, trainer = build_optimizer(args, wl, lr, accum)

    batches = wl.batches
    if accum > 1:
        batches = [to_microbatches(b, accum) for b in batches]
    if wl.make_batches is not None and args.epochs > 1:
        # per-epoch stochastic augmentation (train_savespec.py:46-55
        # semantics): each epoch redraws crops/flips/noise; epoch 0
        # equals wl.batches, so single-epoch runs are unchanged
        from hessian_llm_vision_tpu.train import EpochResampledBatches

        batches = EpochResampledBatches(
            wl.make_batches,
            transform=(
                (lambda bs: [to_microbatches(b, accum) for b in bs])
                if accum > 1 else None
            ),
        )

    final = {"loss": float("nan")}

    def on_log(step, metrics):
        final.update(metrics)
        logger.log(step, metrics)
        print(
            f"step {step}  loss {metrics['loss']:.4f}  "
            f"ema {metrics['ema_loss']:.4f}  {metrics['step_time']:.3f}s"
        )

    state0 = init_fn(wl.params)
    if args.resume_state:
        from hessian_llm_vision_tpu.io import load_checkpoint

        if args.optimiser in ("lanczos-host", "lanczos-layer-host"):
            core = load_checkpoint(args.resume_state, template={
                "params": state0.params,
                "momentum": state0.momentum,
                "step": state0.step,
            })
            state0.params = core["params"]
            state0.momentum = core["momentum"]
            state0.step = int(core["step"])
        else:
            state0 = load_checkpoint(args.resume_state, template=state0)
        print(f"resumed train state <- {args.resume_state}")

    guard = None
    if args.refresh_precision == "auto" or args.precision_recheck > 0:
        # AFTER --resume_state (same reason as --precision_check below):
        # the guard's initial resolve must see the params training starts
        # from.  Installs periodic re-probes + λmax-growth escalation —
        # the in-training extension of the one-shot probe
        # (optim/precision_guard.py, VERDICT r4 #3).
        import jax

        from hessian_llm_vision_tpu.cli.common import lm_loss_factory
        from hessian_llm_vision_tpu.optim.precision_guard import (
            RefreshPrecisionGuard,
            default_tiers,
            tier_index_for,
        )

        factory = lm_loss_factory(wl, args)
        tiers = default_tiers(factory, wl.loss_fn)
        referee = factory(None) if factory is not None else wl.loss_fn
        start = (
            0 if args.refresh_precision == "auto"
            else tier_index_for(tiers, args.refresh_precision)
        )
        guard = RefreshPrecisionGuard(
            tiers,
            referee_loss_fn=referee,
            recheck_every=args.precision_recheck or 10,
            key=jax.random.PRNGKey(args.seed + 7),
            start_index=start,
        )
        trainer.precision_guard = guard
        probe_batch = _refresh_probe_batch(args, wl, accum)
        if args.refresh_precision == "auto":
            tier = guard.resolve_initial(
                trainer, state0.params, probe_batch, step=state0.step
            )
            print(
                f"[precision-guard] refresh tier resolved: {tier.label} "
                f"(outer {tier.precision}); re-probe every "
                f"{guard.recheck_every} refreshes or on "
                f"{guard.growth_factor}x λmax growth"
            )
        else:
            # guard the user's pinned tier: no initial probe, but align
            # the trainer with the ladder rung so escalations stack on it
            trainer.set_refresh_tier(tiers[start])
            print(
                f"[precision-guard] guarding pinned tier "
                f"{tiers[start].label}: re-probe every "
                f"{guard.recheck_every} refreshes / {guard.growth_factor}x "
                "λmax growth"
            )

    if args.precision_check:
        # AFTER --resume_state: the probe must see the params training will
        # actually start from — probing init-scale curvature and then
        # swapping in a trained checkpoint would falsely pass exactly the
        # checkpoint-dependent regime the flag exists for
        import jax

        from hessian_llm_vision_tpu.cli.common import (
            referee_loss_fn_for,
            report_precision_probe,
        )
        from hessian_llm_vision_tpu.optim.lanczos_sgd_host import (
            refresh_precision_probe,
        )

        probe_batch = _refresh_probe_batch(args, wl, accum)
        stats = refresh_precision_probe(
            trainer, state0.params, probe_batch,
            key=jax.random.PRNGKey(args.seed),
            referee_loss_fn=referee_loss_fn_for(args),
        )
        report_precision_probe(
            stats, 10, what="refresh",
            hint="LanczosSGD's Ritz pairs will be unreliable; use "
                 "--refresh_precision high (or highest)",
        )

    on_state = None
    if args.snapshot_every > 0:
        from hessian_llm_vision_tpu.curvature import HessianOperator
        from hessian_llm_vision_tpu.io import save_tridiag
        from hessian_llm_vision_tpu.krylov import lanczos, ritz_decomposition
        import jax
        import numpy as np

        def on_state(step, state, batch):
            params = getattr(state, "params", state)
            b = batch
            if accum > 1:  # micro-batched: snapshot the first micro-batch
                b = jax.tree_util.tree_map(lambda x: x[0], batch)
            op = HessianOperator(wl.loss_fn, params, b)
            res = lanczos(
                op.matvec, op.dim, args.snapshot_iters,
                key=jax.random.PRNGKey(step), reorth=False, store_basis=False,
            )
            spec = ritz_decomposition(res)
            ev = np.sort(np.asarray(spec.eigvals))
            print(f"[snapshot step {step}] lambda_max {ev[-1]:.4f} "
                  f"lambda_min {ev[0]:.4f}")
            save_tridiag(
                os.path.join(rundir, f"T_step{step:06d}"),
                res.alphas, res.betas, step=step,
            )

    host_driven = args.optimiser in ("lanczos-host", "lanczos-layer-host")
    state = train(
        step_fn,
        state0,
        batches,
        num_epochs=args.epochs,
        max_steps=args.max_steps,
        log_every=args.log_every,
        on_log=on_log,
        on_state=on_state,
        on_state_every=args.snapshot_every,
        jit=not host_driven,
    )
    logger.close()

    if guard is not None:
        import json

        summary = guard.summary()
        guard_path = os.path.join(rundir, "precision_guard.json")
        with open(guard_path, "w") as f:
            json.dump(summary, f, indent=1)
        print(
            f"[precision-guard] final tier {guard.tier.label} "
            f"({len(guard.events)} probes, {summary['escalations']} "
            f"escalations) -> {guard_path}"
        )

    if args.save_checkpoint:
        # gn/ngd steps carry the bare params pytree as their state
        save_checkpoint(args.save_checkpoint, getattr(state, "params", state))
        print(f"checkpoint -> {args.save_checkpoint}")
    if args.save_state:
        if host_driven:
            # host state is a mutable dataclass; persist the resumable core
            save_checkpoint(args.save_state, {
                "params": state.params,
                "momentum": state.momentum,
                "step": state.step,
            })
        else:
            save_checkpoint(args.save_state, state)
        print(f"train state -> {args.save_state}")

    if args.post_spectrum_iters > 0:
        from hessian_llm_vision_tpu.curvature import HessianOperator
        from hessian_llm_vision_tpu.io import save_spectrum
        from hessian_llm_vision_tpu.krylov import lanczos, ritz_decomposition
        import jax
        import numpy as np

        first = wl.batches[0]
        op = HessianOperator(wl.loss_fn, state.params, first)
        res = lanczos(
            op.matvec, op.dim, args.post_spectrum_iters,
            key=jax.random.PRNGKey(args.seed + 1), reorth=True,
        )
        spec = ritz_decomposition(res, with_vectors=True)
        ev = np.sort(np.asarray(spec.eigvals))
        print(f"post-training spectrum: lambda_max {ev[-1]:.4f} "
              f"lambda_min {ev[0]:.4f}")
        out = args.post_spectrum_out or os.path.join(rundir, "eigenspace")
        save_spectrum(out, spec, iters=args.post_spectrum_iters)
        print(f"eigenspace -> {out}.npz")

    # last stdout line is the final loss — the contract the reference's
    # Optuna harness relies on (optun.py:33-45)
    print(final["loss"])
    return final["loss"]


if __name__ == "__main__":
    main()
