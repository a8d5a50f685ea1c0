"""Auto precision: probe the checkpoint, pick the fastest matmul
precision whose spectrum is PROVABLY faithful — per run, not per model.

Low-precision curvature error is CHECKPOINT-DEPENDENT: the "mixed" mode
(all transformer blocks 1-pass bf16, vocab head + loss bf16x3) passes
the 1e-3 extreme-Ritz parity bar at random init yet fabricates its
trained-checkpoint extremes outright — certified at GPT-2 124M ckpt2000
(artifacts/trained124m_r4/precision_arms.json): mixed's extreme Ritz
vectors, re-evaluated under the f32 referee matvec, carry SIGN-FLIPPED
near-zero Rayleigh quotients (relative residual 1.6) — rounding noise,
not curvature.  Even "high" (bf16x3) errs 4.4e-1 there; round 3's
trained spectra (λmax 3.7e5 at high) understated the converged,
residual-certified value (1.5702e6, thick-restart at X6,
trlan2000_x6.npz) 4.2×.  (A further trap the certified run exposed: at
this conditioning the UNREORTHOGONALIZED 35-iter T-only job is itself
trajectory-unstable even at faithful precision — two X6-grade runs gave
λmax 1.88e6 vs 1.57e6, both with ghost clusters; converged extremes
need the reorthogonalized thick-restart path.)  The same certification
shows the error lives ENTIRELY
in the transformer blocks' matmuls: blocks at the X6 dot algorithm
(bf16 6-pass, ~f32 products) + embedding/head at high err 1.5e-4 —
inside the bar at 11% less cost than all-X6 ("highest" itself lowers to
X6 on v5e).  A second attribution pass (probe_precision_arms2.py,
artifacts/trained124m_r4/precision_arms2.json) shows the X6 requirement
is NOT separable within the block: attention-sublayer-only X6 errs
1.35e-2 (30× better than strict-high but still failing), MLP-only X6
errs 0.40, scores-only 0.33 — both sublayers' matmuls need the 6-pass
algorithm, so blocks-X6 is the minimal passing granularity.

Two methodology rules this module enforces (both measured the hard way):

* REORTHOGONALIZED probes only (``reorth=True``): the plain three-term
  recurrence is chaotic at trained-checkpoint conditioning (κ~10⁷) —
  no-reorth probe extremes disagree 4.4e-1 between two arms whose
  reorthogonalized/full-job spectra agree to 1e-4, so a no-reorth probe
  measures trajectory divergence, not operator error.
* The decision quantity is extreme-Ritz error vs an f32 referee, and
  ambiguous verdicts can be certified precision-independently via
  Rayleigh quotients + residuals of the arm's Ritz vectors under the
  referee matvec (examples/probe_precision_arms.py).

The planner walks a cost-ordered candidate ladder
(:func:`default_candidates`: mixed → strict-high → blocks-X6) and
returns the FIRST arm meeting ``tol``, falling back to the referee's own
precision.  Cost: ``ritz_iters`` HVPs per arm plus one compile per NEW
precision configuration (compiles persist in the jax compilation cache,
so reruns on the same checkpoint shape pay only the HVP probes).  The
probe runs on ONE batch (the ``--precision_check`` convention): the
dataset-mean operator is a convex combination of per-batch Hessians, so
a per-batch precision failure is the same failure the averaged operator
sees.

Reference role: none — the reference's CUDA matmuls are f32-native and
never faced this choice (SURVEY.md §2.6); on TPU the bf16 speed tiers
make precision a measured, per-checkpoint decision, and this module is
what makes fast tiers safe to default to (``--hvp_precision auto``).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any, Callable, List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from hessian_llm_vision_tpu.utils.flatten import Flattener

BlockSpec = Union[None, str, Tuple[Optional[str], ...]]


@dataclasses.dataclass(frozen=True)
class PrecisionArm:
    """One probed candidate."""

    label: str
    block_precision: Any  # spec handed to the model builder (see
    # spec_to_overrides: None | str | per-layer tuple | dict of overrides)
    hvp_precision: str  # outer jax.default_matmul_precision
    ritz_rel_err: float  # worst extreme-Ritz rel err vs referee
    seconds_per_hvp: float  # steady-state, this chip, probe batch
    extremes: Tuple[float, float]  # (λmin, λmax) estimates


@dataclasses.dataclass(frozen=True)
class AutoPrecisionPlan:
    """The chosen configuration + the evidence for it."""

    block_precision: Any  # winning spec (see spec_to_overrides)
    hvp_precision: str
    label: str
    ritz_rel_err: float
    referee_extremes: Tuple[float, float]
    arms: Tuple[PrecisionArm, ...]  # every candidate probed, in order

    def describe(self) -> str:
        lines = [
            f"auto precision plan: {self.label} "
            f"(extreme-Ritz err {self.ritz_rel_err:.2e} vs f32 referee)"
        ]
        for a in self.arms:
            lines.append(
                f"  probed {a.label}: err {a.ritz_rel_err:.2e}, "
                f"{a.seconds_per_hvp * 1e3:.0f} ms/HVP"
            )
        return "\n".join(lines)


def spec_to_overrides(spec) -> dict:
    """Map a candidate spec to model-config field overrides.

    ``None`` / str / tuple = a ``block_matmul_precision`` value; a dict is
    passed through verbatim (op-type splits: ``attn_scores_precision``,
    ``attn_matmul_precision``, ``mlp_matmul_precision``)."""
    if isinstance(spec, dict):
        return dict(spec)
    return {"block_matmul_precision": spec}


#: bf16 6-pass dot algorithm: ~f32 product accuracy at 2x the MXU passes
#: of "high".  Measured on v5e at GPT-2 124M trained ckpt2000 (certified
#: via Rayleigh quotients + residuals of each arm's extreme Ritz pairs
#: under the f32 referee matvec, artifacts/trained124m_r4/):
#:   * "highest" LOWERS TO X6 on this hardware (bit-identical spectra,
#:     identical ms/HVP);
#:   * blocks at X6 + embedding/head at "high": err 1.5e-4 — PASSES;
#:   * blocks at "high" (3-pass): err 4.4e-1 regardless of head
#:     precision — the trained-ckpt error lives ENTIRELY in the blocks'
#:     matmul precision, and 3-pass is NOT enough there;
#:   * mixed (blocks 1-pass): err 0.53, and its extreme Ritz vectors
#:     carry sign-flipped ~0 true curvature (fabricated noise).
X6 = "BF16_BF16_F32_X6"


def default_candidates(fast: str = "default", escalate: str = "high"):
    """The measured cost-ordered auto ladder.

    mixed (77 ms/HVP at 124M bs4) → strict blocks-high (113 ms) →
    blocks-X6 + head high (165 ms, the trained-checkpoint accuracy floor
    below full X6) — then the planner's built-in "highest" referee
    fallback (= X6 everywhere on v5e, 185 ms).  Depth-prefix and 1-pass
    op-split arms are NOT in the default ladder: measured on the trained
    124M checkpoint they all fail the bar without ever beating mixed's
    cost (see module docstring / artifacts/trained124m_r4/).
    """
    return [
        ("mixed (all blocks 1-pass bf16)", fast),
        (f"strict (all blocks {escalate})", None),
        (
            "blocks-X6 + head " + escalate,
            {"block_matmul_precision": X6},
        ),
    ]


def op_split_candidates(fast: str = "default", escalate: str = "high"):
    """1-pass op-type escalation arms, cheapest first (opt-in).

    Measured on the trained 124M checkpoint: NONE of these pass the
    parity bar (the error needs X6-grade block matmuls, not selective
    3-pass escalation), so they are no longer in the default ladder —
    kept for custom ladders and mid-regime studies.  The attention-core
    einsums (q·k scores feeding softmax, att·v) are ~5% of block FLOPs;
    the qkv/proj Denses ~40%; the MLP ~55%.
    """
    return [
        (
            "mixed+scores-" + escalate,
            {
                "block_matmul_precision": fast,
                "attn_scores_precision": escalate,
            },
        ),
        (
            "mixed+attn-" + escalate,
            {
                "block_matmul_precision": fast,
                "attn_matmul_precision": escalate,
            },
        ),
        (
            "mixed+mlp-" + escalate,
            {
                "block_matmul_precision": fast,
                "mlp_matmul_precision": escalate,
            },
        ),
    ]


def escalation_prefixes(n_layers: int) -> Tuple[int, ...]:
    """Escalation ladder: 0 (pure mixed), then 1, 2, 3, then half-depth.

    Front-to-back prefixes because trained curvature is depth-ordered
    (module docstring); the full-depth rung is the strict fallback
    handled separately by :func:`auto_precision_plan`.
    """
    cand = [0, 1, 2, 3, max(1, n_layers // 2)]
    out: List[int] = []
    for c in cand:
        c = min(c, n_layers)
        if c not in out and c < n_layers:
            out.append(c)
    return tuple(out)


def prefix_block_spec(
    n_layers: int, n_high: int, *, escalate: str = "high",
    fast: str = "default",
) -> BlockSpec:
    """Per-block spec: first ``n_high`` blocks escalated, rest fast."""
    if n_high <= 0:
        return fast
    if n_high >= n_layers:
        return escalate
    return tuple([escalate] * n_high + [fast] * (n_layers - n_high))


def _probe_arm(
    batch_hvp, v0, params, batch, ritz_iters: int, *, reorth: bool = True
) -> Tuple[Tuple[float, float], float]:
    """(extremes, steady seconds/HVP) for one candidate's cached program.

    ``reorth=True`` (default): CGS2 against a bf16-stored basis buffer.
    NON-NEGOTIABLE for arm-vs-arm comparisons on trained checkpoints —
    the plain recurrence is chaotic at κ~10⁷ (see
    driver._tiny_lanczos_extremes)."""
    from hessian_llm_vision_tpu.krylov.driver import _tiny_lanczos_extremes

    # warm the program so the timed recurrence is steady-state (remote
    # compiles are minutes; they must not pollute the speed comparison)
    batch_hvp(v0, params, batch).block_until_ready()
    t0 = time.perf_counter()
    extremes = _tiny_lanczos_extremes(
        batch_hvp, v0, params, batch, ritz_iters, reorth=reorth
    )
    dt = (time.perf_counter() - t0) / max(ritz_iters, 1)
    return extremes, dt


def auto_precision_plan(
    make_loss_fn: Callable[[Any], Callable[[Any, Any], jax.Array]],
    params: Any,
    batch: Any,
    n_layers: Optional[int] = None,
    *,
    key: Optional[jax.Array] = None,
    vector: Optional[jax.Array] = None,
    flattener: Optional[Flattener] = None,
    tol: float = 1e-3,
    ritz_iters: int = 8,
    outer_precision: str = "high",
    referee_precision: str = "highest",
    escalate: str = "high",
    fast: str = "default",
    prefixes: Optional[Sequence[int]] = None,
    candidates: Optional[Sequence[Tuple[str, Any]]] = None,
    reorth: bool = True,
    log: Optional[Callable[[str], None]] = None,
) -> AutoPrecisionPlan:
    """Pick the fastest precision configuration meeting the parity bar.

    ``make_loss_fn(spec)`` must return the loss closure for a model
    rebuilt per :func:`spec_to_overrides` (``None`` = inherit outer
    precision everywhere — the referee/strict arm).  The returned plan's
    ``block_precision``/``hvp_precision`` feed straight back into the
    model config and the spectrum driver.

    Candidate arms: an explicit ``candidates`` list of ``(label, spec)``
    pairs, or ``prefixes`` for the depth-escalation ladder, or (default)
    mixed followed by the op-type splits (:func:`op_split_candidates` —
    the axis measurement favors; see its docstring).

    Decision rule: walk the ladder front-to-back and return the FIRST arm
    whose worst extreme-Ritz relative error vs the f32 referee is ≤
    ``tol`` (order candidates fastest-first so first-passing =
    fastest-passing); fall back to uniform ``escalate`` blocks (strict
    mode, measured ≤2e-5 at 124M) if no candidate passes, and to the
    referee's own precision as the last resort.
    """
    from hessian_llm_vision_tpu.krylov.driver import _jitted_batch_hvp

    if ritz_iters < 1:
        raise ValueError("ritz_iters must be >= 1")
    say = log or (lambda s: None)
    fl = flattener or Flattener(params)
    if (vector is None) == (key is None):
        raise ValueError("pass exactly one of vector / key")
    if vector is None:
        vector = jax.random.normal(key, (fl.size,), jnp.float32)
    v0 = vector.astype(jnp.float32)
    v0 = v0 / jnp.maximum(jnp.linalg.norm(v0), 1e-30)

    # referee arm: strict f32 (6-pass) matmuls end to end
    ref_hvp = _jitted_batch_hvp(
        make_loss_fn(None), "mean", referee_precision, fl
    )
    ref_ext, ref_dt = _probe_arm(
        ref_hvp, v0, params, batch, ritz_iters, reorth=reorth
    )
    scale = max(abs(ref_ext[0]), abs(ref_ext[1]), 1e-30)
    say(
        f"[auto-precision] referee ({referee_precision}): "
        f"extremes ({ref_ext[0]:.4g}, {ref_ext[1]:.4g}), "
        f"{ref_dt * 1e3:.0f} ms/HVP"
    )

    def err_of(ext: Tuple[float, float]) -> float:
        return max(abs(ext[0] - ref_ext[0]), abs(ext[1] - ref_ext[1])) / scale

    arms: List[PrecisionArm] = []

    def try_arm(label: str, spec: BlockSpec, hvp_prec: str) -> PrecisionArm:
        hvp = _jitted_batch_hvp(make_loss_fn(spec), "mean", hvp_prec, fl)
        ext, dt = _probe_arm(
            hvp, v0, params, batch, ritz_iters, reorth=reorth
        )
        arm = PrecisionArm(
            label=label,
            block_precision=spec,
            hvp_precision=hvp_prec,
            ritz_rel_err=err_of(ext),
            seconds_per_hvp=dt,
            extremes=ext,
        )
        arms.append(arm)
        say(
            f"[auto-precision] {label}: err {arm.ritz_rel_err:.2e}, "
            f"{dt * 1e3:.0f} ms/HVP"
            + (" -> PASS" if arm.ritz_rel_err <= tol else "")
        )
        return arm

    if candidates is None:
        if prefixes is not None:
            candidates = [
                (
                    "mixed (all blocks 1-pass bf16)" if b == 0
                    else f"mixed+escalate[h_0..h_{b - 1}]",
                    prefix_block_spec(n_layers, b, escalate=escalate, fast=fast),
                )
                for b in prefixes
            ]
        else:
            candidates = default_candidates(fast=fast, escalate=escalate)
    tried_strict = False
    for label, spec in candidates:
        try:
            arm = try_arm(label, spec, outer_precision)
        except Exception as e:  # e.g. backend rejects a dot algorithm
            say(f"[auto-precision] {label}: SKIPPED ({type(e).__name__}: {e})")
            continue
        tried_strict = tried_strict or (
            spec is None or spec == escalate
        )
        if arm.ritz_rel_err <= tol:
            return AutoPrecisionPlan(
                block_precision=arm.block_precision,
                hvp_precision=arm.hvp_precision,
                label=arm.label,
                ritz_rel_err=arm.ritz_rel_err,
                referee_extremes=ref_ext,
                arms=tuple(arms),
            )

    # strict fallback: every block escalated, outer precision unchanged
    # (skipped when the candidate list already probed it)
    if not tried_strict:
        arm = try_arm(f"strict (all blocks {escalate})", None, outer_precision)
        if arm.ritz_rel_err <= tol:
            return AutoPrecisionPlan(
                block_precision=None,
                hvp_precision=outer_precision,
                label=arm.label,
                ritz_rel_err=arm.ritz_rel_err,
                referee_extremes=ref_ext,
                arms=tuple(arms),
            )

    # last resort: the referee's own precision (err 0 by definition)
    say(
        "[auto-precision] even strict blocks failed the bar; "
        f"falling back to {referee_precision}"
    )
    return AutoPrecisionPlan(
        block_precision=None,
        hvp_precision=referee_precision,
        label=f"referee fallback ({referee_precision})",
        ritz_rel_err=0.0,
        referee_extremes=ref_ext,
        arms=tuple(arms),
    )
