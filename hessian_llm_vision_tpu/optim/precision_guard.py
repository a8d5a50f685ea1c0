"""In-training refresh-precision guard: extend the precision guarantee
THROUGH training, not just to its door (VERDICT r4 #3).

Round 4 proved curvature fidelity is CHECKPOINT-dependent: tiers that
pass the extreme-Ritz parity bar at init fabricate the extremes once the
landscape sharpens (124M: λmax 4.96 → 1.57e6 over 2000 Adam steps; even
strict bf16x3 errs 0.44 at the endpoint — krylov/autoprec.py).  Yet the
host LanczosSGD trainers fixed ``refresh_precision`` at launch and
``--precision_check`` probed once at start/resume — the flagship run
refreshed with bf16-tier HVPs straight through the regime where those
refreshes are proven rounding noise.

This guard closes the gap with the measured-probe machinery
(:func:`krylov.driver.matvec_precision_probe`):

* **initial resolve** — at the params training actually starts from
  (after ``--resume_state``), walk the cost-ordered tier ladder and pick
  the first tier whose extreme-Ritz error vs the f32 referee is within
  the bar (the ``--refresh_precision auto`` entry);
* **periodic re-probe** — every ``recheck_every`` refreshes, re-measure
  the CURRENT tier at the CURRENT params (2x``ritz_iters`` HVPs — cheap
  next to the k-HVP refresh itself);
* **growth trigger** — landscape sharpening is the failure driver, so a
  ``growth_factor`` x jump of the refresh λmax since the last probe
  forces a re-probe regardless of cadence;
* **escalation** — on a breach, move up the ladder (re-probing each
  rung), swap the trainer's refresh-HVP program in place
  (``trainer.set_refresh_tier``), and log loudly.  Never de-escalates:
  sharpening is monotone in practice and a cheap-tier flap would churn
  compiles.

Every probe/escalation is recorded as a :class:`GuardEvent` — the A/B
evidence trail for whether LanczosSGD's win over Adam survives faithful
late-training curvature.

Reference role: the refresh-every-k loop this guards is
/root/reference/gpt2_hessian_gpu.py:209-240; the reference's CUDA
matmuls are f32-native and never faced the precision choice, so the
guard itself is TPU-native (SURVEY.md §2.6).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, List, Optional, Sequence, Tuple

import jax


@dataclasses.dataclass(frozen=True)
class GuardTier:
    """One rung of the escalation ladder."""

    label: str
    loss_fn: Callable[[Any, Any], jax.Array]  # refresh loss (tier model)
    precision: str  # outer jax.default_matmul_precision for the HVP


@dataclasses.dataclass(frozen=True)
class GuardEvent:
    """One probe (and its verdict) in the guard's evidence trail."""

    step: int  # optimizer step at probe time
    refresh_index: int  # how many refreshes had run
    tier: str  # tier label probed
    ritz_rel_err: float
    passed: bool
    escalated_to: Optional[str]  # next tier label when breached, else None
    trigger: str  # "initial" | "periodic" | "growth"
    eig_max: Optional[float]  # refresh λmax at probe time (None pre-refresh)

    def describe(self) -> str:
        verdict = "PASS" if self.passed else "BREACH"
        tail = (
            f" -> escalate to {self.escalated_to}"
            if self.escalated_to
            else ""
        )
        return (
            f"[precision-guard] step {self.step} refresh {self.refresh_index} "
            f"({self.trigger}): {self.tier} extreme-Ritz err "
            f"{self.ritz_rel_err:.3e} {verdict}{tail}"
        )


def default_tiers(
    make_loss_fn: Optional[Callable[[Any], Callable]],
    fallback_loss_fn: Callable,
) -> List[GuardTier]:
    """The measured cost-ordered ladder as guard tiers.

    LM models (``make_loss_fn`` from ``cli.common.lm_loss_factory``):
    mixed -> strict-high -> blocks-X6 -> highest — the
    ``krylov.autoprec.default_candidates`` ladder plus the referee rung.
    Models with no block-precision surface: high -> highest.
    """
    from hessian_llm_vision_tpu.krylov.autoprec import X6

    if make_loss_fn is None:
        return [
            GuardTier("high", fallback_loss_fn, "high"),
            GuardTier("highest", fallback_loss_fn, "highest"),
        ]
    return [
        GuardTier("mixed (all blocks 1-pass bf16)", make_loss_fn("default"), "high"),
        GuardTier("strict (all blocks high)", make_loss_fn(None), "high"),
        GuardTier(
            "blocks-X6 + head high",
            make_loss_fn({"block_matmul_precision": X6}),
            "high",
        ),
        GuardTier("highest (X6 everywhere)", make_loss_fn(None), "highest"),
    ]


def tier_index_for(tiers: Sequence[GuardTier], refresh_precision: str) -> int:
    """Starting rung for a user-pinned ``--refresh_precision`` value.

    'default'/'mixed' start at the cheapest rung; 'high' at the strict
    rung (for LM ladders) or rung 0 (non-LM); 'highest' at the top.
    The guard then only ever moves UP from the user's choice.
    """
    if refresh_precision == "highest":
        return len(tiers) - 1
    if refresh_precision == "high" and len(tiers) > 2:
        return 1  # strict rung of the LM ladder
    return 0


class RefreshPrecisionGuard:
    """Drift detection + auto-escalation for a host trainer's refreshes.

    ``probe_fn`` defaults to :func:`krylov.driver.matvec_precision_probe`
    and is injectable for tests (CPU matmuls are f32-native, so genuine
    tier error cannot be manufactured there).
    """

    def __init__(
        self,
        tiers: Sequence[GuardTier],
        *,
        referee_loss_fn: Callable[[Any, Any], jax.Array],
        bar: float = 2e-3,
        recheck_every: int = 10,
        ritz_iters: int = 8,
        growth_factor: float = 4.0,
        key: Optional[jax.Array] = None,
        start_index: int = 0,
        probe_fn: Optional[Callable] = None,
        log: Callable[[str], None] = print,
    ):
        if not tiers:
            raise ValueError("guard needs at least one tier")
        if not (0 <= start_index < len(tiers)):
            raise ValueError(f"start_index {start_index} out of range")
        self.tiers = list(tiers)
        self.index = start_index
        self.referee_loss_fn = referee_loss_fn
        self.bar = bar
        self.recheck_every = recheck_every
        self.ritz_iters = ritz_iters
        self.growth_factor = growth_factor
        self.key = key if key is not None else jax.random.PRNGKey(0)
        self._probe_fn = probe_fn
        self.log = log
        self.events: List[GuardEvent] = []
        self._eig_max_at_last_probe: Optional[float] = None

    @property
    def tier(self) -> GuardTier:
        return self.tiers[self.index]

    def _probe(self, params, batch) -> float:
        if self._probe_fn is not None:
            return float(
                self._probe_fn(self.tier, params, batch)
            )
        from hessian_llm_vision_tpu.krylov.driver import matvec_precision_probe

        stats = matvec_precision_probe(
            self.tier.loss_fn, params, batch,
            key=self.key,
            precision=self.tier.precision,
            referee_loss_fn=self.referee_loss_fn,
            ritz_iters=self.ritz_iters,
        )
        return float(stats["ritz_rel_err"])

    def _walk(
        self, trainer, params, batch, *, step: int, refresh_index: int,
        trigger: str, eig_max: Optional[float],
    ) -> GuardTier:
        """Probe the current rung; escalate (re-probing) until pass/top."""
        self._eig_max_at_last_probe = eig_max
        while True:
            err = self._probe(params, batch)
            passed = err <= self.bar
            at_top = self.index >= len(self.tiers) - 1
            escalate = not passed and not at_top
            ev = GuardEvent(
                step=step, refresh_index=refresh_index,
                tier=self.tier.label, ritz_rel_err=err, passed=passed,
                escalated_to=(
                    self.tiers[self.index + 1].label if escalate else None
                ),
                trigger=trigger, eig_max=eig_max,
            )
            self.events.append(ev)
            self.log(ev.describe())
            if passed:
                break
            if at_top:
                self.log(
                    "[precision-guard] WARNING: top tier "
                    f"{self.tier.label} still errs {err:.3e} > "
                    f"{self.bar:g} — refreshes keep the referee-grade tier"
                )
                break
            self.index += 1
            if trainer is not None:
                trainer.set_refresh_tier(self.tier)
        return self.tier

    def resolve_initial(self, trainer, params, batch, *, step: int = 0):
        """Walk the ladder at the ACTUAL starting params (post-resume)."""
        tier = self._walk(
            trainer, params, batch, step=step, refresh_index=0,
            trigger="initial", eig_max=None,
        )
        if trainer is not None:
            trainer.set_refresh_tier(tier)  # apply even when rung 0 passes
        return tier

    def maybe_recheck(
        self, trainer, params, batch, *, step: int, refresh_index: int,
        eig_max: Optional[float],
    ) -> bool:
        """Called by the trainer at every refresh boundary (pre-refresh).

        Returns True when a probe ran.  ``eig_max`` is the λmax the
        PREVIOUS refresh produced (the sharpening signal)."""
        periodic = (
            self.recheck_every > 0
            and refresh_index > 0
            and refresh_index % self.recheck_every == 0
        )
        grown = (
            eig_max is not None
            and self._eig_max_at_last_probe is not None
            and self._eig_max_at_last_probe > 0
            and eig_max / self._eig_max_at_last_probe >= self.growth_factor
        )
        if eig_max is not None and self._eig_max_at_last_probe is None:
            # first refresh after a pre-refresh probe: baseline the signal
            self._eig_max_at_last_probe = eig_max
        if not (periodic or grown):
            return False
        self._walk(
            trainer, params, batch, step=step, refresh_index=refresh_index,
            trigger="growth" if grown else "periodic", eig_max=eig_max,
        )
        return True

    def summary(self) -> dict:
        """JSON-safe evidence trail (saved next to training stats)."""
        return {
            "bar": self.bar,
            "recheck_every": self.recheck_every,
            "growth_factor": self.growth_factor,
            "final_tier": self.tier.label,
            "final_precision": self.tier.precision,
            "escalations": sum(
                1 for e in self.events if e.escalated_to is not None
            ),
            "events": [
                {
                    "step": e.step,
                    "refresh_index": e.refresh_index,
                    "tier": e.tier,
                    "ritz_rel_err": e.ritz_rel_err,
                    "passed": e.passed,
                    "escalated_to": e.escalated_to,
                    "trigger": e.trigger,
                    "eig_max": e.eig_max,
                }
                for e in self.events
            ],
        }
