"""In-training refresh-precision guard (optim/precision_guard.py,
VERDICT r4 #3).

CPU matmul tiers are numerically inert, so the escalation physics are
manufactured two ways:

* synthetic-sharpening integration tests drive a REAL
  HostLanczosSGDTrainer + REAL probes through tier loss closures whose
  curvature error grows with a batch-carried sharpness scale — the exact
  failure mode measured on TPU (error ∝ curvature scale,
  artifacts/trained124m_r4/) reproduced deterministically;
* stub-probe unit tests pin the trigger logic (periodic cadence, λmax
  growth, never-de-escalate, top-tier warning).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hessian_llm_vision_tpu.optim import (
    GuardTier,
    LanczosSGDConfig,
    RefreshPrecisionGuard,
    default_tiers,
    tier_index_for,
)
from hessian_llm_vision_tpu.optim.lanczos_sgd_host import HostLanczosSGDTrainer

DIM = 6
H = jnp.diag(jnp.linspace(1.0, 4.0, DIM))
U = jnp.eye(DIM)[0]


def _exact_loss(params, batch):
    x = params["x"]
    return 0.5 * batch["s"] * (x @ H @ x)


def _cheap_loss(params, batch):
    # curvature error grows with the sharpness scale s — relative
    # extreme-Ritz error ~ (1e-3/4)*s: passes the 2e-3 bar at s=1,
    # breaches it once the landscape has sharpened past s~10
    x = params["x"]
    s = batch["s"]
    return _exact_loss(params, batch) + 0.5 * 1e-3 * s**2 * (U @ x) ** 2


def _params():
    return {"x": jnp.full((DIM,), 0.5, jnp.float32)}


def _batch(s):
    return {"s": jnp.float32(s)}


def _tiers():
    return [
        GuardTier("cheap", _cheap_loss, "high"),
        GuardTier("exact", _exact_loss, "high"),
    ]


def _trainer(loss_fn=_cheap_loss, **cfg_kw):
    cfg = LanczosSGDConfig(
        k=4, delta=1e-4, lr=0.0, momentum=0.0, refresh_every=1,
        normalization="mean", **cfg_kw,
    )
    return HostLanczosSGDTrainer(loss_fn, _params(), cfg)


class _FakeTrainer:
    def __init__(self):
        self.tiers_applied = []

    def set_refresh_tier(self, tier):
        self.tiers_applied.append(tier.label)


def test_resolve_initial_passes_cheap_tier_at_low_sharpness():
    tr = _trainer()
    guard = RefreshPrecisionGuard(
        _tiers(), referee_loss_fn=_exact_loss, ritz_iters=DIM,
        key=jax.random.PRNGKey(0),
    )
    tier = guard.resolve_initial(tr, _params(), _batch(1.0))
    assert tier.label == "cheap"
    assert guard.events[-1].passed and guard.events[-1].trigger == "initial"
    assert tr.refresh_loss_fn is _cheap_loss


def test_resolve_initial_escalates_at_high_sharpness():
    """The --resume_state scenario: a tier that was fine at init breaches
    at the resumed (sharpened) checkpoint, so resolve walks the ladder."""
    tr = _trainer()
    guard = RefreshPrecisionGuard(
        _tiers(), referee_loss_fn=_exact_loss, ritz_iters=DIM,
        key=jax.random.PRNGKey(0),
    )
    tier = guard.resolve_initial(tr, _params(), _batch(50.0))
    assert tier.label == "exact"
    assert [e.passed for e in guard.events] == [False, True]
    assert guard.events[0].escalated_to == "exact"
    assert tr.refresh_loss_fn is _exact_loss


def test_growth_trigger_escalates_during_training():
    """Synthetic sharpening schedule end-to-end: real trainer, real
    probes.  The cheap tier passes the initial resolve, the landscape
    sharpens 20x, the λmax-growth trigger fires a re-probe, the guard
    escalates, and the post-escalation refresh matches the exact
    operator."""
    tr = _trainer()
    guard = RefreshPrecisionGuard(
        _tiers(), referee_loss_fn=_exact_loss, ritz_iters=DIM,
        recheck_every=0,  # growth trigger only
        growth_factor=4.0, key=jax.random.PRNGKey(0),
    )
    tr.precision_guard = guard
    guard.resolve_initial(tr, _params(), _batch(1.0))
    assert guard.tier.label == "cheap"

    state = tr.init(_params())
    state, _ = tr.step(state, _batch(1.0))   # refresh 0: baseline λmax≈4
    state, _ = tr.step(state, _batch(20.0))  # refresh 1: sharpens to ≈80
    assert guard.tier.label == "cheap"  # trigger sees PREVIOUS λmax here
    state, _ = tr.step(state, _batch(20.0))  # refresh 2: growth probe fires
    growth_events = [e for e in guard.events if e.trigger == "growth"]
    assert growth_events and not growth_events[0].passed
    assert guard.tier.label == "exact"
    assert tr.refresh_loss_fn is _exact_loss
    # post-escalation refresh reproduces the exact operator's extremes
    # k=4 grad-seeded Lanczos at DIM=6: λmax converged to ~0.5%
    np.testing.assert_allclose(
        float(state.eigvals[-1]), 20.0 * 4.0, rtol=1e-2
    )


def test_periodic_recheck_cadence_and_escalation():
    verdicts = iter([0.0, 0.0, 1.0, 0.0])  # 3rd probe breaches
    probed = []

    def probe(tier, params, batch):
        probed.append(tier.label)
        return next(verdicts)

    ft = _FakeTrainer()
    guard = RefreshPrecisionGuard(
        _tiers(), referee_loss_fn=_exact_loss, recheck_every=5,
        probe_fn=probe,
    )
    guard.resolve_initial(ft, _params(), _batch(1.0))  # probe 1: pass
    for i in range(1, 11):
        guard.maybe_recheck(
            ft, _params(), _batch(1.0), step=i, refresh_index=i,
            eig_max=4.0,
        )
    # probes at refresh 5 (pass) and 10 (breach -> escalate -> re-probe)
    assert probed == ["cheap", "cheap", "cheap", "exact"]
    assert guard.tier.label == "exact"
    assert ft.tiers_applied[-1] == "exact"
    triggers = [e.trigger for e in guard.events]
    assert triggers == ["initial", "periodic", "periodic", "periodic"]


def test_top_tier_breach_warns_but_never_wraps():
    logs = []
    guard = RefreshPrecisionGuard(
        _tiers(), referee_loss_fn=_exact_loss,
        probe_fn=lambda *a: 1.0, log=logs.append,
    )
    guard.resolve_initial(_FakeTrainer(), _params(), _batch(1.0))
    assert guard.tier.label == "exact"  # walked to the top and stayed
    assert any("WARNING" in line for line in logs)
    assert all(e.passed is False for e in guard.events)


def test_summary_is_json_safe():
    import json

    guard = RefreshPrecisionGuard(
        _tiers(), referee_loss_fn=_exact_loss, probe_fn=lambda *a: 0.0,
    )
    guard.resolve_initial(_FakeTrainer(), _params(), _batch(1.0))
    s = json.loads(json.dumps(guard.summary()))
    assert s["final_tier"] == "cheap"
    assert s["escalations"] == 0
    assert len(s["events"]) == 1


def test_guard_validates_inputs():
    with pytest.raises(ValueError, match="at least one"):
        RefreshPrecisionGuard([], referee_loss_fn=_exact_loss)
    with pytest.raises(ValueError, match="start_index"):
        RefreshPrecisionGuard(
            _tiers(), referee_loss_fn=_exact_loss, start_index=5
        )


def test_default_tiers_and_start_index():
    tiers = default_tiers(None, _exact_loss)
    assert [t.label for t in tiers] == ["high", "highest"]
    assert tier_index_for(tiers, "high") == 0
    assert tier_index_for(tiers, "highest") == 1

    def factory(spec):
        return _exact_loss

    lm = default_tiers(factory, _exact_loss)
    assert len(lm) == 4
    assert tier_index_for(lm, "high") == 1
    assert tier_index_for(lm, "default") == 0
    assert tier_index_for(lm, "highest") == 3


def test_train_cli_auto_guard(tmp_path, capsys):
    from hessian_llm_vision_tpu.cli import train

    train.main([
        "--model", "gpt2-tiny", "--optimiser", "lanczos-host",
        "--batch_size", "2", "--max_length", "16", "--num_batches", "2",
        "--max_steps", "3", "--k", "3", "--refresh_every", "2",
        "--refresh_precision", "auto", "--out", str(tmp_path),
    ])
    out = capsys.readouterr().out
    assert "[precision-guard] refresh tier resolved" in out
    assert "final tier" in out
    import glob
    import json

    (guard_file,) = glob.glob(str(tmp_path / "**" / "precision_guard.json"),
                              recursive=True)
    doc = json.load(open(guard_file))
    assert doc["events"][0]["trigger"] == "initial"


def test_train_cli_recheck_guards_pinned_tier(tmp_path, capsys):
    from hessian_llm_vision_tpu.cli import train

    train.main([
        "--model", "gpt2-tiny", "--optimiser", "lanczos-host",
        "--batch_size", "2", "--max_length", "16", "--num_batches", "2",
        "--max_steps", "2", "--k", "3",
        "--refresh_precision", "high", "--precision_recheck", "1",
        "--out", str(tmp_path),
    ])
    out = capsys.readouterr().out
    assert "guarding pinned tier strict" in out


def test_train_cli_guard_requires_host_optimiser(tmp_path):
    from hessian_llm_vision_tpu.cli import train

    with pytest.raises(SystemExit, match="HOST trainers"):
        train.main([
            "--model", "gpt2-tiny", "--optimiser", "adam",
            "--refresh_precision", "auto", "--out", str(tmp_path),
        ])
    with pytest.raises(SystemExit, match="HOST trainers"):
        train.main([
            "--model", "gpt2-tiny", "--optimiser", "adam",
            "--precision_recheck", "5", "--out", str(tmp_path),
        ])


def test_layerwise_trainer_guard_integration():
    """The layerwise host trainer consults the guard at refresh
    boundaries and applies escalations to its masked-HVP program."""
    from hessian_llm_vision_tpu.optim.lanczos_sgd_host import (
        HostLayerwiseLanczosSGDTrainer,
    )
    from hessian_llm_vision_tpu.optim import LanczosSGDConfig

    cfg = LanczosSGDConfig(
        k=3, delta=1e-3, lr=0.0, momentum=0.0, refresh_every=1,
        normalization="mean",
    )
    params = {"a": jnp.linspace(1.0, 2.0, 8), "b": jnp.ones((6,))}

    def loss_a(p, batch):
        return 0.5 * (p["a"] @ p["a"]) + 0.5 * 3.0 * (p["b"] @ p["b"])

    tr = HostLayerwiseLanczosSGDTrainer(loss_a, params, cfg)
    verdicts = iter([0.0, 1.0, 0.0])  # 2nd probe breaches -> escalate
    probed = []

    def probe(tier, p, b):
        probed.append(tier.label)
        return next(verdicts)

    guard = RefreshPrecisionGuard(
        [GuardTier("cheap", loss_a, "high"), GuardTier("exact", loss_a, "highest")],
        referee_loss_fn=loss_a, recheck_every=2, probe_fn=probe,
    )
    tr.precision_guard = guard
    guard.resolve_initial(tr, params, {"s": jnp.float32(1.0)})
    assert tr.refresh_precision == "high"
    state = tr.init(params)
    for i in range(3):
        state, _ = tr.step(state, {"s": jnp.float32(1.0)})
    # probes: initial (pass), recheck at refresh 2 (breach -> exact pass)
    assert probed == ["cheap", "cheap", "exact"]
    assert guard.tier.label == "exact"
    assert tr.refresh_precision == "highest"
