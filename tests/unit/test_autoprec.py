"""Auto-precision planner: ladder logic, decision rule, fallbacks.

CPU matmuls are f32-native (no bf16 tiers), so genuine precision error
cannot be manufactured here; these tests drive the planner through its
``make_loss_fn(block_spec)`` contract with synthetic per-layer
perturbations that mimic the measured structure (error concentrated in
EARLY blocks, artifacts/trained124m_r3/README.md).  The real-hardware
behavior is cross-checked by bench.py's auto-precision section on every
bench run.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hessian_llm_vision_tpu.krylov import (
    auto_precision_plan,
    escalation_prefixes,
    prefix_block_spec,
)

N_LAYERS = 4
DIM = 6


def _make_loss_factory(layer_errs):
    """Quadratic loss; each 'default'-precision layer i adds a rank-1
    curvature perturbation of magnitude layer_errs[i] (the synthetic
    stand-in for bf16 rounding in that block's matmuls)."""
    base = jnp.diag(jnp.linspace(1.0, 3.0, DIM))
    u = jnp.ones((DIM,)) / np.sqrt(DIM)

    def make_loss_fn(spec):
        if spec is None:
            per = [None] * N_LAYERS
        elif isinstance(spec, str):
            per = [spec] * N_LAYERS
        else:
            per = list(spec)
        eps = sum(
            e for p, e in zip(per, layer_errs) if p == "default"
        )
        H = base + eps * jnp.outer(u, u)

        def loss_fn(params, batch):
            x = params["x"]
            return 0.5 * x @ H @ x

        return loss_fn

    return make_loss_fn


def _params():
    return {"x": jnp.zeros((DIM,), jnp.float32)}


def test_escalation_prefixes():
    assert escalation_prefixes(12) == (0, 1, 2, 3, 6)
    assert escalation_prefixes(4) == (0, 1, 2, 3)
    assert escalation_prefixes(2) == (0, 1)
    assert escalation_prefixes(1) == (0,)


def test_prefix_block_spec():
    assert prefix_block_spec(4, 0) == "default"
    assert prefix_block_spec(4, 2) == ("high", "high", "default", "default")
    assert prefix_block_spec(4, 4) == "high"
    assert prefix_block_spec(4, 9) == "high"


def test_plan_picks_pure_mixed_when_clean():
    make = _make_loss_factory([0.0] * N_LAYERS)
    plan = auto_precision_plan(
        make, _params(), None, N_LAYERS,
        key=jax.random.PRNGKey(0), ritz_iters=DIM, tol=1e-3,
    )
    assert plan.block_precision == "default"
    assert plan.hvp_precision == "high"
    assert plan.ritz_rel_err <= 1e-3
    assert len(plan.arms) == 1


def test_plan_escalates_exactly_the_erring_prefix():
    # early-block error dominates (the measured trained-ckpt structure):
    # h_0 and h_1 each corrupt, h_2/h_3 are clean
    make = _make_loss_factory([1.0, 0.5, 0.0, 0.0])
    plan = auto_precision_plan(
        make, _params(), None, N_LAYERS,
        key=jax.random.PRNGKey(0), ritz_iters=DIM, tol=1e-3,
    )
    assert plan.block_precision == ("high", "high", "default", "default")
    assert plan.ritz_rel_err <= 1e-3
    # probed mixed (fail), prefix1 (fail), prefix2 (pass)
    assert [a.ritz_rel_err <= 1e-3 for a in plan.arms] == [False, False, True]


def test_plan_falls_back_to_strict_when_every_prefix_fails():
    # error in the LAST layer: no prefix < L can fix it; strict (all
    # blocks escalated) must win
    make = _make_loss_factory([0.0, 0.0, 0.0, 1.0])
    plan = auto_precision_plan(
        make, _params(), None, N_LAYERS,
        key=jax.random.PRNGKey(0), ritz_iters=DIM, tol=1e-3,
    )
    assert plan.block_precision is None
    assert plan.hvp_precision == "high"
    assert "strict" in plan.label
    assert plan.ritz_rel_err <= 1e-3


def test_plan_requires_exactly_one_seed():
    make = _make_loss_factory([0.0] * N_LAYERS)
    with pytest.raises(ValueError, match="exactly one"):
        auto_precision_plan(make, _params(), None, N_LAYERS)


def test_plan_describe_mentions_every_arm():
    make = _make_loss_factory([1.0, 0.0, 0.0, 0.0])
    logs = []
    plan = auto_precision_plan(
        make, _params(), None, N_LAYERS,
        key=jax.random.PRNGKey(0), ritz_iters=DIM, tol=1e-3,
        log=logs.append,
    )
    desc = plan.describe()
    for a in plan.arms:
        assert a.label in desc
    assert any("referee" in line for line in logs)
