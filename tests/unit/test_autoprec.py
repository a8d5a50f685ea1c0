"""Auto-precision planner: ladder logic, decision rule, fallbacks.

CPU matmuls are f32-native (no bf16 tiers), so genuine precision error
cannot be manufactured here; these tests drive the planner through its
``make_loss_fn(spec)`` contract with synthetic perturbations that mimic
the measured structure.  The real-hardware behavior is cross-checked by
bench.py's auto-precision section on every bench run.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hessian_llm_vision_tpu.krylov import (
    auto_precision_plan,
    escalation_prefixes,
    op_split_candidates,
    prefix_block_spec,
    spec_to_overrides,
)

N_LAYERS = 4
DIM = 6


def _perturbation_weight(spec, layer_errs, op_errs):
    """Synthetic error model mirroring the real precision semantics:
    a block at 'default' contributes layer_errs[i]; an op-type running
    at 'default' (blocks default AND no high override for it)
    contributes op_errs[op]."""
    overrides = spec if isinstance(spec, dict) else {
        "block_matmul_precision": spec
    }
    bmp = overrides.get("block_matmul_precision")
    per = list(bmp) if isinstance(bmp, (tuple, list)) else [bmp] * N_LAYERS
    eps = sum(e for p, e in zip(per, layer_errs) if p == "default")
    if any(p == "default" for p in per):
        for op in ("attn_scores", "attn_matmul", "mlp_matmul"):
            if overrides.get(f"{op}_precision") != "high":
                eps += op_errs.get(op, 0.0)
    return eps


def _make_loss_factory(layer_errs, op_errs=None):
    base = jnp.diag(jnp.linspace(1.0, 3.0, DIM))
    u = jnp.ones((DIM,)) / np.sqrt(DIM)
    op_errs = op_errs or {}

    def make_loss_fn(spec):
        eps = _perturbation_weight(spec, layer_errs, op_errs)
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


def test_spec_to_overrides():
    assert spec_to_overrides(None) == {"block_matmul_precision": None}
    assert spec_to_overrides("default") == {"block_matmul_precision": "default"}
    d = {"block_matmul_precision": "default", "attn_scores_precision": "high"}
    assert spec_to_overrides(d) == d


def test_plan_picks_pure_mixed_when_clean():
    make = _make_loss_factory([0.0] * N_LAYERS)
    plan = auto_precision_plan(
        make, _params(), None,
        key=jax.random.PRNGKey(0), ritz_iters=DIM, tol=1e-3,
    )
    assert plan.block_precision == "default"
    assert plan.hvp_precision == "high"
    assert plan.ritz_rel_err <= 1e-3
    assert len(plan.arms) == 1


def test_prefix_ladder_escalates_exactly_the_erring_prefix():
    # early-block error: h_0 and h_1 corrupt, h_2/h_3 clean
    make = _make_loss_factory([1.0, 0.5, 0.0, 0.0])
    plan = auto_precision_plan(
        make, _params(), None, N_LAYERS,
        key=jax.random.PRNGKey(0), ritz_iters=DIM, tol=1e-3,
        prefixes=escalation_prefixes(N_LAYERS),
    )
    assert plan.block_precision == ("high", "high", "default", "default")
    assert plan.ritz_rel_err <= 1e-3
    assert [a.ritz_rel_err <= 1e-3 for a in plan.arms] == [False, False, True]


def test_default_ladder_escalates_to_strict():
    # error tied to 'default' blocks: mixed fails, the strict rung of the
    # default ladder (mixed -> strict -> blocks-X6) wins
    make = _make_loss_factory([0.25] * N_LAYERS)
    plan = auto_precision_plan(
        make, _params(), None,
        key=jax.random.PRNGKey(0), ritz_iters=DIM, tol=1e-3,
    )
    assert plan.block_precision is None
    assert plan.hvp_precision == "high"
    assert "strict" in plan.label
    assert plan.arms[0].ritz_rel_err > 1e-3  # mixed failed first
    assert plan.ritz_rel_err <= 1e-3


def test_custom_candidates_pick_cheapest_passing_op_split():
    # error owned by the attention-core matmuls: with an explicit op-split
    # ladder the scores arm (cheapest) must win after mixed fails
    from hessian_llm_vision_tpu.krylov import op_split_candidates

    make = _make_loss_factory([0.0] * N_LAYERS, op_errs={"attn_scores": 1.0})
    cands = [("mixed", "default")] + op_split_candidates()
    plan = auto_precision_plan(
        make, _params(), None,
        key=jax.random.PRNGKey(0), ritz_iters=DIM, tol=1e-3,
        candidates=cands,
    )
    assert isinstance(plan.block_precision, dict)
    assert plan.block_precision["attn_scores_precision"] == "high"
    assert plan.arms[0].ritz_rel_err > 1e-3  # mixed failed
    assert plan.label == "mixed+scores-high"


def test_failing_candidate_arm_is_skipped_not_fatal():
    # an arm whose loss factory raises (e.g. backend rejects the dot
    # algorithm) is skipped with a log, not a crash
    base = _make_loss_factory([1.0] * N_LAYERS)

    def make(spec):
        if isinstance(spec, dict):
            raise RuntimeError("algorithm unsupported")
        return base(spec)

    logs = []
    plan = auto_precision_plan(
        make, _params(), None,
        key=jax.random.PRNGKey(0), ritz_iters=DIM, tol=1e-3,
        log=logs.append,
        candidates=[
            ("x6-arm", {"block_matmul_precision": "BF16_BF16_F32_X6"}),
            ("strict (all blocks high)", None),
        ],
    )
    assert "strict" in plan.label
    assert any("SKIPPED" in line for line in logs)


def test_plan_requires_exactly_one_seed():
    make = _make_loss_factory([0.0] * N_LAYERS)
    with pytest.raises(ValueError, match="exactly one"):
        auto_precision_plan(make, _params(), None)


def test_plan_rejects_zero_iters():
    make = _make_loss_factory([0.0] * N_LAYERS)
    with pytest.raises(ValueError, match="ritz_iters"):
        auto_precision_plan(
            make, _params(), None, key=jax.random.PRNGKey(0), ritz_iters=0
        )


def test_plan_describe_mentions_every_arm():
    make = _make_loss_factory([1.0] * N_LAYERS)
    logs = []
    plan = auto_precision_plan(
        make, _params(), None,
        key=jax.random.PRNGKey(0), ritz_iters=DIM, tol=1e-3,
        log=logs.append,
    )
    desc = plan.describe()
    for a in plan.arms:
        assert a.label in desc
    assert any("referee" in line for line in logs)
