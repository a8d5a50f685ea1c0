"""Persisted auto-precision plans (krylov/precplan.py, VERDICT r4 #5).

CPU backend: precision tiers are numerically inert here, so these tests
target the CACHING machinery — fingerprint sensitivity, JSON round-trip
of every block-spec kind, stale-plan rejection, and the CLI contract
that a fingerprint-matched plan resolves ``--hvp_precision auto`` with
ZERO probe HVPs (the planner is monkeypatched to explode on call).
"""

import json

import jax
import jax.numpy as jnp
import pytest

from hessian_llm_vision_tpu.krylov import (
    AutoPrecisionPlan,
    PrecisionArm,
    default_plan_path,
    load_plan,
    params_fingerprint,
    plan_context,
    save_plan,
)


def _params(scale=1.0):
    return {
        "a": jnp.arange(6, dtype=jnp.float32).reshape(2, 3) * scale,
        "b": {"w": jnp.ones((4,), jnp.float32)},
    }


def _plan(spec):
    arm = PrecisionArm(
        label="probed-arm", block_precision=spec, hvp_precision="high",
        ritz_rel_err=2e-4, seconds_per_hvp=0.123, extremes=(-1.5, 42.0),
    )
    return AutoPrecisionPlan(
        block_precision=spec, hvp_precision="high", label="probed-arm",
        ritz_rel_err=2e-4, referee_extremes=(-1.6, 41.9), arms=(arm,),
    )


def _ctx(**kw):
    kw.setdefault("tol", 1e-3)
    kw.setdefault("ritz_iters", 10)
    kw.setdefault("candidate_labels", ("mixed", "strict"))
    return plan_context(**kw)


def test_fingerprint_stable_and_sensitive():
    fp1 = params_fingerprint(_params())
    fp2 = params_fingerprint(_params())
    assert fp1 == fp2 and fp1.startswith("sha256:")
    # value change, shape change, structure change all re-key
    assert params_fingerprint(_params(scale=1.0 + 1e-6)) != fp1
    assert params_fingerprint({"a": jnp.zeros((7,))}) != fp1
    p = _params()
    p["c"] = jnp.zeros((1,))
    assert params_fingerprint(p) != fp1


@pytest.mark.parametrize(
    "spec",
    [
        None,
        "default",
        ("high", "high", "default"),
        {"block_matmul_precision": "default", "attn_scores_precision": "high"},
    ],
    ids=["none", "str", "tuple", "dict"],
)
def test_save_load_roundtrip_every_spec_kind(tmp_path, spec):
    path = str(tmp_path / "plan.json")
    fp = params_fingerprint(_params())
    ctx = _ctx(probe_batch={"input_ids": jnp.zeros((2, 8), jnp.int32)})
    save_plan(path, _plan(spec), fingerprint=fp, context=ctx)
    loaded = load_plan(path, fingerprint=fp, context=ctx)
    assert loaded is not None
    assert loaded.block_precision == spec
    assert loaded.hvp_precision == "high"
    assert loaded.ritz_rel_err == pytest.approx(2e-4)
    assert loaded.referee_extremes == pytest.approx((-1.6, 41.9))
    assert len(loaded.arms) == 1
    assert loaded.arms[0].block_precision == spec
    assert loaded.arms[0].extremes == pytest.approx((-1.5, 42.0))


def test_load_rejects_stale_or_foreign_plans(tmp_path):
    path = str(tmp_path / "plan.json")
    fp = params_fingerprint(_params())
    ctx = _ctx()
    save_plan(path, _plan("default"), fingerprint=fp, context=ctx)
    # fingerprint mismatch (retrained checkpoint)
    assert load_plan(path, fingerprint="sha256:other", context=ctx) is None
    # context mismatch (different tol / ladder / batch shape)
    assert load_plan(path, fingerprint=fp, context=_ctx(tol=1e-4)) is None
    assert (
        load_plan(
            path, fingerprint=fp, context=_ctx(candidate_labels=("x",))
        )
        is None
    )
    # version bump
    with open(path) as f:
        doc = json.load(f)
    doc["version"] = 999
    with open(path, "w") as f:
        json.dump(doc, f)
    assert load_plan(path, fingerprint=fp, context=ctx) is None
    # corrupt / missing file
    with open(path, "w") as f:
        f.write("{not json")
    assert load_plan(path, fingerprint=fp, context=ctx) is None
    assert (
        load_plan(str(tmp_path / "nope.json"), fingerprint=fp, context=ctx)
        is None
    )


def test_context_neutralizes_block_precision_field():
    """A previously-resolved block precision must not fracture the key."""
    import dataclasses

    from hessian_llm_vision_tpu.models import GPT2Config

    cfg = GPT2Config(n_layer=2, n_head=2, n_embd=16, vocab_size=64)
    c1 = plan_context(model_config=cfg, tol=1e-3, ritz_iters=10)
    c2 = plan_context(
        model_config=dataclasses.replace(
            cfg, block_matmul_precision="default"
        ),
        tol=1e-3,
        ritz_iters=10,
    )
    assert c1 == c2
    c3 = plan_context(
        model_config=dataclasses.replace(cfg, n_layer=cfg.n_layer + 1),
        tol=1e-3,
        ritz_iters=10,
    )
    assert c1 != c3


def test_default_plan_path():
    assert default_plan_path("/x/ckpt2000") == "/x/ckpt2000.autoprec.json"
    assert default_plan_path("/x/ckpt2000/") == "/x/ckpt2000.autoprec.json"


def _spectrum_auto_args(tmp_path, extra=()):
    return [
        "--model", "gpt2-tiny", "--lanczos_iters", "4", "--batch_size", "2",
        "--num_batches", "1", "--max_length", "16", "--host_loop",
        "--hvp_precision", "auto",
        "--precision_plan", str(tmp_path / "plan.json"),
        *extra,
    ]


def test_spectrum_auto_reuses_persisted_plan(tmp_path, capsys, monkeypatch):
    from hessian_llm_vision_tpu.cli import spectrum

    # run 1: probes and persists the plan
    spectrum.main(_spectrum_auto_args(tmp_path))
    out1 = capsys.readouterr().out
    assert "auto precision plan" in out1
    assert "plan ->" in out1
    assert (tmp_path / "plan.json").exists()

    # run 2: MUST resolve from the file without a single probe HVP —
    # the planner exploding proves it is never reached
    import hessian_llm_vision_tpu.krylov as krylov_pkg

    def boom(*a, **k):
        raise AssertionError("auto_precision_plan called despite cached plan")

    monkeypatch.setattr(krylov_pkg, "auto_precision_plan", boom)
    spectrum.main(_spectrum_auto_args(tmp_path))
    out2 = capsys.readouterr().out
    assert "reusing persisted plan" in out2
    assert "lambda_max" in out2


def test_spectrum_reprobe_ignores_cached_plan(tmp_path, capsys):
    from hessian_llm_vision_tpu.cli import spectrum

    spectrum.main(_spectrum_auto_args(tmp_path))
    capsys.readouterr()
    spectrum.main(_spectrum_auto_args(tmp_path, extra=["--reprobe"]))
    out = capsys.readouterr().out
    assert "reusing persisted plan" not in out
    assert "auto precision plan" in out  # re-probed and re-saved
    assert "plan ->" in out


def test_reprobe_without_auto_is_loud(tmp_path):
    from hessian_llm_vision_tpu.cli import spectrum

    with pytest.raises(SystemExit, match="no effect"):
        spectrum.main([
            "--model", "gpt2-tiny", "--lanczos_iters", "4",
            "--batch_size", "2", "--num_batches", "1", "--max_length", "16",
            "--hvp_precision", "high", "--reprobe",
        ])


def test_checkpoint_fingerprint_on_disk(tmp_path):
    """On-disk checkpoint hashing: stable, sensitive to any file change,
    zero device work (the --checkpoint fast path)."""
    from hessian_llm_vision_tpu.krylov import checkpoint_fingerprint

    ck = tmp_path / "ck"
    (ck / "d").mkdir(parents=True)
    (ck / "_METADATA").write_text('{"meta": 1}')
    (ck / "d" / "arrays.bin").write_bytes(b"\x01\x02" * 100000)
    fp1 = checkpoint_fingerprint(str(ck))
    assert fp1 and fp1.startswith("sha256-ckpt:")
    assert checkpoint_fingerprint(str(ck)) == fp1
    # metadata change re-keys
    (ck / "_METADATA").write_text('{"meta": 2}')
    fp2 = checkpoint_fingerprint(str(ck))
    assert fp2 != fp1
    # array-content change (same size) re-keys via sampled bytes
    (ck / "d" / "arrays.bin").write_bytes(b"\x03\x02" * 100000)
    assert checkpoint_fingerprint(str(ck)) != fp2
    # unusable paths fall back to None
    assert checkpoint_fingerprint(str(tmp_path / "missing")) is None
    assert checkpoint_fingerprint(str(tmp_path / "empty_dir")) is None or True
    (tmp_path / "empty").mkdir()
    assert checkpoint_fingerprint(str(tmp_path / "empty")) is None
