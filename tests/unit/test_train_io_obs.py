"""Train loop, IO, and observability tests."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import optax

from hessian_llm_vision_tpu.train import (
    make_train_step,
    train,
    to_microbatches,
    evaluate_accuracy,
    per_batch_losses,
)
from hessian_llm_vision_tpu.io import (
    save_spectrum,
    load_spectrum,
    save_tridiag,
    load_tridiag,
    run_dir_name,
    parse_run_dir,
    save_checkpoint,
    load_checkpoint,
)
from hessian_llm_vision_tpu.krylov.slq import Spectrum
from hessian_llm_vision_tpu.obs import PickleStatsLogger, Timer, HVPMeter
from hessian_llm_vision_tpu.models import SpiralMLP, losses
from hessian_llm_vision_tpu.data import make_spirals


def _setup(key):
    x, y = make_spirals(240, seed=2)
    model = SpiralMLP(width=16, depth=2)
    params = model.init(key, x[:4])["params"]

    def loss_fn(p, b):
        return losses.softmax_cross_entropy(model.apply({"params": p}, b[0]), b[1])

    return model, params, loss_fn, (jnp.asarray(x), jnp.asarray(y))


def test_train_loop_decreases_loss(key):
    model, params, loss_fn, batch = _setup(key)
    init_fn, step_fn = make_train_step(loss_fn, optax.adam(3e-3))
    state = init_fn(params)
    logs = []
    state = train(
        step_fn,
        state,
        [batch] * 50,
        log_every=10,
        on_log=lambda s, m: logs.append((s, m)),
    )
    assert logs[0][1]["loss"] > logs[-1][1]["ema_loss"] * 0.8 or logs[-1][1][
        "loss"
    ] < logs[0][1]["loss"]
    assert "step_time" in logs[0][1]


def test_accum_step_matches_plain(key):
    model, params, loss_fn, batch = _setup(key)
    i1, s1 = make_train_step(loss_fn, optax.sgd(0.1))
    i2, s2 = make_train_step(loss_fn, optax.sgd(0.1), accum_steps=4)
    st1, m1 = jax.jit(s1)(i1(params), batch)
    st2, m2 = jax.jit(s2)(i2(params), to_microbatches(batch, 4))
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)
    for a, b in zip(
        jax.tree_util.tree_leaves(st1.params), jax.tree_util.tree_leaves(st2.params)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-6)


def test_eval_helpers(key):
    model, params, loss_fn, batch = _setup(key)
    acc = evaluate_accuracy(
        lambda p, x: model.apply({"params": p}, x), params, [(batch[0], batch[1])]
    )
    assert 0.0 <= acc <= 1.0
    pl = per_batch_losses(loss_fn, params, [batch, batch])
    assert pl.shape == (2,)
    np.testing.assert_allclose(pl[0], pl[1])


def test_spectrum_roundtrip(tmp_path):
    spec = Spectrum(
        eigvals=jnp.asarray([1.0, 2.0]),
        gammas=jnp.asarray([0.6, 0.4]),
        ritz_vectors=jnp.ones((2, 5)),
    )
    p = str(tmp_path / "spec.npz")
    save_spectrum(p, spec, iters=2, subsample=0.1)
    back = load_spectrum(p)
    np.testing.assert_allclose(back.eigvals, [1.0, 2.0])
    np.testing.assert_allclose(back.gammas, [0.6, 0.4])
    assert back.ritz_vectors.shape == (2, 5)


def test_tridiag_roundtrip(tmp_path):
    p = str(tmp_path / "T.npz")
    save_tridiag(p, [1.0, 2.0], [0.5], seed=997)
    a, b = load_tridiag(p)
    np.testing.assert_allclose(a, [1.0, 2.0])
    np.testing.assert_allclose(b, [0.5])


def test_run_dir_roundtrip():
    d = run_dir_name("training", "lanczos", 1, gpu=1, lr=0.001, k=100)
    assert d == os.path.join("training", "lanczos", "1", "gpu=1_lr=0.001_k=100")
    parsed = parse_run_dir(d)
    assert parsed == {"gpu": 1, "lr": 0.001, "k": 100}


def test_orbax_checkpoint_roundtrip(tmp_path, key):
    params = {"w": jax.random.normal(key, (4, 3)), "b": jnp.zeros((3,))}
    p = str(tmp_path / "ckpt")
    save_checkpoint(p, params)
    back = load_checkpoint(p, template=params)
    for a, b in zip(
        jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(back)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_pickle_stats_logger(tmp_path):
    p = str(tmp_path / "stats.pkl")
    lg = PickleStatsLogger(p, flush_every=2)
    lg.log(0, {"loss": 1.0})
    lg.log(1, {"loss": 0.9})  # flush happens here
    lg.log(2, {"loss": 0.8})
    lg.close()
    rows = PickleStatsLogger.read(p)
    assert [r["step"] for r in rows] == [0, 1, 2]


def test_timer_and_hvp_meter():
    t = Timer()
    with t.section("hvp"):
        pass
    with t.section("hvp"):
        pass
    assert t.counts["hvp"] == 2
    m = HVPMeter()
    m.record(10, 2.0)
    assert m.hvps_per_sec == 5.0


def test_load_reference_spectrum_artifact():
    """Golden: read a real reference eigeninfo artifact (BASELINE.md values)."""
    import pytest

    path = (
        "/root/reference/eigeninfo/gpt2_subsample=0.0001_iters=35_basis=False/"
        "results.ckpt"
    )
    if not os.path.exists(path):
        pytest.skip("reference artifacts not mounted")
    from hessian_llm_vision_tpu.io import load_reference_spectrum
    from hessian_llm_vision_tpu.krylov.slq import trace_estimate

    spec = load_reference_spectrum(path)
    assert spec.eigvals.shape == spec.gammas.shape
    np.testing.assert_allclose(float(spec.eigvals.max()), 36.55, atol=0.01)
    # the reference's headline sanity: trace estimate ~ 0 (BASELINE.md)
    assert abs(float(trace_estimate(spec))) < 1e-4
    np.testing.assert_allclose(float(np.sum(spec.gammas)), 1.0, atol=1e-4)
