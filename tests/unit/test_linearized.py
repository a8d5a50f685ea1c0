"""Linearized HVPs (curvature/linearized.py): the tangent program must be
the SAME linear map as the Pearlmutter HVP — primal paid once, every
subsequent matvec on the residuals alone.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hessian_llm_vision_tpu.curvature import (
    hvp_fn,
    linearized_hvp_programs,
    linearized_matvec,
    residual_bytes,
)
from hessian_llm_vision_tpu.utils.flatten import Flattener


def _mlp_workload():
    from hessian_llm_vision_tpu.data import make_spirals
    from hessian_llm_vision_tpu.models import SpiralMLP, losses

    model = SpiralMLP(width=8, depth=1)
    x, y = make_spirals(60, num_classes=3, seed=0)
    params = model.init(jax.random.PRNGKey(0), x[:4])["params"]
    loss_fn = losses.classification_loss_fn(model)
    return loss_fn, params, (jnp.asarray(x), jnp.asarray(y))


def _lm_workload():
    from hessian_llm_vision_tpu.models import GPT2Config, GPT2LMHead, losses

    cfg = GPT2Config(
        n_layer=2, n_head=2, n_embd=32, vocab_size=64, n_positions=32,
        attn_block_q=16,
    )
    model = GPT2LMHead(cfg)
    params = model.init_params(jax.random.PRNGKey(0), seq_len=32)
    loss_fn = losses.lm_loss_fn(model, loss_chunk=16)
    ids = jax.random.randint(jax.random.PRNGKey(1), (2, 32), 0, 64)
    return loss_fn, params, {"input_ids": ids}


@pytest.mark.parametrize("workload", [_mlp_workload, _lm_workload],
                         ids=["mlp", "gpt2"])
def test_tangent_matches_pearlmutter_hvp(workload):
    loss_fn, params, batch = workload()
    fl = Flattener(params)
    matvec = linearized_matvec(loss_fn, params, batch, flattener=fl)
    ref = hvp_fn(loss_fn, precision=None)
    for seed in (2, 3):
        v = jax.random.normal(jax.random.PRNGKey(seed), (fl.size,))
        hv = np.asarray(matvec(v))
        hv_ref = np.asarray(fl.flatten(ref(params, batch, fl.unflatten(v))))
        scale = max(np.linalg.norm(hv_ref), 1e-30)
        assert np.linalg.norm(hv - hv_ref) / scale < 1e-5


def test_linearity_and_reuse_across_vectors():
    loss_fn, params, batch = _mlp_workload()
    fl = Flattener(params)
    matvec = linearized_matvec(loss_fn, params, batch, flattener=fl)
    v1 = jax.random.normal(jax.random.PRNGKey(4), (fl.size,))
    v2 = jax.random.normal(jax.random.PRNGKey(5), (fl.size,))
    lhs = np.asarray(matvec(2.0 * v1 - 3.0 * v2))
    rhs = np.asarray(2.0 * matvec(v1) - 3.0 * matvec(v2))
    np.testing.assert_allclose(lhs, rhs, rtol=1e-4, atol=1e-5)


def test_normalization_conventions_scale_the_map():
    loss_fn, params, batch = _mlp_workload()
    fl = Flattener(params)
    v = jax.random.normal(jax.random.PRNGKey(6), (fl.size,))
    mean = linearized_matvec(loss_fn, params, batch, flattener=fl)(v)
    summed = linearized_matvec(
        loss_fn, params, batch, normalization="sum", batch_size=60,
        flattener=fl,
    )(v)
    np.testing.assert_allclose(
        np.asarray(summed), 60.0 * np.asarray(mean), rtol=1e-4
    )


def test_lanczos_on_linearized_matvec_matches_dense():
    """End-to-end: full-rank Lanczos over the tangent map reproduces the
    dense Hessian spectrum (the consumer contract for spectrum jobs)."""
    from hessian_llm_vision_tpu.krylov import lanczos, ritz_decomposition

    loss_fn, params, batch = _mlp_workload()
    fl = Flattener(params)
    matvec = linearized_matvec(loss_fn, params, batch, flattener=fl)
    res = lanczos(matvec, fl.size, min(fl.size, 40), key=jax.random.PRNGKey(7),
                  reorth=True)
    spec = ritz_decomposition(res)
    # dense hessian via forward jacobian of the flat gradient
    def flat_grad(vp):
        g = jax.grad(loss_fn)(fl.unflatten(vp), batch)
        return fl.flatten(g)

    H = jax.jacfwd(flat_grad)(fl.flatten(params))
    true_ev = np.linalg.eigvalsh(np.asarray(H))
    got = np.sort(np.asarray(spec.eigvals))
    np.testing.assert_allclose(got[-1], true_ev[-1], rtol=1e-4)
    np.testing.assert_allclose(got[0], true_ev[0], rtol=1e-3, atol=1e-5)


def test_residual_bytes_abstract_and_positive():
    loss_fn, params, batch = _lm_workload()
    n = residual_bytes(loss_fn, params, batch)
    assert n > 0
    # abstract templates work too (no concrete arrays needed)
    import jax.tree_util as jtu

    p_avals = jtu.tree_map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), params
    )
    b_avals = {"input_ids": jax.ShapeDtypeStruct((2, 32), jnp.int32)}
    assert residual_bytes(loss_fn, p_avals, b_avals) == n


def test_linearized_refresh_matches_standard_trainer():
    """HostLanczosSGDTrainer(refresh_linearized=True) must walk the SAME
    trajectory as the standard trainer — the tangent map is the same
    operator, so eigvals/params match to f32 tolerance."""
    from hessian_llm_vision_tpu.optim import LanczosSGDConfig
    from hessian_llm_vision_tpu.optim.lanczos_sgd_host import (
        HostLanczosSGDTrainer,
    )
    from hessian_llm_vision_tpu.utils.flatten import Flattener

    loss_fn, params, batch = _mlp_workload()
    cfg = LanczosSGDConfig(
        k=4, delta=1e-3, lr=0.05, momentum=0.9, refresh_every=2,
        normalization="mean",
    )
    t_std = HostLanczosSGDTrainer(loss_fn, params, cfg)
    t_lin = HostLanczosSGDTrainer(loss_fn, params, cfg,
                                  refresh_linearized=True)
    s_std, s_lin = t_std.init(params), t_lin.init(params)
    for _ in range(4):
        s_std, m_std = t_std.step(s_std, batch)
        s_lin, m_lin = t_lin.step(s_lin, batch)
    np.testing.assert_allclose(
        np.asarray(s_std.eigvals), np.asarray(s_lin.eigvals),
        rtol=1e-4, atol=1e-6,
    )
    fl = Flattener(params)
    np.testing.assert_allclose(
        np.asarray(fl.flatten(s_std.params)),
        np.asarray(fl.flatten(s_lin.params)),
        rtol=1e-4, atol=1e-6,
    )


def test_train_cli_refresh_linearized(tmp_path, capsys):
    from hessian_llm_vision_tpu.cli import train

    train.main([
        "--model", "gpt2-tiny", "--optimiser", "lanczos-host",
        "--batch_size", "2", "--max_length", "16", "--num_batches", "2",
        "--max_steps", "2", "--k", "3", "--refresh_linearized",
        "--out", str(tmp_path),
    ])
    assert "loss" in capsys.readouterr().out

    import pytest

    with pytest.raises(SystemExit, match="lanczos-host"):
        train.main([
            "--model", "gpt2-tiny", "--optimiser", "adam",
            "--refresh_linearized", "--out", str(tmp_path),
        ])


def test_spectrum_cli_linearized_matches_plain(tmp_path, capsys):
    """--linearized host-loop spectrum == the plain host loop (same probe
    seed, same operator — the tangent map is the same linear map)."""
    from hessian_llm_vision_tpu.cli import spectrum

    common = [
        "--model", "gpt2-tiny", "--lanczos_iters", "6", "--batch_size", "2",
        "--num_batches", "1", "--max_length", "16", "--host_loop",
        "--hvp_precision", "high", "--vector_seed", "11",
    ]
    spectrum.main(common + ["--linearized",
                            "--out_spectrum", str(tmp_path / "lin")])
    spectrum.main(common + ["--out_spectrum", str(tmp_path / "plain")])
    from hessian_llm_vision_tpu.io import load_spectrum

    a = load_spectrum(str(tmp_path / "lin.npz"))
    b = load_spectrum(str(tmp_path / "plain.npz"))
    np.testing.assert_allclose(
        np.sort(np.asarray(a.eigvals)), np.sort(np.asarray(b.eigvals)),
        rtol=1e-4, atol=1e-5,
    )

    # loud-flags: --linearized without --host_loop / with fused modes
    import pytest

    with pytest.raises(SystemExit, match="linearized"):
        spectrum.main(["--model", "gpt2-tiny", "--linearized"])
    with pytest.raises(SystemExit, match="linearized"):
        spectrum.main(common + ["--linearized", "--fused_iter"])


def test_guard_escalation_rebuilds_linearized_programs():
    """A precision-guard escalation must swap the tangent/residual
    programs too when the trainer runs linearized refreshes — the
    refresh after an escalation differentiates the NEW tier's loss."""
    from hessian_llm_vision_tpu.optim import GuardTier, LanczosSGDConfig
    from hessian_llm_vision_tpu.optim.lanczos_sgd_host import (
        HostLanczosSGDTrainer,
    )

    loss_a, params, batch = _mlp_workload()

    def loss_b(p, b):
        return 2.0 * loss_a(p, b)  # distinguishable curvature scale

    cfg = LanczosSGDConfig(
        k=3, delta=1e-3, lr=0.0, momentum=0.0, refresh_every=1,
        normalization="mean",
    )
    tr = HostLanczosSGDTrainer(loss_a, params, cfg, refresh_linearized=True)
    assert tr._tangent is not None
    state = tr.init(params)
    state, m1 = tr.step(state, batch)
    lam_a = float(state.eigvals[-1])

    tr.set_refresh_tier(GuardTier("tier-b", loss_b, "highest"))
    assert tr.refresh_loss_fn is loss_b and tr.refresh_precision == "highest"
    state, m2 = tr.step(state, batch)
    # linearized refresh now runs the NEW loss: eigvals double
    np.testing.assert_allclose(float(state.eigvals[-1]), 2.0 * lam_a,
                               rtol=1e-4)
