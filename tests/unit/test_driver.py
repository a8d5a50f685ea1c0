"""Host-driven dataset spectrum driver == fused DatasetHessianOperator path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hessian_llm_vision_tpu.curvature import DatasetHessianOperator
from hessian_llm_vision_tpu.krylov import lanczos, ritz_decomposition
from hessian_llm_vision_tpu.krylov.driver import dataset_spectrum_host
from hessian_llm_vision_tpu.models import SpiralMLP, losses
from hessian_llm_vision_tpu.data import make_spirals
from hessian_llm_vision_tpu.utils.flatten import Flattener


def test_driver_matches_fused_dataset_lanczos(key):
    x, y = make_spirals(120, seed=13)
    model = SpiralMLP(width=12, depth=2)
    params = model.init(key, x[:4])["params"]

    def loss_fn(p, b):
        return losses.softmax_cross_entropy(model.apply({"params": p}, b[0]), b[1])

    xs = jnp.asarray(x).reshape(4, 30, 2)
    ys = jnp.asarray(y).reshape(4, 30)
    batch_list = [(xs[i], ys[i]) for i in range(4)]
    fl = Flattener(params)
    v0 = jax.random.normal(jax.random.fold_in(key, 1), (fl.size,))

    res_host = dataset_spectrum_host(
        loss_fn, params, batch_list, 15, v0=v0, flattener=fl
    )
    op = DatasetHessianOperator(
        loss_fn, params, (xs, ys), remat=False, flattener=fl
    )
    res_fused = lanczos(
        op.matvec, op.dim, 15, v0=v0, reorth=False, store_basis=False
    )
    # without reorthogonalization, tiny f32 rounding differences between the
    # two implementations amplify exponentially in LATE iterations (the
    # Discrepancy.ipynb effect); the early recurrence and the converged
    # extremal Ritz values are the stable comparables
    np.testing.assert_allclose(
        np.asarray(res_host.alphas[:6]), np.asarray(res_fused.alphas[:6]),
        rtol=1e-4, atol=1e-5,
    )
    spec_h = ritz_decomposition(res_host)
    spec_f = ritz_decomposition(res_fused)
    np.testing.assert_allclose(
        float(spec_h.eigvals[-1]), float(spec_f.eigvals[-1]), rtol=1e-3
    )
    np.testing.assert_allclose(
        float(spec_h.eigvals[0]), float(spec_f.eigvals[0]), rtol=1e-2, atol=1e-4
    )


def test_driver_callback_and_sum_normalization(key):
    x, y = make_spirals(60, seed=14)
    model = SpiralMLP(width=8, depth=1)
    params = model.init(key, x[:4])["params"]

    def loss_fn(p, b):
        return losses.softmax_cross_entropy(model.apply({"params": p}, b[0]), b[1])

    batch_list = [(jnp.asarray(x[:30]), jnp.asarray(y[:30])),
                  (jnp.asarray(x[30:60]), jnp.asarray(y[30:60]))]
    seen = []
    res_sum = dataset_spectrum_host(
        loss_fn, params, batch_list, 6, key=jax.random.PRNGKey(2),
        normalization="sum", batch_size=30,
        callback=lambda i, a, b: seen.append(i),
    )
    res_mean = dataset_spectrum_host(
        loss_fn, params, batch_list, 6, key=jax.random.PRNGKey(2),
    )
    assert seen == list(range(6))
    # "sum" = Hessian of the dataset-SUMMED loss = N x mean (N = 60)
    np.testing.assert_allclose(
        np.asarray(res_sum.alphas), 60 * np.asarray(res_mean.alphas), rtol=1e-4
    )


def test_driver_and_operator_normalizations_agree(key):
    """The two spectrum paths (fused operator / host driver) must give the
    SAME operator for every normalization convention."""
    from hessian_llm_vision_tpu.curvature import DatasetHessianOperator

    x, y = make_spirals(60, seed=15)
    model = SpiralMLP(width=8, depth=1)
    params = model.init(key, x[:4])["params"]

    def loss_fn(p, b):
        return losses.softmax_cross_entropy(model.apply({"params": p}, b[0]), b[1])

    xs = jnp.asarray(x).reshape(3, 20, 2)
    ys = jnp.asarray(y).reshape(3, 20)
    batch_list = [(xs[i], ys[i]) for i in range(3)]
    fl = Flattener(params)
    v0 = jax.random.normal(jax.random.fold_in(key, 1), (fl.size,))

    for norm in ("dataset", "mean", "sum"):
        op = DatasetHessianOperator(
            loss_fn, params, (xs, ys), normalization=norm, remat=False,
            flattener=fl,
        )
        res_f = lanczos(op.matvec, op.dim, 4, v0=v0, reorth=False,
                        store_basis=False)
        res_h = dataset_spectrum_host(
            loss_fn, params, batch_list, 4, v0=v0, normalization=norm,
            batch_size=20, flattener=fl,
        )
        np.testing.assert_allclose(
            np.asarray(res_f.alphas), np.asarray(res_h.alphas),
            rtol=1e-4, atol=1e-6, err_msg=f"normalization={norm}",
        )


def test_driver_ggn_matches_fused_operator(key):
    """Host-driven operator='ggn' == the fused GGNOperator matvec, and its
    full-rank Ritz values == dense GGN eigenvalues (colaexp.py:100-110 at
    the host-loop scale path)."""
    from hessian_llm_vision_tpu.curvature import GGNOperator
    from hessian_llm_vision_tpu.krylov.driver import _jitted_batch_ggn

    x, y = make_spirals(60, seed=21)
    model = SpiralMLP(width=6, depth=1)
    params = model.init(key, x[:4])["params"]
    batch = (jnp.asarray(x), jnp.asarray(y))

    def model_fn(p, b):
        return model.apply({"params": p}, b[0])

    def out_loss_fn(logits, b):
        return losses.softmax_cross_entropy(logits, b[1])

    def loss_fn(p, b):
        return out_loss_fn(model_fn(p, b), b)

    fl = Flattener(params)
    v = jax.random.normal(jax.random.fold_in(key, 2), (fl.size,))

    # matvec parity: host-loop jitted program vs fused operator
    mv_host = _jitted_batch_ggn(model_fn, out_loss_fn, "high", fl)
    op = GGNOperator(model_fn, out_loss_fn, params, batch, flattener=fl)
    np.testing.assert_allclose(
        np.asarray(mv_host(v, params, batch)), np.asarray(op.matvec(v)),
        rtol=1e-5, atol=1e-6,
    )

    # full-rank host spectrum vs dense GGN eigenvalues
    res = dataset_spectrum_host(
        loss_fn, params, [batch], fl.size, v0=v, flattener=fl,
        operator="ggn", model_fn=model_fn, out_loss_fn=out_loss_fn,
    )
    spec = ritz_decomposition(res)
    dense = np.stack([np.asarray(op.matvec(e)) for e in np.eye(fl.size, dtype=np.float32)])
    ev_dense = np.linalg.eigvalsh((dense + dense.T) / 2)
    np.testing.assert_allclose(
        float(spec.eigvals[-1]), float(ev_dense[-1]), rtol=1e-3
    )
    # GGN is PSD: no significantly negative Ritz values
    assert float(spec.eigvals[0]) > -1e-4 * float(ev_dense[-1])


def test_driver_ggn_requires_model_fn(key):
    x, y = make_spirals(30, seed=5)
    model = SpiralMLP(width=4, depth=1)
    params = model.init(key, x[:4])["params"]

    def loss_fn(p, b):
        return losses.softmax_cross_entropy(model.apply({"params": p}, b[0]), b[1])

    import pytest

    with pytest.raises(ValueError, match="model_fn"):
        dataset_spectrum_host(
            loss_fn, params, [(jnp.asarray(x), jnp.asarray(y))], 5,
            key=key, operator="ggn",
        )


def test_fused_step_matches_dataset_host(key):
    """single_batch_spectrum_host_fused (the >1B donating-step memory
    plan) reproduces dataset_spectrum_host on the same single batch."""
    from hessian_llm_vision_tpu.krylov.driver import (
        single_batch_spectrum_host_fused,
    )

    x, y = make_spirals(96, seed=2)
    model = SpiralMLP(width=10, depth=2)
    params = model.init(jax.random.PRNGKey(0), x[:4])["params"]

    def loss_fn(p, b):
        return losses.softmax_cross_entropy(model.apply({"params": p}, b[0]), b[1])

    batch = (jnp.asarray(x), jnp.asarray(y))
    fl = Flattener(params)
    v0 = jax.random.normal(key, (fl.size,), jnp.float32)

    ref = dataset_spectrum_host(loss_fn, params, [batch], 8, v0=v0, flattener=fl)
    fused = single_batch_spectrum_host_fused(
        loss_fn, params, batch, 8, v0=v0, flattener=fl
    )
    np.testing.assert_allclose(
        np.asarray(fused.alphas), np.asarray(ref.alphas), atol=1e-5, rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(fused.betas), np.asarray(ref.betas), atol=1e-5, rtol=1e-4
    )


def test_fused_step_bf16_qprev(key):
    """bf16 q_prev storage (halves one P-buffer at 1.4B) perturbs extreme
    Ritz values by <~1e-3 relative — same order as no-reorth drift."""
    from hessian_llm_vision_tpu.krylov.driver import (
        single_batch_spectrum_host_fused,
    )

    x, y = make_spirals(96, seed=2)
    model = SpiralMLP(width=10, depth=2)
    params = model.init(jax.random.PRNGKey(0), x[:4])["params"]

    def loss_fn(p, b):
        return losses.softmax_cross_entropy(model.apply({"params": p}, b[0]), b[1])

    batch = (jnp.asarray(x), jnp.asarray(y))
    fl = Flattener(params)
    v0 = jax.random.normal(key, (fl.size,), jnp.float32)

    f32 = single_batch_spectrum_host_fused(
        loss_fn, params, batch, 10, v0=v0, flattener=fl
    )
    b16 = single_batch_spectrum_host_fused(
        loss_fn, params, batch, 10, v0=v0, flattener=fl, qprev_bf16=True
    )
    ev32 = np.sort(np.asarray(ritz_decomposition(f32).eigvals))
    ev16 = np.sort(np.asarray(ritz_decomposition(b16).eigvals))
    scale = max(abs(ev32[0]), abs(ev32[-1]))
    assert abs(ev16[-1] - ev32[-1]) / scale < 2e-3
    assert abs(ev16[0] - ev32[0]) / scale < 2e-3


def test_fused_dataset_iteration_matches_unfused(key):
    """fused=True (one scan-over-batches program per iteration) must be
    numerically equivalent to the 9-dispatch unfused loop."""
    x, y = make_spirals(120, seed=17)
    model = SpiralMLP(width=10, depth=2)
    params = model.init(key, x[:4])["params"]

    def loss_fn(p, b):
        return losses.softmax_cross_entropy(model.apply({"params": p}, b[0]), b[1])

    xs = jnp.asarray(x).reshape(4, 30, 2)
    ys = jnp.asarray(y).reshape(4, 30)
    batch_list = [(xs[i], ys[i]) for i in range(4)]
    fl = Flattener(params)
    v0 = jax.random.normal(jax.random.fold_in(key, 3), (fl.size,))

    res_u = dataset_spectrum_host(
        loss_fn, params, batch_list, 12, v0=v0, flattener=fl
    )
    res_f = dataset_spectrum_host(
        loss_fn, params, batch_list, 12, v0=v0, flattener=fl, fused=True
    )
    np.testing.assert_allclose(
        np.asarray(res_u.alphas[:6]), np.asarray(res_f.alphas[:6]),
        rtol=1e-4, atol=1e-5,
    )
    su, sf = ritz_decomposition(res_u), ritz_decomposition(res_f)
    np.testing.assert_allclose(
        float(su.eigvals[-1]), float(sf.eigvals[-1]), rtol=1e-4
    )
    # sum normalization rides through the in-program scale
    res_us = dataset_spectrum_host(
        loss_fn, params, batch_list, 8, v0=v0, flattener=fl,
        normalization="sum", batch_size=30,
    )
    res_fs = dataset_spectrum_host(
        loss_fn, params, batch_list, 8, v0=v0, flattener=fl,
        normalization="sum", batch_size=30, fused=True,
    )
    np.testing.assert_allclose(
        np.asarray(res_us.alphas[:4]), np.asarray(res_fs.alphas[:4]),
        rtol=1e-4, atol=1e-4,
    )


def test_fused_dataset_ggn_matches_unfused(key):
    """fused=True with operator='ggn' == the unfused GGN host loop."""
    x, y = make_spirals(120, seed=18)
    model = SpiralMLP(width=8, depth=1)
    params = model.init(key, x[:4])["params"]

    def loss_fn(p, b):
        return losses.softmax_cross_entropy(model.apply({"params": p}, b[0]), b[1])

    def model_fn(p, b):
        return model.apply({"params": p}, b[0])

    def out_loss_fn(o, b):
        return losses.softmax_cross_entropy(o, b[1])

    xs = jnp.asarray(x).reshape(4, 30, 2)
    ys = jnp.asarray(y).reshape(4, 30)
    batch_list = [(xs[i], ys[i]) for i in range(4)]
    fl = Flattener(params)
    v0 = jax.random.normal(jax.random.fold_in(key, 5), (fl.size,))

    kw = dict(v0=v0, flattener=fl, operator="ggn",
              model_fn=model_fn, out_loss_fn=out_loss_fn)
    res_u = dataset_spectrum_host(loss_fn, params, batch_list, 10, **kw)
    res_f = dataset_spectrum_host(
        loss_fn, params, batch_list, 10, fused=True, **kw
    )
    np.testing.assert_allclose(
        np.asarray(res_u.alphas[:5]), np.asarray(res_f.alphas[:5]),
        rtol=1e-4, atol=1e-6,
    )
    su, sf = ritz_decomposition(res_u), ritz_decomposition(res_f)
    np.testing.assert_allclose(
        float(su.eigvals[-1]), float(sf.eigvals[-1]), rtol=1e-4
    )
    # GGN is PSD: fused path must preserve that
    assert float(sf.eigvals[0]) > -1e-5


@pytest.mark.slow
def test_matvec_precision_probe(key):
    """Mechanism test (CPU matmuls are f32 at every named precision, so the
    real bf16 error is exercised on-chip — artifacts/trained124m_r3): equal
    arms agree to f32 round-off; a perturbed referee yields the analytic
    relative error; the Rayleigh-quotient alpha matches a direct HVP."""
    from hessian_llm_vision_tpu.krylov.driver import matvec_precision_probe

    x, y = make_spirals(60, seed=3)
    model = SpiralMLP(width=10, depth=2)
    params = model.init(key, x[:4])["params"]

    def loss_fn(p, b):
        return losses.softmax_cross_entropy(model.apply({"params": p}, b[0]), b[1])

    batch = (jnp.asarray(x), jnp.asarray(y))
    fl = Flattener(params)

    stats = matvec_precision_probe(
        loss_fn, params, batch, key=key, precision="high", flattener=fl
    )
    assert stats["rel_err"] < 1e-5
    assert stats["alpha_rel_err"] < 1e-5
    assert stats["seconds_requested"] > 0 and stats["seconds_referee"] > 0

    # alpha == v^T H v of the unit probe vector, cross-checked directly
    from hessian_llm_vision_tpu.curvature.hvp import hvp

    v = jax.random.normal(key, (fl.size,), jnp.float32)
    v = v / jnp.linalg.norm(v)
    w = fl.flatten(hvp(loss_fn, params, batch, fl.unflatten(v),
                       precision="highest"))
    np.testing.assert_allclose(
        stats["alpha_referee"], float(jnp.vdot(v, w)), rtol=1e-5
    )

    # a referee scaled by (1+eps) must report rel_err == eps exactly
    eps = 0.125

    def scaled_loss_fn(p, b):
        return (1.0 + eps) * loss_fn(p, b)

    stats2 = matvec_precision_probe(
        loss_fn, params, batch, key=key, precision="high",
        referee_loss_fn=scaled_loss_fn, flattener=fl,
    )
    np.testing.assert_allclose(stats2["rel_err"], eps / (1 + eps), rtol=1e-4)
    np.testing.assert_allclose(
        stats2["alpha_rel_err"], eps / (1 + eps), rtol=1e-4
    )

    # ritz_iters: short-Lanczos extremes agree across equal arms and with
    # a dense eigh of the true Hessian at full rank
    stats3 = matvec_precision_probe(
        loss_fn, params, batch, key=key, precision="high", flattener=fl,
        ritz_iters=fl.size,
    )
    assert stats3["ritz_rel_err"] < 1e-4
    dense = np.linalg.eigvalsh(
        np.asarray(fl.flatten_2d(jax.hessian(loss_fn)(params, batch)))
        if hasattr(fl, "flatten_2d")
        else np.stack(
            [
                np.asarray(
                    fl.flatten(hvp(loss_fn, params, batch,
                                   fl.unflatten(jnp.eye(fl.size)[i]),
                                   precision="highest"))
                )
                for i in range(fl.size)
            ],
            axis=1,
        )
    )
    lo, hi = stats3["ritz_extremes_referee"]
    np.testing.assert_allclose(hi, dense[-1], rtol=1e-3)
    np.testing.assert_allclose(lo, dense[0], atol=1e-3 * abs(dense[-1]))

    # vector/key contract matches the host-loop convention
    import pytest

    with pytest.raises(ValueError):
        matvec_precision_probe(loss_fn, params, batch, flattener=fl)
