"""Optimizer layer tests."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from hessian_llm_vision_tpu.optim import (
    sgd_momentum,
    manual_adam,
    raw_sgd,
    linear_decay,
    LanczosSGDConfig,
    make_lanczos_sgd_step,
    make_layerwise_lanczos_sgd_step,
    project_gradients,
    frozen_spectral_adjust,
    make_gauss_newton_step,
    make_natural_gradient_step,
)
from hessian_llm_vision_tpu.utils.flatten import Flattener


def test_manual_adam_matches_optax(key):
    params = {"a": jax.random.normal(key, (5,)), "b": jnp.zeros((3,))}
    ours = manual_adam(1e-2)
    ref = optax.adam(1e-2)
    s1, s2 = ours.init(params), ref.init(params)
    p1 = p2 = params
    for i in range(5):
        g = jax.tree_util.tree_map(
            lambda x: jax.random.normal(jax.random.fold_in(key, i), x.shape), params
        )
        u1, s1 = ours.update(g, s1)
        u2, s2 = ref.update(g, s2)
        p1 = optax.apply_updates(p1, u1)
        p2 = optax.apply_updates(p2, u2)
    for a, b in zip(jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_sgd_momentum_torch_semantics(key):
    """buf = mu*buf + (g + wd*p); p -= lr*buf — numpy simulation."""
    p = np.array([1.0, -2.0], np.float32)
    tx = sgd_momentum(0.1, momentum=0.9, weight_decay=0.01)
    state = tx.init(jnp.asarray(p))
    pj = jnp.asarray(p)
    buf = np.zeros_like(p)
    for i in range(4):
        g = np.array([0.5, 0.25], np.float32) * (i + 1)
        buf = 0.9 * buf + (g + 0.01 * p)
        p = p - 0.1 * buf
        u, state = tx.update(jnp.asarray(g), state, pj)
        pj = optax.apply_updates(pj, u)
        np.testing.assert_allclose(np.asarray(pj), p, atol=1e-6)


def test_linear_decay_schedule():
    sched = linear_decay(1.0, 10)
    assert float(sched(jnp.asarray(0))) == 1.0
    np.testing.assert_allclose(float(sched(jnp.asarray(5))), 0.5)
    assert float(sched(jnp.asarray(20))) == 0.0


def _quadratic_problem(key, d=12):
    """Loss 0.5 (w-w*)ᵀ A (w-w*) with known SPD A."""
    ka, kw = jax.random.split(key)
    U = jnp.linalg.qr(jax.random.normal(ka, (d, d)))[0]
    lam = jnp.linspace(0.5, 20.0, d)
    A = U @ jnp.diag(lam) @ U.T
    w_star = jax.random.normal(kw, (d,))

    def loss(params, batch):
        r = params["w"] - w_star
        return 0.5 * r @ A @ r

    return loss, {"w": jnp.zeros((d,))}, A, w_star


def test_lanczos_sgd_full_rank_is_damped_newton(key):
    """With k=dim on a quadratic, the adjusted gradient equals
    g + H⁻¹g − (H+δI)⁻¹g; one step with lr=1, no momentum moves by that."""
    loss, params, A, w_star = _quadratic_problem(key)
    d = A.shape[0]
    cfg = LanczosSGDConfig(
        k=d, delta=0.1, lr=1.0, momentum=0.0, normalization="mean"
    )
    init_fn, step_fn = make_lanczos_sgd_step(loss, params, cfg)
    state = init_fn(params)
    state, metrics = jax.jit(step_fn)(state, None)
    g = np.asarray(A @ (np.zeros(d) - np.asarray(w_star)))
    H = np.asarray(A)
    expected_step = g + np.linalg.solve(H, g) - np.linalg.solve(H + 0.1 * np.eye(d), g)
    np.testing.assert_allclose(
        np.asarray(state.params["w"]), -expected_step, rtol=1e-3, atol=1e-4
    )
    np.testing.assert_allclose(
        float(metrics["eig_max"]), float(np.linalg.eigvalsh(H)[-1]), rtol=1e-4
    )


def test_lanczos_sgd_trains_spiral_mlp(key):
    from hessian_llm_vision_tpu.models import SpiralMLP, losses
    from hessian_llm_vision_tpu.data import make_spirals

    x, y = make_spirals(150, seed=3)
    model = SpiralMLP(width=16, depth=2)
    params = model.init(key, x[:4])["params"]

    def loss_fn(p, b):
        return losses.softmax_cross_entropy(model.apply({"params": p}, b[0]), b[1])

    # reference regime: "sum" HVP normalization (loss *= batch) gives large
    # Ritz values; small-eigval regimes make 1/λ blow up (inherent to the
    # reference update rule — it was only ever run on GPT-2-scale spectra)
    cfg = LanczosSGDConfig(k=8, delta=1e-3, lr=0.03, momentum=0.9, normalization="sum")
    init_fn, step_fn = make_lanczos_sgd_step(loss_fn, params, cfg, batch_size=150)
    state = init_fn(params)
    step = jax.jit(step_fn)
    losses_seen = []
    for _ in range(100):
        state, m = step(state, (jnp.asarray(x), jnp.asarray(y)))
        losses_seen.append(float(m["loss"]))
    assert np.isfinite(losses_seen).all()
    assert losses_seen[-1] < losses_seen[0]


def test_lanczos_sgd_refresh_and_ema(key):
    """refresh_every=3: spectrum constant between refreshes."""
    loss, params, A, _ = _quadratic_problem(key, d=8)
    cfg = LanczosSGDConfig(
        k=4, delta=0.1, lr=0.05, momentum=0.0, refresh_every=3,
        lanczos_momentum=0.5, normalization="mean",
    )
    init_fn, step_fn = make_lanczos_sgd_step(loss, params, cfg)
    state = init_fn(params)
    step = jax.jit(step_fn)
    states = []
    for i in range(4):
        state, m = step(state, None)
        states.append(np.asarray(state.eigvals))
    # steps 1,2 reuse step-0 spectrum; step 3 refreshes
    np.testing.assert_array_equal(states[0], states[1])
    np.testing.assert_array_equal(states[1], states[2])
    assert not np.array_equal(states[2], states[3])


def test_lanczos_sgd_accum_equals_single(key):
    """accum over identical micro-batches == one batch (same grads + HVP)."""
    from hessian_llm_vision_tpu.models import SpiralMLP, losses

    x = jax.random.normal(key, (8, 2))
    y = jax.random.randint(jax.random.fold_in(key, 1), (8,), 0, 3)
    model = SpiralMLP(width=8, depth=1)
    params = model.init(key, x)["params"]

    def loss_fn(p, b):
        return losses.softmax_cross_entropy(model.apply({"params": p}, b[0]), b[1])

    cfg1 = LanczosSGDConfig(k=4, delta=1e-3, lr=0.1, momentum=0.0, normalization="mean")
    cfg2 = LanczosSGDConfig(
        k=4, delta=1e-3, lr=0.1, momentum=0.0, accum_steps=4, normalization="mean"
    )
    i1, s1 = make_lanczos_sgd_step(loss_fn, params, cfg1)
    i2, s2 = make_lanczos_sgd_step(loss_fn, params, cfg2)
    st1, m1 = jax.jit(s1)(i1(params), (x, y))
    micro = (jnp.broadcast_to(x, (4, *x.shape)), jnp.broadcast_to(y, (4, *y.shape)))
    st2, m2 = jax.jit(s2)(i2(params), micro)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)
    for a, b in zip(
        jax.tree_util.tree_leaves(st1.params), jax.tree_util.tree_leaves(st2.params)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_layerwise_lanczos_sgd(key):
    from hessian_llm_vision_tpu.models import SpiralMLP, losses
    from hessian_llm_vision_tpu.data import make_spirals

    x, y = make_spirals(90, seed=5)
    model = SpiralMLP(width=8, depth=1)
    params = model.init(key, x[:4])["params"]

    def loss_fn(p, b):
        return losses.softmax_cross_entropy(model.apply({"params": p}, b[0]), b[1])

    cfg = LanczosSGDConfig(
        k=4, delta=1e-3, lr=0.02, momentum=0.9, normalization="sum"
    )
    init_fn, step_fn = make_layerwise_lanczos_sgd_step(
        loss_fn, params, cfg, batch_size=90
    )
    state = init_fn(params)
    step = jax.jit(step_fn)
    first = last = None
    losses_seen = []
    for _ in range(40):
        state, m = step(state, (jnp.asarray(x), jnp.asarray(y)))
        losses_seen.append(float(m["loss"]))
    assert np.isfinite(losses_seen).all()
    assert losses_seen[-1] < losses_seen[0]
    assert m["layer_eig_max"].shape[0] > 0


def test_projection_transform_blocks_directions(key):
    d = 20
    fl = Flattener(jnp.zeros((d,)))
    V = np.linalg.qr(np.random.RandomState(0).randn(d, 3))[0].T.astype(np.float32)
    tx = optax.chain(
        project_gradients(jnp.asarray(V), fl, use_pallas=False),
        raw_sgd(0.1),
    )
    params = jnp.zeros((d,))
    state = tx.init(params)
    g = jax.random.normal(key, (d,))
    u, state = tx.update(g, state, params)
    newp = optax.apply_updates(params, u)
    np.testing.assert_allclose(np.asarray(V @ newp), np.zeros(3), atol=1e-6)


def test_frozen_spectral_adjust_transform(key):
    d = 10
    fl = Flattener(jnp.zeros((d,)))
    V = jnp.eye(d)[:3]
    eigvals = jnp.asarray([1.0, 2.0, 4.0])
    tx = frozen_spectral_adjust(V, eigvals, 0.5, fl, use_pallas=False)
    g = jnp.ones((d,))
    u, _ = tx.update(g, tx.init(None))
    coef = 1 / np.asarray(eigvals) - 1 / (np.asarray(eigvals) + 0.5)
    expected = np.ones(d)
    expected[:3] += coef
    np.testing.assert_allclose(np.asarray(u), expected, rtol=1e-5)


def test_gauss_newton_one_shot_on_linear_least_squares(key):
    """GN with exact CG solves linear least squares in one step."""
    kA, kb, kw = jax.random.split(key, 3)
    X = jax.random.normal(kA, (30, 5))
    w_true = jax.random.normal(kw, (5,))
    yv = X @ w_true

    def model_fn(p, b):
        return b[0] @ p["w"]

    def out_loss(pred, b):
        return 0.5 * jnp.mean((pred - b[1]) ** 2)

    def loss_fn(p, b):
        return out_loss(model_fn(p, b), b)

    params = {"w": jnp.zeros((5,))}
    step = make_gauss_newton_step(
        model_fn, out_loss, loss_fn, params, damping=1e-6, cg_tol=1e-8, cg_iters=100
    )
    new, metrics = step(params, (X, yv))
    np.testing.assert_allclose(np.asarray(new["w"]), np.asarray(w_true), atol=1e-3)


def test_natural_gradient_step_decreases_loss(key):
    from hessian_llm_vision_tpu.models import SpiralMLP, losses
    from hessian_llm_vision_tpu.data import make_spirals

    x, y = make_spirals(90, seed=7)
    model = SpiralMLP(width=8, depth=1)
    params = model.init(key, x[:4])["params"]

    def model_fn(p, b):
        return model.apply({"params": p}, b[0])

    def nll(logits, b):
        return losses.softmax_cross_entropy(logits, b[1])

    def loss_fn(p, b):
        return nll(model_fn(p, b), b)

    step = make_natural_gradient_step(model_fn, nll, loss_fn, params, lr=0.5)
    l0 = float(loss_fn(params, (x, y)))
    p = params
    for _ in range(5):
        p, m = step(p, (jnp.asarray(x), jnp.asarray(y)))
    assert float(loss_fn(p, (x, y))) < l0
