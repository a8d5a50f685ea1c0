"""Probe-parallel SLQ over the simulated 8-device mesh.

The probes are independent Lanczos runs — the mesh path must reproduce the
sequential ``--probes`` loop probe-for-probe (same fold_in(key, i) start
vectors, same fused iteration body), while holding the probe axis sharded
over the data axis so each device advances only its own probes.
Reference role: the d.sh data_seed x vector_seed process grid
(/root/reference/d.sh), one spectrum process per point.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hessian_llm_vision_tpu.krylov import dataset_spectrum_host, ritz_decomposition
from hessian_llm_vision_tpu.models import SpiralMLP, losses
from hessian_llm_vision_tpu.parallel import make_mesh, probe_parallel_spectrum_host
from hessian_llm_vision_tpu.data import make_spirals


def _spiral_setup(key):
    model = SpiralMLP(width=16, depth=2)
    x, y = make_spirals(96, noise=0.15, seed=7)
    x, y = jnp.asarray(x), jnp.asarray(y)
    params = model.init(key, x[:4])["params"]

    def model_fn(p, b, _m=model):
        return _m.apply({"params": p}, b[0])

    def out_loss(logits, b):
        return losses.softmax_cross_entropy(logits, b[1])

    def loss_fn(p, b):
        return out_loss(model_fn(p, b), b)

    batches = [
        (x[i * 32:(i + 1) * 32], y[i * 32:(i + 1) * 32]) for i in range(3)
    ]
    return model_fn, out_loss, params, loss_fn, batches


def test_probe_parallel_matches_sequential_probes():
    key = jax.random.PRNGKey(0)
    _, _, params, loss_fn, batches = _spiral_setup(key)
    mesh = make_mesh(8)

    n_probes, iters = 8, 7
    par = probe_parallel_spectrum_host(
        loss_fn, params, batches, iters,
        key=jax.random.PRNGKey(3), n_probes=n_probes, mesh=mesh,
        precision="highest",
    )
    assert len(par) == n_probes
    for pi in range(n_probes):
        seq = dataset_spectrum_host(
            loss_fn, params, batches, iters,
            key=jax.random.fold_in(jax.random.PRNGKey(3), pi),
            fused=True, precision="highest",
        )
        np.testing.assert_allclose(
            np.asarray(par[pi].alphas), np.asarray(seq.alphas),
            rtol=2e-5, atol=1e-6,
        )
        np.testing.assert_allclose(
            np.asarray(par[pi].betas), np.asarray(seq.betas),
            rtol=2e-5, atol=1e-6,
        )
        # Ritz values feed the SLQ average downstream — pin them too
        np.testing.assert_allclose(
            np.sort(np.asarray(ritz_decomposition(par[pi]).eigvals)),
            np.sort(np.asarray(ritz_decomposition(seq).eigvals)),
            rtol=1e-4, atol=1e-6,
        )


def test_probe_parallel_ggn_operator():
    key = jax.random.PRNGKey(1)
    model_fn, out_loss, params, loss_fn, batches = _spiral_setup(key)
    mesh = make_mesh(4)

    par = probe_parallel_spectrum_host(
        loss_fn, params, batches, 6,
        key=key, n_probes=4, mesh=mesh, operator="ggn",
        model_fn=model_fn, out_loss_fn=out_loss, precision="highest",
    )
    seq = dataset_spectrum_host(
        loss_fn, params, batches, 6,
        key=jax.random.fold_in(key, 0), fused=True, operator="ggn",
        model_fn=model_fn, out_loss_fn=out_loss, precision="highest",
    )
    np.testing.assert_allclose(
        np.asarray(par[0].alphas), np.asarray(seq.alphas),
        rtol=2e-5, atol=1e-6,
    )
    # GGN is PSD: every probe's Ritz values are nonnegative
    for r in par:
        assert float(jnp.min(ritz_decomposition(r).eigvals)) > -1e-5


def test_probe_parallel_state_is_sharded():
    """The Lanczos state must actually live sharded over the mesh: 8 probes
    on 8 devices -> each device holds exactly one (P,) row."""
    key = jax.random.PRNGKey(2)
    _, _, params, loss_fn, batches = _spiral_setup(key)
    mesh = make_mesh(8)

    # reach into the init path: same construction the driver loop uses
    from jax.sharding import NamedSharding, PartitionSpec as P

    keys = jnp.stack([jax.random.fold_in(key, i) for i in range(8)])
    keys = jax.device_put(keys, NamedSharding(mesh, P("data")))

    from hessian_llm_vision_tpu.utils.flatten import Flattener

    fl = Flattener(params)

    @jax.jit
    def init(ks):
        def one(k):
            v = jax.random.normal(k, (fl.size,), jnp.float32)
            return v / jnp.linalg.norm(v)

        return jax.vmap(one)(ks)

    q = init(keys)
    shards = q.addressable_shards
    assert len(shards) == 8
    assert all(s.data.shape == (1, fl.size) for s in shards)


def test_probe_parallel_per_probe_data():
    """The full d.sh grid: every probe gets its OWN batch list (data_seed
    axis) as well as its own start vector (vector_seed axis) — each must
    match a sequential run on that probe's data."""
    key = jax.random.PRNGKey(4)
    _, _, params, loss_fn, batches = _spiral_setup(key)
    mesh = make_mesh(4)

    def reseeded(seed):
        x, y = make_spirals(96, noise=0.15, seed=seed)
        x, y = jnp.asarray(x), jnp.asarray(y)
        return [
            (x[i * 32:(i + 1) * 32], y[i * 32:(i + 1) * 32]) for i in range(3)
        ]

    per_probe = [reseeded(997 + i) for i in range(4)]
    par = probe_parallel_spectrum_host(
        loss_fn, params, batches, 6,
        key=key, n_probes=4, mesh=mesh,
        per_probe_batch_lists=per_probe, precision="highest",
    )
    for pi in range(4):
        seq = dataset_spectrum_host(
            loss_fn, params, per_probe[pi], 6,
            key=jax.random.fold_in(key, pi), fused=True, precision="highest",
        )
        np.testing.assert_allclose(
            np.asarray(par[pi].alphas), np.asarray(seq.alphas),
            rtol=2e-5, atol=1e-6,
        )

    import pytest as _pytest

    with _pytest.raises(ValueError, match="entries for n_probes"):
        probe_parallel_spectrum_host(
            loss_fn, params, batches, 2, key=key, n_probes=4, mesh=mesh,
            per_probe_batch_lists=per_probe[:2],
        )


def test_probe_parallel_cli(capsys):
    """spectrum --host_loop --probes 8 --probe_parallel end-to-end: the
    SLQ-averaged spectrum must match the sequential --probes run exactly
    (same fold_in probe seeds, same fused iteration)."""
    from hessian_llm_vision_tpu.cli import spectrum

    argv = [
        "--model", "spiral", "--num_points", "96", "--batch_size", "32",
        "--lanczos_iters", "6", "--probes", "8", "--host_loop", "--cpu",
    ]
    spec_par = spectrum.main(argv + ["--probe_parallel"])
    spec_seq = spectrum.main(argv + ["--fused_iter"])
    np.testing.assert_allclose(
        np.sort(np.asarray(spec_par.eigvals)),
        np.sort(np.asarray(spec_seq.eigvals)),
        rtol=1e-4, atol=1e-6,
    )
    assert "probe-parallel" in capsys.readouterr().out


def test_probe_parallel_loud_on_indivisible_probes():
    key = jax.random.PRNGKey(0)
    _, _, params, loss_fn, batches = _spiral_setup(key)
    mesh = make_mesh(8)
    with pytest.raises(ValueError, match="multiple of the mesh"):
        probe_parallel_spectrum_host(
            loss_fn, params, batches, 3, key=key, n_probes=3, mesh=mesh,
        )
