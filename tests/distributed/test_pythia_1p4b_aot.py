"""Pythia-1.4B distributed compile-check (BASELINE.json config 5).

The 1.4B model (5.6 GB f32) cannot be materialized in this test
environment, but AOT lowering with abstract sharded inputs proves the
whole distributed program — TP-sharded parameters over the 'model' axis,
batch over 'data', the grad-and-loss and the grad-seeded HVP — partitions
and compiles end-to-end on an 8-device mesh, including the XLA-inserted
collectives.  This is the same mechanism the driver's dryrun uses, at the
real model scale.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from hessian_llm_vision_tpu.models import PYTHIA_CONFIGS, NeoXLMHead, losses
from hessian_llm_vision_tpu.parallel import make_mesh
from hessian_llm_vision_tpu.parallel.param_sharding import tp_spec_tree


def _abstract_params(model, cfg, mesh):
    """ShapeDtypeStructs with TP shardings — no memory allocated."""
    shapes = jax.eval_shape(
        lambda k: model.init(k, jnp.zeros((1, 8), jnp.int32))["params"],
        jax.random.PRNGKey(0),
    )
    specs = tp_spec_tree(shapes)

    def to_abstract(s, spec):
        # drop axes that don't divide (none should, at 1.4B dims)
        for i, ax in enumerate(spec):
            if ax is None:
                continue
            axes = ax if isinstance(ax, tuple) else (ax,)
            size = int(np.prod([mesh.shape[a] for a in axes]))
            if s.shape[i] % size:
                spec = P()
                break
        return jax.ShapeDtypeStruct(
            s.shape, s.dtype, sharding=NamedSharding(mesh, spec)
        )

    return jax.tree_util.tree_map(to_abstract, shapes, specs)


@pytest.mark.slow
@pytest.mark.parametrize("name", ["pythia-1.4b"])
def test_tp_grad_and_hvp_compile_at_scale(name):
    cfg = PYTHIA_CONFIGS[name]
    model = NeoXLMHead(cfg)
    mesh = make_mesh(num_data=2, num_model=4)
    loss_fn = losses.lm_loss_fn(model)

    abstract_params = _abstract_params(model, cfg, mesh)
    batch_abs = {
        "input_ids": jax.ShapeDtypeStruct(
            (8, 128), jnp.int32, sharding=NamedSharding(mesh, P("data", None))
        )
    }

    # sharded leaves really are sharded at 1.4B scale
    qkv = abstract_params["layer_0"]["attention"]["query_key_value"]["kernel"]
    assert qkv.sharding.spec == P(None, "model")

    def value_and_grad(params, batch):
        return jax.value_and_grad(loss_fn)(params, batch)

    lowered = jax.jit(value_and_grad).lower(abstract_params, batch_abs)
    compiled = lowered.compile()
    # per-device memory must reflect the sharding: < full 5.6 GB of params
    mem = compiled.memory_analysis()
    if mem is not None and hasattr(mem, "argument_size_in_bytes"):
        per_dev_args = mem.argument_size_in_bytes
        assert per_dev_args < 4e9, f"args not sharded: {per_dev_args/1e9:.1f} GB"

    def hvp_step(params, batch, v):
        from hessian_llm_vision_tpu.curvature.hvp import hvp_fn

        return hvp_fn(loss_fn)(params, batch, v)

    lowered_hvp = jax.jit(hvp_step).lower(
        abstract_params, batch_abs, abstract_params
    )
    compiled_hvp = lowered_hvp.compile()
    assert compiled_hvp is not None


@pytest.mark.slow
@pytest.mark.parametrize("name", ["pythia-1.4b"])
def test_combined_tp_fused_spectrum_and_sharded_basis_at_scale(name):
    """The COMBINED 1.4B spectrum configuration (VERDICT r3 item 8):
    TP-sharded parameters x P-sharded flat Krylov vectors through the
    fused donating Lanczos step (the host-loop program the LLM artifacts
    actually dispatch, krylov/driver.py) PLUS the CGS2 reorth step with
    the (k, P) basis buffer sharded over the whole mesh.  AOT-compiled on
    the 8-device mesh with per-device memory accounting asserted."""
    from hessian_llm_vision_tpu.krylov.driver import (
        _jitted_fused_lanczos_step,
        _jitted_reorth_recurrence_step,
    )
    from hessian_llm_vision_tpu.utils.flatten import Flattener

    cfg = PYTHIA_CONFIGS[name]
    model = NeoXLMHead(cfg)
    mesh = make_mesh(num_data=2, num_model=4)
    loss_fn = losses.lm_loss_fn(model)
    abstract_params = _abstract_params(model, cfg, mesh)
    fl = Flattener(abstract_params)  # abstract template: shapes only
    assert fl.size > 1.4e9

    vec_sh = NamedSharding(mesh, P(("data", "model")))
    q_abs = jax.ShapeDtypeStruct((fl.size,), jnp.float32, sharding=vec_sh)
    beta_abs = jax.ShapeDtypeStruct((), jnp.float32)
    batch_abs = {
        "input_ids": jax.ShapeDtypeStruct(
            (8, 128), jnp.int32,
            sharding=NamedSharding(mesh, P("data", None)),
        )
    }

    # 1) fused T-only step: HVP + three-term recurrence, donated buffers
    step = _jitted_fused_lanczos_step(loss_fn, "mean", "high", fl)
    compiled = step.lower(
        q_abs, q_abs, beta_abs, abstract_params, batch_abs
    ).compile()
    mem = compiled.memory_analysis()
    per_dev_args = mem.argument_size_in_bytes
    # TP params 5.66/4 GB + two P-sharded f32 vectors 2*5.66/8 GB + batch
    # ~= 2.9 GB/device; unsharded would be 17 GB
    assert per_dev_args < 3.5e9, f"combined args not sharded: {per_dev_args/1e9:.2f} GB"
    # temp bytes on the forced-host platform aggregate ALL 8 simulated
    # devices into one process; report per-device accounting (committed:
    # artifacts/pythia1p4b_r4/combined_memory.json) and bound the
    # aggregate loosely
    print(
        f"[1.4b combined] args/device {per_dev_args/1e9:.2f} GB, "
        f"temp (8-device aggregate) {mem.temp_size_in_bytes/1e9:.2f} GB"
    )
    assert mem.temp_size_in_bytes < 8 * 16e9

    # 2) reorth step: CGS2 against a (k, P) bf16 basis sharded over the
    # full mesh on the P axis (34 GB at k=6 f32 -> 17 GB bf16 -> 2.1
    # GB/device across 8)
    k = 6
    rstep = _jitted_reorth_recurrence_step(k, jnp.bfloat16)
    Q_abs = jax.ShapeDtypeStruct(
        (k, fl.size), jnp.bfloat16,
        sharding=NamedSharding(mesh, P(None, ("data", "model"))),
    )
    i_abs = jax.ShapeDtypeStruct((), jnp.int32)
    compiled_r = rstep.lower(
        q_abs, Q_abs, i_abs, q_abs, q_abs, beta_abs
    ).compile()
    mem_r = compiled_r.memory_analysis()
    # 3 P-sharded f32 vectors (~2.1 GB) + bf16 basis shard (~2.1 GB);
    # measured 4.24 GB/device — unsharded this step would carry 34 GB
    assert mem_r.argument_size_in_bytes < 4.5e9


@pytest.mark.slow
@pytest.mark.parametrize("name", ["pythia-1.4b"])
def test_tp_fused_thick_restart_at_scale(name):
    """Converged-extremes memory plan at 1.4B (VERDICT r4 #7): the fused
    thick-restart inner step (krylov/driver.py::_jitted_fused_trlan_step
    — the program trained-checkpoint extremes REQUIRE, since T-only runs
    are trajectory-unstable at trained conditioning) AOT-compiled with TP
    params x a P-sharded (m+1, P) bf16 restart buffer.  Per-device
    argument accounting asserted; rows committed to
    artifacts/pythia1p4b_r5/extended_memory.json."""
    from hessian_llm_vision_tpu.krylov.driver import _jitted_fused_trlan_step
    from hessian_llm_vision_tpu.utils.flatten import Flattener

    cfg = PYTHIA_CONFIGS[name]
    model = NeoXLMHead(cfg)
    mesh = make_mesh(num_data=2, num_model=4)
    loss_fn = losses.lm_loss_fn(model)
    abstract_params = _abstract_params(model, cfg, mesh)
    fl = Flattener(abstract_params)
    assert fl.size > 1.4e9

    m = 6  # inner basis size: k=4 converged pairs + restarts
    Q_abs = jax.ShapeDtypeStruct(
        (m + 1, fl.size), jnp.bfloat16,
        sharding=NamedSharding(mesh, P(None, ("data", "model"))),
    )
    j_abs = jax.ShapeDtypeStruct((), jnp.int32)
    key_abs = jax.ShapeDtypeStruct((2,), jnp.uint32)
    scale_abs = jax.ShapeDtypeStruct((), jnp.float32)
    batches_abs = {
        "input_ids": jax.ShapeDtypeStruct(
            (2, 8, 128), jnp.int32,
            sharding=NamedSharding(mesh, P(None, "data", None)),
        )
    }
    step = _jitted_fused_trlan_step(loss_fn, "mean", "high", fl)
    compiled = step.lower(
        Q_abs, j_abs, key_abs, scale_abs, abstract_params, batches_abs
    ).compile()
    mem = compiled.memory_analysis()
    per_dev_args = mem.argument_size_in_bytes
    # (7, 1.414e9) bf16 = 19.8 GB -> 2.47 GB/device over 8; TP params
    # 5.66/4 = 1.41 GB; batch negligible => ~3.9 GB/device (unsharded
    # this step would carry ~25 GB of arguments alone)
    print(
        f"[1.4b trlan] args/device {per_dev_args/1e9:.2f} GB, "
        f"temp (8-device aggregate) {mem.temp_size_in_bytes/1e9:.2f} GB"
    )
    assert per_dev_args < 4.5e9, f"trlan args not sharded: {per_dev_args/1e9:.2f} GB"
    assert mem.temp_size_in_bytes < 8 * 16e9


@pytest.mark.slow
@pytest.mark.parametrize("name", ["pythia-1.4b"])
def test_probe_parallel_tp_slq_at_scale(name):
    """Probe-parallel SLQ x TP at 1.4B (VERDICT r4 #7): the d.sh
    multi-probe grid as ONE program — probe axis over 'data', every
    probe's HVP TP-sharded over 'model' (collectives ride ICI inside
    each probe; probes stay independent).  Pure probe-parallelism at
    1.4B f32 cannot fit a 16 GB chip (params 5.66 GB replicated + 2
    P-vectors/probe = 17 GB/device); the TP composition is the memory
    plan that does."""
    from hessian_llm_vision_tpu.parallel.probe_parallel import (
        _jitted_probe_step,
    )
    from hessian_llm_vision_tpu.utils.flatten import Flattener

    cfg = PYTHIA_CONFIGS[name]
    model = NeoXLMHead(cfg)
    mesh = make_mesh(num_data=2, num_model=4)
    loss_fn = losses.lm_loss_fn(model)
    abstract_params = _abstract_params(model, cfg, mesh)
    fl = Flattener(abstract_params)

    n_probes = 2
    vec_sh = NamedSharding(mesh, P("data", "model"))
    q_abs = jax.ShapeDtypeStruct((n_probes, fl.size), jnp.float32,
                                 sharding=vec_sh)
    b_abs = jax.ShapeDtypeStruct(
        (n_probes,), jnp.float32, sharding=NamedSharding(mesh, P("data"))
    )
    scale_abs = jax.ShapeDtypeStruct((), jnp.float32)
    batches_abs = {
        "input_ids": jax.ShapeDtypeStruct(
            (2, 8, 128), jnp.int32,
            sharding=NamedSharding(mesh, P()),
        )
    }
    step = _jitted_probe_step(
        loss_fn, "mean", "high", fl, "hessian", None, None, False
    )
    compiled = step.lower(
        q_abs, q_abs, b_abs, scale_abs, abstract_params, batches_abs
    ).compile()
    mem = compiled.memory_analysis()
    per_dev_args = mem.argument_size_in_bytes
    # q_cur+q_prev: 2 probes x 5.66 GB over 8 devices = 1.41x2; TP params
    # 1.41; => ~4.3 GB/device
    print(
        f"[1.4b probe-parallel x TP] args/device {per_dev_args/1e9:.2f} GB, "
        f"temp (8-device aggregate) {mem.temp_size_in_bytes/1e9:.2f} GB"
    )
    assert per_dev_args < 5.0e9, (
        f"probe-parallel args not sharded: {per_dev_args/1e9:.2f} GB"
    )
    assert mem.temp_size_in_bytes < 8 * 16e9
