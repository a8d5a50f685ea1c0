"""Sharded thick-restart memory proof at the 124M scale (AOT, no chip).

Thick restart's footprint is its (inner+1, P) buffer: at 124M / f32 /
inner=40 that is ~20.7 GB — over one chip's HBM, which is why the on-chip
round-3 run (artifacts/trlan124m_r3) had to drop to a 16-vector bf16
buffer.  With ``basis_sharding`` the buffer shards along P over the mesh.
This test AOT-lowers the hot helper programs (CGS2 orthogonalization step,
restart rotation) at the EXACT 124M/inner=40/f32 shapes on the 8-device
mesh and asserts the compiler's per-device memory analysis sees only the
1/8 shard — proof the converged-eigenpair path scales past one chip.
"""

import jax
import jax.numpy as jnp
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from hessian_llm_vision_tpu.krylov.thick_restart import _orth_step, _rotate_one
from hessian_llm_vision_tpu.parallel import make_mesh
from hessian_llm_vision_tpu.parallel.mesh import basis_sharding

DIM = 124_440_576  # GPT-2 124M flat size, divisible by 8
M = 40  # inner buffer (rows m+1 = 41)


@pytest.mark.slow
def test_trlan_helpers_aot_per_device_memory():
    mesh = make_mesh(8)
    q_sh = basis_sharding(mesh)  # (rows, P): P over 'data'
    repl = NamedSharding(mesh, P())

    Q_abs = jax.ShapeDtypeStruct((M + 1, DIM), jnp.float32, sharding=q_sh)
    w_abs = jax.ShapeDtypeStruct((DIM,), jnp.float32, sharding=repl)
    n_abs = jax.ShapeDtypeStruct((), jnp.int32)

    compiled = jax.jit(_orth_step).lower(Q_abs, w_abs, n_abs).compile()
    mem = compiled.memory_analysis()
    if mem is None:
        pytest.skip("backend without memory analysis")
    full = (M + 1) * DIM * 4  # 20.4 GB unsharded
    shard = full / 8
    # per-device arguments: one Q shard (+ the replicated P-vector)
    assert mem.argument_size_in_bytes < shard + 3 * DIM * 4, (
        f"args {mem.argument_size_in_bytes/1e9:.2f} GB/device — Q not "
        "sharded"
    )
    # temps must stay O(vector), never a replicated (M+1, P) block
    assert mem.temp_size_in_bytes < 4 * DIM * 4, (
        f"temps {mem.temp_size_in_bytes/1e9:.2f} GB/device — CGS2 "
        "materializing a full-buffer transient"
    )

    coeff_abs = jax.ShapeDtypeStruct((M + 1,), jnp.float32, sharding=repl)
    comp_rot = (
        jax.jit(_rotate_one, static_argnames="out_dtype")
        .lower(Q_abs, coeff_abs, out_dtype=jnp.float32)
        .compile()
    )
    mem_rot = comp_rot.memory_analysis()
    assert mem_rot.output_size_in_bytes <= DIM * 4
    assert mem_rot.temp_size_in_bytes < 4 * DIM * 4


@pytest.mark.slow
def test_trlan_sharded_buffer_lives_sharded():
    """The buffer creation path (out_shardings jit) must produce 1/8
    shards per device at the 124M shape — no replicated transient."""
    mesh = make_mesh(8)
    q_sh = basis_sharding(mesh)
    compiled = (
        jax.jit(lambda: jnp.zeros((M + 1, DIM), jnp.bfloat16),
                out_shardings=q_sh)
        .lower()
        .compile()
    )
    mem = compiled.memory_analysis()
    if mem is None:
        pytest.skip("backend without memory analysis")
    full_bf16 = (M + 1) * DIM * 2
    assert mem.output_size_in_bytes <= full_bf16 / 8 + 1e6
    assert mem.temp_size_in_bytes < full_bf16 / 4, (
        "zeros buffer materializing more than its shard per device"
    )
