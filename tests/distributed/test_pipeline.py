"""Pipeline parallelism: exactness of the staged GPT-2 forward on the mesh.

``parallel.pipeline`` rotates microbatches through stage-sharded block
stacks with one ppermute per tick (GPipe schedule).  The schedule must be
numerically invisible: loss, gradient, and HVP through the pipelined loss
agree with the sequential single-device model to reduction-order
tolerance, under pp-only and dp x pp meshes.  No reference counterpart
(its parallelism is batch-only DataParallel, gpt2_savehessian.py:116-123);
beyond-parity scaling capability.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hessian_llm_vision_tpu.models import losses
from hessian_llm_vision_tpu.models.gpt2 import GPT2Config, GPT2LMHead
from hessian_llm_vision_tpu.parallel.pipeline import (
    make_pipeline_mesh,
    make_pipelined_lm_loss,
    pipeline_param_sharding,
    stack_pipeline_params,
    unstack_pipeline_params,
)

T = 16
L = 4


def _setup(vocab=64):
    cfg = GPT2Config(
        vocab_size=vocab, n_positions=T, n_embd=16, n_layer=L, n_head=2
    )
    model = GPT2LMHead(cfg)
    params = model.init_params(jax.random.PRNGKey(0), seq_len=T)
    ids = jax.random.randint(jax.random.PRNGKey(1), (8, T), 0, vocab)
    batch = {"input_ids": ids}
    return cfg, model, params, batch


def _tree_allclose(a, b, rtol=1e-3, atol=1e-4):
    # reduction-order tolerance: microbatched/staged compute reassociates
    # f32 sums (measured ~9e-5 rel on grads); schedule bugs are O(1) errors
    flat_a, _ = jax.tree_util.tree_flatten(a)
    flat_b, _ = jax.tree_util.tree_flatten(b)
    assert len(flat_a) == len(flat_b)
    for x, y in zip(flat_a, flat_b):
        np.testing.assert_allclose(
            np.asarray(x), np.asarray(y), rtol=rtol, atol=atol
        )


def test_stack_unstack_roundtrip():
    _, _, params, _ = _setup()
    pipe = stack_pipeline_params(params, L, 2)
    back = unstack_pipeline_params(pipe)
    flat_a, tree_a = jax.tree_util.tree_flatten(params)
    flat_b, tree_b = jax.tree_util.tree_flatten(back)
    assert tree_a == tree_b
    for x, y in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


@pytest.mark.parametrize(
    "num_data,num_stages,data_axis,microbatches",
    [
        # fast suite keeps pp2 + dp2xpp2 (one pure-pp, one dp×pp case);
        # the remaining grid (~30-40 s each on the 1-core simulated mesh)
        # runs under --runslow / the round's full-suite commands
        pytest.param(1, 4, None, 4, marks=pytest.mark.slow),
        (1, 2, None, 2),
        (2, 2, "data", 4),
        pytest.param(2, 4, "data", 2, marks=pytest.mark.slow),
        # pp=1 degenerate pipeline: the dryrun fallback for odd device
        # counts (__graft_entry__.py) — psum over the size-1 axis must
        # re-establish replication for the out_specs VMA check
        pytest.param(1, 1, None, 4, marks=pytest.mark.slow),
        pytest.param(2, 1, "data", 2, marks=pytest.mark.slow),
    ],
    ids=["pp4", "pp2", "dp2xpp2", "dp2xpp4", "pp1", "dp2xpp1"],
)
def test_pipelined_loss_grad_hvp_exact(num_data, num_stages, data_axis, microbatches):
    cfg, model, params, batch = _setup()
    mesh = make_pipeline_mesh(num_data, num_stages)
    pipe_params = jax.device_put(
        stack_pipeline_params(params, L, num_stages),
        pipeline_param_sharding(
            stack_pipeline_params(params, L, num_stages), mesh
        ),
    )

    plain_loss = losses.lm_loss_fn(model)
    pipe_loss = make_pipelined_lm_loss(
        model, mesh, num_microbatches=microbatches, data_axis=data_axis
    )

    l_plain = jax.jit(plain_loss)(params, batch)
    l_pipe = jax.jit(pipe_loss)(pipe_params, batch)
    np.testing.assert_allclose(
        float(l_plain), float(l_pipe), rtol=1e-6, atol=1e-6
    )

    g_plain = jax.jit(jax.grad(plain_loss))(params, batch)
    g_pipe = jax.jit(jax.grad(pipe_loss))(pipe_params, batch)
    _tree_allclose(g_plain, unstack_pipeline_params(g_pipe))

    # HVP: jvp of grad along a matching tangent in both parameterizations
    v = jax.tree.map(
        lambda a: jax.random.normal(jax.random.PRNGKey(7), a.shape, a.dtype),
        params,
    )
    v_pipe = stack_pipeline_params(v, L, num_stages)

    def hvp(loss_fn, p, t):
        return jax.jvp(lambda q: jax.grad(loss_fn)(q, batch), (p,), (t,))[1]

    h_plain = jax.jit(lambda p: hvp(plain_loss, p, v))(params)
    h_pipe = jax.jit(lambda p: hvp(pipe_loss, p, v_pipe))(pipe_params)
    _tree_allclose(h_plain, unstack_pipeline_params(h_pipe), rtol=2e-3, atol=2e-3)


def test_pipelined_loss_honors_block_matmul_precision():
    """cfg.block_matmul_precision wraps the staged block stack (and the
    sequential model wraps its blocks identically, gpt2.py:191-195), so the
    two paths must still agree exactly; seq_sharding is refused loudly."""
    import dataclasses

    cfg, model, params, batch = _setup()
    cfg_p = dataclasses.replace(cfg, block_matmul_precision="high")
    model_p = GPT2LMHead(cfg_p)
    mesh = make_pipeline_mesh(1, 2)
    pipe_params = stack_pipeline_params(params, L, 2)
    pipe_loss = make_pipelined_lm_loss(model_p, mesh, num_microbatches=4)
    l_pipe = jax.jit(pipe_loss)(pipe_params, batch)
    l_plain = jax.jit(losses.lm_loss_fn(model_p))(params, batch)
    np.testing.assert_allclose(float(l_plain), float(l_pipe), rtol=1e-6, atol=1e-6)

    from jax.sharding import NamedSharding, PartitionSpec

    cfg_s = dataclasses.replace(
        cfg, seq_sharding=NamedSharding(mesh, PartitionSpec())
    )
    with pytest.raises(ValueError, match="seq_sharding"):
        make_pipelined_lm_loss(GPT2LMHead(cfg_s), mesh, num_microbatches=4)


def test_pipelined_loss_composes_with_curvature_stack():
    """HessianOperator + Lanczos run through the pipelined loss unchanged."""
    from hessian_llm_vision_tpu.curvature import HessianOperator
    from hessian_llm_vision_tpu.krylov import lanczos

    cfg, model, params, batch = _setup()
    mesh = make_pipeline_mesh(1, 4)
    pipe_params = stack_pipeline_params(params, L, 4)
    pipe_loss = make_pipelined_lm_loss(model, mesh, num_microbatches=4)

    op_pipe = HessianOperator(pipe_loss, pipe_params, batch)
    op_plain = HessianOperator(losses.lm_loss_fn(model), params, batch)

    # the two flat spaces are the same R^P up to a coordinate permutation:
    # start both recurrences from the SAME vector (mapped through the
    # stacking) and the tridiagonal T matrices must agree
    from hessian_llm_vision_tpu.utils.flatten import Flattener

    fl_plain, fl_pipe = Flattener(params), Flattener(pipe_params)
    v0 = jax.random.normal(jax.random.PRNGKey(3), (op_plain.dim,), jnp.float32)
    v0_pipe = fl_pipe.flatten(
        stack_pipeline_params(fl_plain.unflatten(v0), L, 4)
    )
    res_plain = lanczos(op_plain.matvec, op_plain.dim, 5, v0=v0)
    res_pipe = lanczos(op_pipe.matvec, op_pipe.dim, 5, v0=v0_pipe)
    # reassociation noise (~1e-4 per HVP) compounds through the recurrence;
    # a schedule bug would be an O(1) disagreement
    np.testing.assert_allclose(
        np.asarray(res_pipe.alphas), np.asarray(res_plain.alphas),
        rtol=1e-2, atol=1e-3,
    )
    np.testing.assert_allclose(
        np.asarray(res_pipe.betas), np.asarray(res_plain.betas),
        rtol=1e-2, atol=1e-3,
    )
