"""Sequence-parallel residual-stream sharding: exactness on the 8-dev mesh.

``parallel.seq_parallel`` asserts a (data, seq, None) sharding on the
(B, T, C) activations between transformer blocks.  The constraint must be
numerically invisible: loss, gradient, and HVP of a seq-sharded model
agree with the unsharded single-device model to reduction-order
tolerance.  Covers all three LM
families and the bs1 long-context case (data axis unused — the situation
SP exists for).  No reference counterpart (its parallelism is batch-only
DataParallel); beyond-parity scaling capability.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hessian_llm_vision_tpu.data import random_token_batches
from hessian_llm_vision_tpu.models import losses
from hessian_llm_vision_tpu.models.gpt2 import GPT2Config, GPT2LMHead
from hessian_llm_vision_tpu.models.llama import LlamaConfig, LlamaLMHead
from hessian_llm_vision_tpu.models.pythia import NeoXConfig, NeoXLMHead
from hessian_llm_vision_tpu.parallel import make_mesh, seq_parallel_config
from hessian_llm_vision_tpu.utils.flatten import Flattener

T = 16


def _families():
    return [
        (
            "gpt2",
            GPT2Config.tiny(n_positions=T),
            GPT2LMHead,
        ),
        (
            "llama",
            LlamaConfig(
                vocab_size=256, hidden_size=32, num_layers=2, num_heads=2,
                intermediate_size=64, max_position_embeddings=T,
            ),
            LlamaLMHead,
        ),
        (
            "neox",
            NeoXConfig(
                vocab_size=256, hidden_size=32, num_layers=2, num_heads=2,
                max_position_embeddings=T,
            ),
            NeoXLMHead,
        ),
    ]


@pytest.mark.parametrize(
    "fam",
    [
        # fast suite keeps gpt2 (both mesh shapes); the llama/neox family
        # sweeps (~20-28 s each, 1-core simulated mesh) run under --runslow
        f if f[0] == "gpt2" else pytest.param(f, marks=pytest.mark.slow)
        for f in _families()
    ],
    ids=lambda f: f[0],
)
@pytest.mark.parametrize("bs,data_axis", [(8, "data"), (1, None)],
                         ids=["dp8xsp", "bs1_sp_only"])
def test_seq_parallel_exactness(fam, bs, data_axis):
    name, cfg, cls = fam
    # bs1: 1x8 mesh, all devices on the seq axis (context-parallel);
    # bs8: 4x2 mesh, DP x SP composed
    mesh = make_mesh(1, 8) if data_axis is None else make_mesh(4, 2)
    cfg_sp = seq_parallel_config(
        cfg, mesh, seq_axis="model", data_axis=data_axis
    )

    model, model_sp = cls(cfg), cls(cfg_sp)
    key = jax.random.PRNGKey(0)
    params = model.init_params(key, seq_len=T)
    ids = jnp.asarray(
        random_token_batches(1, bs, T, cfg.vocab_size, seed=3)["input_ids"][0]
    )
    batch = {"input_ids": ids}

    loss = losses.lm_loss_fn(model)
    loss_sp = losses.lm_loss_fn(model_sp)
    fl = Flattener(params)
    v = jax.random.normal(jax.random.fold_in(key, 1), (fl.size,))

    def hvp(lfn):
        def g(p):
            return jax.grad(lfn)(p, batch)

        return fl.flatten(jax.jvp(g, (params,), (fl.unflatten(v),))[1])

    l0 = jax.jit(loss)(params, batch)
    l1 = jax.jit(loss_sp)(params, batch)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)

    g0 = fl.flatten(jax.jit(jax.grad(loss))(params, batch))
    g1 = fl.flatten(jax.jit(jax.grad(loss_sp))(params, batch))
    # sharded reductions reassociate float adds; tolerance is the
    # reduction-order floor, not a sharding error
    scale_g = float(jnp.abs(g0).max()) + 1e-30
    np.testing.assert_allclose(
        np.asarray(g1 - g0) / scale_g, np.zeros(fl.size), atol=5e-5
    )

    h0, h1 = jax.jit(lambda: hvp(loss))(), jax.jit(lambda: hvp(loss_sp))()
    scale = float(jnp.linalg.norm(h0)) + 1e-30
    np.testing.assert_allclose(
        np.asarray(h1 - h0) / scale, np.zeros(fl.size), atol=1e-6
    )


@pytest.mark.slow
def test_seq_parallel_spectrum_host_loop():
    """A host-loop spectrum through the seq-sharded loss == unsharded."""
    from hessian_llm_vision_tpu.krylov.driver import dataset_spectrum_host
    from hessian_llm_vision_tpu.krylov.slq import ritz_decomposition

    cfg = GPT2Config.tiny(n_positions=T)
    mesh = make_mesh(1, 8)
    cfg_sp = seq_parallel_config(cfg, mesh, data_axis=None)
    model, model_sp = GPT2LMHead(cfg), GPT2LMHead(cfg_sp)
    params = model.init_params(jax.random.PRNGKey(0), seq_len=T)
    data = random_token_batches(2, 1, T, cfg.vocab_size, seed=5)
    bd = [{"input_ids": jnp.asarray(data["input_ids"][i])} for i in range(2)]
    fl = Flattener(params)
    v0 = jax.random.normal(jax.random.PRNGKey(2), (fl.size,))

    kw = dict(v0=v0, flattener=fl)
    r0 = dataset_spectrum_host(
        losses.lm_loss_fn(model), params, bd, 6, **kw
    )
    r1 = dataset_spectrum_host(
        losses.lm_loss_fn(model_sp), params, bd, 6, fused=True, **kw
    )
    e0 = np.sort(np.asarray(ritz_decomposition(r0).eigvals))
    e1 = np.sort(np.asarray(ritz_decomposition(r1).eigvals))
    np.testing.assert_allclose(e0[-1], e1[-1], rtol=1e-5)
    np.testing.assert_allclose(e0[0], e1[0], rtol=1e-4, atol=1e-6)
