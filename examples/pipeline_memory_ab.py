"""Pipeline entry/exit memory A/B on the simulated 8-device mesh.

Measures compiled per-device memory (XLA memory_analysis) of the
pipelined-loss HVP under:

  A) round-3 dataflow: embedding OUTSIDE the region (f32 activations
     enter replicated on every rank), psum (all-reduce) exit —
     reconstructed via pipeline_apply(input_fn=None,
     scatter_outputs=False);
  B) round-4 dataflow: int32 ids enter + embedding INSIDE stage 0,
     psum_scatter exit (outputs microbatch-sharded over pp) — what
     make_pipelined_lm_loss now builds.

Also prints the analytic GPipe bubble fraction for the config.  Run on
the CPU-simulated mesh:
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python examples/pipeline_memory_ab.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from hessian_llm_vision_tpu.models import GPT2Config, GPT2LMHead
from hessian_llm_vision_tpu.models.losses import causal_lm_loss
from hessian_llm_vision_tpu.parallel.pipeline import (
    make_pipeline_mesh,
    make_pipelined_lm_loss,
    pipeline_apply,
    pipeline_param_sharding,
    stack_pipeline_params,
)
from hessian_llm_vision_tpu.utils.flatten import Flattener


def legacy_pipelined_loss(model, mesh, *, num_microbatches, data_axis):
    """Round-3 dataflow: embed outside, replicated activations in, psum out."""
    import flax.linen as nn

    cfg = model.config
    from hessian_llm_vision_tpu.models.gpt2 import Block

    block = Block(cfg)

    def stage_fn(bp, x):
        def body(h, p):
            return block.apply({"params": p}, h), None

        h, _ = jax.lax.scan(body, x, bp)
        return h

    def loss(pipe_params, batch):
        ids = batch["input_ids"]
        B, T = ids.shape
        M = num_microbatches
        wte, wpe = pipe_params["wte"], pipe_params["wpe"]
        x = wte[ids].astype(cfg.dtype) + wpe[:T][None].astype(cfg.dtype)
        xm = x.reshape(M, B // M, T, cfg.n_embd)
        ym = pipeline_apply(
            stage_fn, pipe_params["blocks"], xm, mesh,
            data_axis=data_axis, scatter_outputs=False,
        )
        y = ym.reshape(B, T, cfg.n_embd)
        y = nn.LayerNorm(epsilon=1e-5, dtype=cfg.dtype).apply(
            {"params": pipe_params["ln_f"]}, y
        )
        logits = jnp.einsum("btc,vc->btv", y, wte.astype(cfg.dtype))
        return causal_lm_loss(logits.astype(jnp.float32), ids)

    return loss


def measure(loss_fn, pipe_params, batch, fl):
    def hvp(v, p, b):
        def scalar(q):
            return loss_fn(q, b)

        return fl.flatten(
            jax.jvp(jax.grad(scalar), (p,), (fl.unflatten(v),))[1]
        )

    v = jnp.zeros((fl.size,), jnp.float32)
    lowered = jax.jit(hvp).lower(v, pipe_params, batch)
    compiled = lowered.compile()
    ma = compiled.memory_analysis()
    return {
        "temp_bytes": int(ma.temp_size_in_bytes),
        "argument_bytes": int(ma.argument_size_in_bytes),
        "output_bytes": int(ma.output_size_in_bytes),
        "total_bytes": int(
            ma.temp_size_in_bytes + ma.argument_size_in_bytes
        ),
    }


def main():
    S, D, M = 4, 2, 8
    cfg = GPT2Config(
        vocab_size=512, n_positions=256, n_embd=256, n_layer=8, n_head=8
    )
    model = GPT2LMHead(cfg)
    params = model.init_params(jax.random.PRNGKey(0), seq_len=256)
    mesh = make_pipeline_mesh(D, S)
    pipe_params = jax.device_put(
        stack_pipeline_params(params, cfg.n_layer, S),
        pipeline_param_sharding(stack_pipeline_params(params, cfg.n_layer, S), mesh),
    )
    B = 4 * M
    batch = {
        "input_ids": jax.random.randint(
            jax.random.PRNGKey(1), (B, 256), 0, cfg.vocab_size
        )
    }
    fl = Flattener(pipe_params)

    v1 = legacy_pipelined_loss(model, mesh, num_microbatches=M, data_axis="data")
    v2 = make_pipelined_lm_loss(model, mesh, num_microbatches=M, data_axis="data")
    v3 = make_pipelined_lm_loss(
        model, mesh, num_microbatches=M, data_axis="data", remat_ticks=True
    )

    res = {
        "config": {
            "stages": S, "data": D, "microbatches": M, "batch": B,
            "seq": 256, "n_embd": cfg.n_embd, "n_layer": cfg.n_layer,
        },
        "bubble_fraction": (S - 1) / (M + S - 1),
        "v1_embed_outside_psum_exit": measure(v1, pipe_params, batch, fl),
        "v2_ids_inside_scatter_exit": measure(v2, pipe_params, batch, fl),
        "v3_v2_plus_remat_ticks": measure(v3, pipe_params, batch, fl),
    }
    a = res["v1_embed_outside_psum_exit"]["total_bytes"]
    b = res["v2_ids_inside_scatter_exit"]["total_bytes"]
    c = res["v3_v2_plus_remat_ticks"]["total_bytes"]
    res["total_bytes_ratio_v2_over_v1"] = round(b / a, 4)
    res["total_bytes_ratio_v3_over_v1"] = round(c / a, 4)
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
