"""Pipeline parallelism (GPipe-style) over a ``pp`` mesh axis.

The reference has no pipeline parallelism — its only multi-device mechanism
is ``torch.nn.DataParallel`` over the batch axis
(/root/reference/gpt2_savehessian.py:116-123); SURVEY.md §2.7 marks PP as
absent.  This module adds it the TPU-native way, completing the dp x tp x
sp x pp sharding vocabulary for the curvature stack:

* the L transformer blocks are grouped into S stages and their parameters
  STACKED into ``[S, L/S, ...]`` leaves, stage axis sharded over ``pp`` —
  each device holds only its own stage's weights (the memory lever: block
  parameters never replicate across the pipeline);
* the batch is split into M microbatches and rotated through the stages by
  a ``lax.scan`` over ``M + S - 1`` ticks with one ``ppermute`` per tick —
  the scaling-book "pipelining as a collective permute" recipe, riding ICI
  neighbour links;
* embedding / final-norm / vocab-head / loss stay OUTSIDE ``shard_map`` in
  global SPMD semantics, so the whole thing remains an ordinary
  differentiable ``loss(params, batch)``: grads, HVPs and Lanczos run
  through the pipeline unchanged (``ppermute`` is linear — its transpose is
  the reverse permute, its jvp is itself — so jvp-of-grad curvature is
  exact).  Differentiation happens outside ``shard_map`` per this repo's
  jax-0.9 VMA convention (see parallel/hvp_sharded.py).

Numerics: stages apply the SAME block computations in the same order as the
sequential model, so loss/grad/HVP match the unpipelined model to
reduction-order tolerance (pinned <=1e-5 in
tests/distributed/test_pipeline.py).

Cost model: the pipeline bubble is the standard (S-1)/(M+S-1) fraction —
devices compute on zero activations during fill/drain ticks.  Activations
enter replicated (stage 0 reads its microbatch; other stages ignore the
copy), which spends HBM, not ICI; the per-tick ``ppermute`` moves exactly
one microbatch of residual stream per neighbour link.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from hessian_llm_vision_tpu.models.losses import causal_lm_loss


def make_pipeline_mesh(
    num_data: int,
    num_stages: int,
    *,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Mesh('data', 'pp'): batch axis x pipeline-stage axis."""
    devs = list(devices) if devices is not None else jax.devices()
    n = num_data * num_stages
    if n > len(devs):
        raise ValueError(f"requested {n} devices, have {len(devs)}")
    grid = np.asarray(devs[:n]).reshape(num_data, num_stages)
    return Mesh(grid, ("data", "pp"))


def _is_block_key(key: str, prefix: str) -> bool:
    return key.startswith(prefix) and key[len(prefix):].isdigit()


def stack_pipeline_params(
    params: Any, n_layer: int, n_stages: int, *, block_prefix: str = "h_"
) -> Any:
    """Regroup ``h_0..h_{L-1}`` into a stage-stacked ``blocks`` subtree.

    Returns a params dict where every block leaf has shape
    ``[n_stages, n_layer // n_stages, ...]`` (stage-major, layer order
    preserved) under the key ``"blocks"``; non-block params (wte, wpe,
    ln_f, lm_head, ...) pass through unchanged.  The result is an ordinary
    pytree — ``utils.flatten.Flattener`` and every curvature operator work
    on it directly.
    """
    if n_layer % n_stages:
        raise ValueError(f"n_layer={n_layer} not divisible by n_stages={n_stages}")
    nb = n_layer // n_stages
    blocks = [params[f"{block_prefix}{i}"] for i in range(n_layer)]
    stages = [
        jax.tree.map(lambda *xs: jnp.stack(xs), *blocks[s * nb:(s + 1) * nb])
        for s in range(n_stages)
    ]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *stages)
    rest = {
        k: v for k, v in params.items() if not _is_block_key(k, block_prefix)
    }
    return dict(rest, blocks=stacked)


def unstack_pipeline_params(pipe_params: Any, *, block_prefix: str = "h_") -> Any:
    """Inverse of :func:`stack_pipeline_params` (exact round-trip)."""
    stacked = pipe_params["blocks"]
    S, nb = jax.tree.leaves(stacked)[0].shape[:2]
    out = {k: v for k, v in pipe_params.items() if k != "blocks"}
    for s in range(S):
        for j in range(nb):
            out[f"{block_prefix}{s * nb + j}"] = jax.tree.map(
                lambda a, s=s, j=j: a[s, j], stacked
            )
    return out


def pipeline_param_sharding(
    pipe_params: Any, mesh: Mesh, *, pp_axis: str = "pp"
) -> Any:
    """NamedSharding tree: ``blocks`` stage-sharded over ``pp_axis`` (dim
    0), everything else replicated.  ``jax.device_put(pipe_params, this)``
    places each stage's weights on its own pipeline rank."""
    rep = NamedSharding(mesh, P())

    def shard(a):
        return NamedSharding(mesh, P(*((pp_axis,) + (None,) * (a.ndim - 1))))

    return dict(
        {
            k: jax.tree.map(lambda _: rep, v)
            for k, v in pipe_params.items()
            if k != "blocks"
        },
        blocks=jax.tree.map(shard, pipe_params["blocks"]),
    )


def pipeline_apply(
    stage_fn: Callable[[Any, jax.Array], jax.Array],
    stage_params: Any,
    xm: jax.Array,
    mesh: Mesh,
    *,
    pp_axis: str = "pp",
    data_axis: Optional[str] = None,
) -> jax.Array:
    """Rotate microbatched activations through the stage pipeline.

    ``stage_params``: pytree with leading stage axis (``[S, ...]`` leaves),
    sharded over ``pp_axis``.  ``xm``: ``[M, b, T, C]`` microbatched
    activations (optionally ``b`` sharded over ``data_axis`` for dp x pp).
    ``stage_fn(local_stage_params, x) -> x`` applies ONE stage's blocks.

    Schedule: tick ``t`` has stage ``s`` processing microbatch ``t - s``
    (zeros during the fill/drain bubble); after each tick the residual
    stream ppermutes to the next stage.  Microbatch ``m`` leaves the last
    stage at tick ``m + S - 1``; outputs are psum'd over ``pp`` so every
    rank returns the full result (the transpose of that psum is the
    broadcast the backward pass needs).
    """
    S = mesh.shape[pp_axis]
    act_spec = P(None, data_axis, *((None,) * (xm.ndim - 2)))
    blk_specs = jax.tree.map(
        lambda a: P(*((pp_axis,) + (None,) * (a.ndim - 1))), stage_params
    )

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(blk_specs, act_spec),
        out_specs=act_spec,
    )
    def run(bp, xloc):
        s = jax.lax.axis_index(pp_axis)
        bp = jax.tree.map(lambda a: a[0], bp)  # local [1, nb, ...] -> [nb, ...]
        M = xloc.shape[0]
        perm = [(i, (i + 1) % S) for i in range(S)]
        # scan-vma rule: the carry becomes pp-varying inside the body
        # (axis_index selects), so the initial carry must enter varying
        state = jax.lax.pcast(jnp.zeros_like(xloc[0]), (pp_axis,), to="varying")
        outputs = jax.lax.pcast(jnp.zeros_like(xloc), (pp_axis,), to="varying")

        def tick(carry, t):
            state, outputs = carry
            x_in = jax.lax.dynamic_index_in_dim(
                xloc, jnp.clip(t, 0, M - 1), 0, keepdims=False
            )
            state = jnp.where(s == 0, x_in, state)
            state = stage_fn(bp, state)
            oidx = jnp.clip(t - (S - 1), 0, M - 1)
            cur = jax.lax.dynamic_index_in_dim(outputs, oidx, 0, keepdims=False)
            write = jnp.logical_and(s == S - 1, t >= S - 1)
            outputs = jax.lax.dynamic_update_index_in_dim(
                outputs, jnp.where(write, state, cur), oidx, 0
            )
            if S > 1:
                state = jax.lax.ppermute(state, pp_axis, perm)
            return (state, outputs), None

        (_, outputs), _ = jax.lax.scan(
            tick, (state, outputs), jnp.arange(M + S - 1)
        )
        # psum unconditionally: over a size-1 pp axis it is an identity that
        # re-establishes replication, which the out_specs VMA check requires
        # (the pcast above made outputs pp-varying even when S == 1).
        outputs = jax.lax.psum(outputs, pp_axis)
        return outputs

    return run(stage_params, xm)


def make_pipelined_lm_loss(
    model: Any,
    mesh: Mesh,
    *,
    num_microbatches: int,
    pp_axis: str = "pp",
    data_axis: Optional[str] = None,
    include_padding: bool = False,
) -> Callable[[Any, Any], jax.Array]:
    """Pipelined GPT-2 LM loss: ``loss(pipe_params, batch) -> scalar``.

    ``pipe_params`` come from :func:`stack_pipeline_params`; place them
    with :func:`pipeline_param_sharding` so each rank holds one stage.
    Embedding / ln_f / vocab head run in global SPMD semantics outside the
    pipeline region (they reproduce models/gpt2.py::GPT2LMHead exactly —
    parity pinned in tests/distributed/test_pipeline.py); only the block
    stack is staged.  The returned closure is the standard
    ``loss_fn(params, batch)`` contract, so HessianOperator / Lanczos /
    LanczosSGD compose with it unchanged.
    """
    import contextlib

    import flax.linen as nn

    from hessian_llm_vision_tpu.models.gpt2 import Block

    cfg = model.config
    if cfg.seq_sharding is not None:
        # The shard_map'd pipeline region fixes the activation layout itself
        # (microbatch rotation over pp); a seq-sharded residual stream cannot
        # be asserted inside it, so refuse loudly rather than silently
        # computing with a different layout than models/gpt2.py:190-199.
        raise ValueError(
            "make_pipelined_lm_loss does not support cfg.seq_sharding; "
            "use the sequential model (models/gpt2.py) for seq-parallel runs"
        )
    block = Block(cfg)

    from hessian_llm_vision_tpu.models.precision import uniform_precision

    # uniform_precision raises on a per-layer tuple: one Block program scans
    # over all stages here, so per-block precision cannot be expressed.
    _block_prec = uniform_precision(cfg.block_matmul_precision)

    def _precision_ctx():
        # Match models/gpt2.py: the block stack (and, here, the whole
        # staged computation) honors cfg.block_matmul_precision.
        if _block_prec is not None:
            return jax.default_matmul_precision(_block_prec)
        return contextlib.nullcontext()

    def stage_fn(bp, x):
        def body(h, p):
            return block.apply({"params": p}, h), None

        with _precision_ctx():
            h, _ = jax.lax.scan(body, x, bp)
        return h

    # Anchor the activation layout around the shard_map region: without
    # these constraints the SPMD partitioner has to invent shardings for
    # the embedding/head tensors of the TRANSPOSED (grad/HVP) program and
    # falls back to "involuntary full rematerialization" (replicate, then
    # repartition) on the reshapes flanking the pipeline — measured as 7
    # replicate-the-tensor warnings per HVP compile on the dp x pp mesh
    # (VERDICT r3 item 2).  The constraints are linear and exact; jvp and
    # transpose propagate them to tangents/cotangents.
    micro_spec = P(None, data_axis, None, None)
    flat_spec = P(data_axis, None, None)

    def _constrain(t, spec):
        return jax.lax.with_sharding_constraint(t, NamedSharding(mesh, spec))

    def loss(pipe_params, batch):
        ids = batch["input_ids"]
        B, T = ids.shape
        if B % num_microbatches:
            raise ValueError(
                f"batch {B} not divisible by num_microbatches={num_microbatches}"
            )
        wte, wpe = pipe_params["wte"], pipe_params["wpe"]
        x = wte[ids].astype(cfg.dtype) + wpe[:T][None].astype(cfg.dtype)
        x = _constrain(x, flat_spec)
        xm = x.reshape(num_microbatches, B // num_microbatches, T, cfg.n_embd)
        xm = _constrain(xm, micro_spec)
        ym = pipeline_apply(
            stage_fn,
            pipe_params["blocks"],
            xm,
            mesh,
            pp_axis=pp_axis,
            data_axis=data_axis,
        )
        ym = _constrain(ym, micro_spec)
        y = ym.reshape(B, T, cfg.n_embd)
        y = _constrain(y, flat_spec)
        y = nn.LayerNorm(epsilon=1e-5, dtype=cfg.dtype).apply(
            {"params": pipe_params["ln_f"]}, y
        )
        if cfg.tie_word_embeddings:
            logits = jnp.einsum("btc,vc->btv", y, wte.astype(cfg.dtype))
        else:
            logits = y @ pipe_params["lm_head"]["kernel"]
        return causal_lm_loss(
            logits.astype(jnp.float32),
            ids,
            batch.get("attention_mask"),
            include_padding=include_padding,
        )

    return loss
