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
    inputs: jax.Array,
    mesh: Mesh,
    *,
    input_fn: Optional[Callable[[Any, jax.Array], jax.Array]] = None,
    input_consts: Any = None,
    pp_axis: str = "pp",
    data_axis: Optional[str] = None,
    scatter_outputs: bool = True,
    remat_ticks: bool = False,
) -> jax.Array:
    """Rotate microbatched activations through the stage pipeline.

    ``stage_params``: pytree with leading stage axis (``[S, ...]`` leaves),
    sharded over ``pp_axis``.  ``inputs``: ``[M, b, ...]`` microbatched RAW
    inputs (``b`` optionally sharded over ``data_axis`` for dp x pp).
    ``input_fn(input_consts, inp_mb) -> (b, T, C)`` produces stage-0
    activations per microbatch INSIDE the pipeline region (e.g. the token
    embedding) — so the replicated entry cost is the raw inputs (int32
    ids: 256× smaller than f32 activations), not ``[M, b, T, C]``
    activations on every rank.  ``input_fn=None`` treats ``inputs`` as
    activations directly.  ``stage_fn(local_stage_params, x) -> x``
    applies ONE stage's blocks.

    Schedule: tick ``t`` has stage ``s`` processing microbatch ``t - s``
    (zeros during the fill/drain bubble — the GPipe bubble fraction
    (S-1)/(M+S-1)); after each tick the residual stream ppermutes to the
    next stage.  Microbatch ``m`` leaves the last stage at tick
    ``m + S - 1``.

    Exit: with ``scatter_outputs=True`` (and ``M % S == 0``) the outputs
    leave via ``psum_scatter`` — each rank returns M/S microbatches and
    the result is microbatch-sharded over ``pp_axis`` (1/S the exit bytes
    of an all-reduce AND 1/S the post-region HBM; downstream norm/head/
    loss compute then parallelizes over pp for free).  Otherwise a psum
    replicates the full result (also the S=1 degenerate path: psum over a
    size-1 axis is the identity that re-establishes replication for the
    out_specs VMA check).

    ``remat_ticks=True`` checkpoints each tick body: the scan's backward
    then keeps only per-tick carries as residuals and recomputes the
    stage interior — the activation-memory lever for deep stages (NOTE
    this repo's remote-compiler ceiling: per-tick remat is a small
    recompute region, unlike whole-loss remat which it rejects).

    Why GPipe and not 1F1B: this pipeline lives INSIDE a differentiable
    ``loss(params, batch)`` closure — grads and HVPs come from jax
    autodiff of the scan, which already interleaves its own backward
    sweep; an explicit 1F1B schedule only reorders work autodiff
    schedules itself, and its memory win (S live microbatches instead of
    M) is delivered here by ``remat_ticks`` + the scattered exit instead.
    """
    S = mesh.shape[pp_axis]
    M = inputs.shape[0]
    in_spec = P(None, data_axis, *((None,) * (inputs.ndim - 2)))
    scatter = scatter_outputs and (M % S == 0)
    out_spec = (
        P(pp_axis, data_axis, None, None) if scatter
        else P(None, data_axis, None, None)
    )
    blk_specs = jax.tree.map(
        lambda a: P(*((pp_axis,) + (None,) * (a.ndim - 1))), stage_params
    )
    const_specs = jax.tree.map(lambda _: P(), input_consts)

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(blk_specs, const_specs, in_spec),
        out_specs=out_spec,
    )
    def run(bp, consts, inp_loc):
        s = jax.lax.axis_index(pp_axis)
        bp = jax.tree.map(lambda a: a[0], bp)  # local [1, nb, ...] -> [nb, ...]
        perm = [(i, (i + 1) % S) for i in range(S)]

        def embed(mb):
            return input_fn(consts, mb) if input_fn is not None else mb

        # shape/dtype of the residual stream, traced once (constant zeros)
        proto = jax.eval_shape(embed, jax.tree.map(lambda a: a[0], inp_loc))
        # scan-vma rule: the carry becomes varying inside the body (the
        # axis_index select makes it pp-varying; the data-sharded inputs
        # make it data-varying), so the initial constant-zeros carry must
        # enter varying over BOTH axes
        vary_axes = (pp_axis,) + ((data_axis,) if data_axis else ())
        state = jax.lax.pcast(
            jnp.zeros(proto.shape, proto.dtype), vary_axes, to="varying"
        )
        outputs = jax.lax.pcast(
            jnp.zeros((M,) + proto.shape, proto.dtype), vary_axes,
            to="varying",
        )

        def tick(carry, t):
            state, outputs = carry
            mb = jax.lax.dynamic_index_in_dim(
                inp_loc, jnp.clip(t, 0, M - 1), 0, keepdims=False
            )
            state = jnp.where(s == 0, embed(mb), state)
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

        if remat_ticks:
            tick = jax.checkpoint(tick)
        (_, outputs), _ = jax.lax.scan(
            tick, (state, outputs), jnp.arange(M + S - 1)
        )
        if scatter:
            outputs = jax.lax.psum_scatter(
                outputs, pp_axis, scatter_dimension=0, tiled=True
            )
        else:
            outputs = jax.lax.psum(outputs, pp_axis)
        return outputs

    return run(stage_params, input_consts, inputs)


def make_pipelined_lm_loss(
    model: Any,
    mesh: Mesh,
    *,
    num_microbatches: int,
    pp_axis: str = "pp",
    data_axis: Optional[str] = None,
    include_padding: bool = False,
    remat_ticks: bool = False,
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
    S = mesh.shape[pp_axis]
    scatter = num_microbatches % S == 0
    micro_spec = P(pp_axis if scatter else None, data_axis, None, None)

    def _constrain(t, spec):
        return jax.lax.with_sharding_constraint(t, NamedSharding(mesh, spec))

    def loss(pipe_params, batch):
        ids = batch["input_ids"]
        B, T = ids.shape
        M = num_microbatches
        if B % M:
            raise ValueError(
                f"batch {B} not divisible by num_microbatches={M}"
            )
        wte, wpe = pipe_params["wte"], pipe_params["wpe"]
        idm = ids.reshape(M, B // M, T)

        def embed(consts, mb):
            w, p = consts
            return w[mb].astype(cfg.dtype) + p[:T][None].astype(cfg.dtype)

        # entry: int32 ids only (the f32 activations never replicate);
        # exit: microbatch-sharded over pp (psum_scatter) when M % S == 0,
        # so ln_f/head/loss below also shard over pp
        ym = pipeline_apply(
            stage_fn,
            pipe_params["blocks"],
            idm,
            mesh,
            input_fn=embed,
            input_consts=(wte, wpe),
            pp_axis=pp_axis,
            data_axis=data_axis,
            scatter_outputs=True,
            remat_ticks=remat_ticks,
        )
        ym = _constrain(ym, micro_spec)  # (M, b, T, C)
        y = nn.LayerNorm(epsilon=1e-5, dtype=cfg.dtype).apply(
            {"params": pipe_params["ln_f"]}, ym
        )
        if cfg.tie_word_embeddings:
            logits = jnp.einsum("mbtc,vc->mbtv", y, wte.astype(cfg.dtype))
        else:
            logits = jnp.einsum(
                "mbtc,cv->mbtv", y, pipe_params["lm_head"]["kernel"]
            )
        mask = batch.get("attention_mask")
        return _lm_loss_leading_dims(
            logits.astype(jnp.float32),
            idm,
            None if mask is None else mask.reshape(M, B // M, T),
            include_padding=include_padding,
        )

    return loss


def _lm_loss_leading_dims(logits, ids, mask, *, include_padding: bool):
    """Shifted next-token CE over arbitrary leading dims.

    Identical math to ``models.losses.causal_lm_loss`` (one global mean /
    masked mean over every target position) for ``(M, b, T, V)``
    microbatch-leading layouts — flattening to ``(B, T, V)`` instead
    would reshape across the pp-sharded microbatch dim and force the
    partitioner to regather the logits."""
    logits = logits[..., :-1, :].astype(jnp.float32)
    targets = ids[..., 1:]
    logp = jax.nn.log_softmax(logits)
    token_ll = jnp.take_along_axis(
        logp, targets[..., None], axis=-1
    ).squeeze(-1)
    if mask is not None and not include_padding:
        m = mask[..., 1:].astype(jnp.float32)
        return -(token_ll * m).sum() / jnp.maximum(m.sum(), 1.0)
    return -token_ll.mean()
