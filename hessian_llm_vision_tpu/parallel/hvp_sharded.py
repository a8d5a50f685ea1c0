"""Data-parallel loss/grad/HVP over a device mesh.

This replaces BOTH of the reference's multi-GPU mechanisms at once:
``DataParallel``'s scatter/gather ``loss.mean()`` forward
(/root/reference/gpt2_savehessian.py:116-123,151-152) and the host-side
``loss *= batch/N`` loader accumulation (gpt2_savehessian.py:130-163) —
because here the *whole differentiable loss* is data-parallel: the batch
shards over the ``data`` mesh axis, every device evaluates its shard, and
one ``pmean`` over ICI produces the global mean loss.  Gradients and HVPs
are then ordinary ``jax.grad`` / ``jax.jvp(jax.grad)`` OF the sharded loss
— XLA transposes the pmean into the correct collectives automatically
(SURVEY.md §2.7 "TPU-native plan").

Design note: differentiation happens OUTSIDE ``shard_map``.  Under jax's
varying-manual-axes semantics, the gradient of a replicated input computed
*inside* shard_map carries a pending-unreduced tag whose explicit
``pmean`` resolves to a psum (8x too big); wrapping only the loss avoids
the trap entirely and keeps every curvature engine in ``curvature/``
reusable unchanged on the mesh.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Optional

import jax
from jax.sharding import Mesh, PartitionSpec as P

from hessian_llm_vision_tpu.curvature.operators import (
    HessianOperator,
    LinearOperator,
)
from hessian_llm_vision_tpu.utils.flatten import Flattener


def _batch_specs(batch: Any) -> Any:
    """P('data', None, ...) spec per leaf of the batch pytree.

    Scalar (0-d) leaves — e.g. a token count or loss weight — replicate.
    """
    return jax.tree_util.tree_map(
        lambda x: P(*(("data",) + (None,) * (x.ndim - 1))) if x.ndim else P(),
        batch,
    )


def make_sharded_loss(
    loss_fn: Callable[[Any, Any], jax.Array], mesh: Mesh
) -> Callable[[Any, Any], jax.Array]:
    """Lift a mean-reduction loss to the mesh: batch shards over 'data',
    params replicate, result is the global mean (pmean over ICI).

    The returned function is an ordinary differentiable
    ``loss(params, batch)`` — grads, HVPs, and Lanczos run through it with
    zero further changes.
    """

    def sharded(params, batch):
        specs = _batch_specs(batch)

        @partial(
            jax.shard_map,
            mesh=mesh,
            in_specs=(P(), specs),
            out_specs=P(),
        )
        def inner(p, b):
            return jax.lax.pmean(loss_fn(p, b), "data")

        return inner(params, batch)

    return sharded


def sharded_grad_fn(
    loss_fn: Callable[[Any, Any], jax.Array], mesh: Mesh
) -> Callable[[Any, Any], tuple]:
    """(params, batch) -> (global mean loss, grad) — DataParallel's
    ``loss.mean()`` semantics exactly (SURVEY.md §7 hard part #6)."""
    sharded = make_sharded_loss(loss_fn, mesh)
    return jax.value_and_grad(sharded)


def ShardedHessianOperator(
    loss_fn: Callable[[Any, Any], jax.Array],
    params: Any,
    batch: Any,
    mesh: Mesh,
    *,
    normalization: str = "mean",
    batch_size: Optional[int] = None,
    dataset_size: Optional[int] = None,
    remat: bool = False,
    flattener: Optional[Flattener] = None,
) -> LinearOperator:
    """Mesh-data-parallel Hessian operator on flat (P,) vectors.

    ``normalization`` refers to the GLOBAL batch, so results are
    bit-comparable with the single-device ``HessianOperator`` on the same
    gathered batch.
    """
    return HessianOperator(
        make_sharded_loss(loss_fn, mesh),
        params,
        batch,
        normalization=normalization,
        batch_size=batch_size,
        dataset_size=dataset_size,
        remat=remat,
        flattener=flattener,
    )
