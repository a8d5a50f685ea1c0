"""Hessian-vector products, TPU-native.

The reference computes HVPs by Pearlmutter double backprop: a first backward
with ``create_graph=True`` then a backward of ``g.v``
(/root/reference/gpt2_hessian.py:66-98, gpt2_calchessian.py:32-47,
train_savespec.py:61-91 — ~15 near-identical copies).  Here there is ONE
engine: forward-over-reverse ``jax.jvp(jax.grad(loss))``, which XLA compiles
into a single fused program (two fwd+bwd passes' worth of FLOPs, no Python in
the loop, no graph retention).  It is pytree->pytree; the Krylov layer lifts
it to flat vectors via :class:`~hessian_llm_vision_tpu.utils.flatten.Flattener`.

Loss-normalization semantics (SURVEY.md §7 hard part #2): the reference uses
three inconsistent conventions which rescale the spectrum by constant factors:

* ``"mean"``        — plain batch-mean loss (gpt2_hessian_cpu.py:96-99).
* ``"sum"``         — mean loss * batch_size, i.e. summed loss
                      (``loss *= len(input_ids)``, gpt2_hessian.py:88).
* ``"dataset"``     — accumulated over a loader with ``loss *= batch/N``
                      (gpt2_savehessian.py:154) => dataset-mean Hessian.

They are an explicit parameter here; each reference artifact family documents
which convention produced it (eigeninfo/* used "dataset").
"""

from __future__ import annotations

import enum
from typing import Any, Callable

import jax


class Normalization(str, enum.Enum):
    MEAN = "mean"
    SUM = "sum"
    DATASET = "dataset"


def _scaled_loss_fn(
    loss_fn: Callable,
    batch: Any,
    normalization: str,
    batch_size: int | None,
    dataset_size: int | None,
):
    """Wrap a mean-reduction loss into the requested normalization."""
    norm = Normalization(normalization)
    if norm is Normalization.SUM and batch_size is None:
        raise ValueError('normalization="sum" requires batch_size')
    if norm is Normalization.DATASET and (batch_size is None or dataset_size is None):
        raise ValueError('normalization="dataset" requires batch_size and dataset_size')

    def scaled(params):
        loss = loss_fn(params, batch)
        if norm is Normalization.SUM:
            return loss * batch_size
        if norm is Normalization.DATASET:
            return loss * (batch_size / dataset_size)
        return loss

    return scaled


def hvp(
    loss_fn: Callable[[Any, Any], jax.Array],
    params: Any,
    batch: Any,
    vector: Any,
    *,
    normalization: str = "mean",
    batch_size: int | None = None,
    dataset_size: int | None = None,
    precision: str | None = "high",
) -> Any:
    """H(params) @ vector for the given batch, forward-over-reverse.

    ``loss_fn(params, batch) -> scalar mean loss``.  ``vector`` is a pytree
    matching ``params``.  Returns a pytree matching ``params``.
    """
    return hvp_fn(
        loss_fn,
        normalization=normalization,
        batch_size=batch_size,
        dataset_size=dataset_size,
        precision=precision,
    )(params, batch, vector)


def hvp_fn(
    loss_fn: Callable[[Any, Any], jax.Array],
    *,
    normalization: str = "mean",
    batch_size: int | None = None,
    dataset_size: int | None = None,
    remat: bool = False,
    precision: str | None = "high",
) -> Callable[[Any, Any, Any], Any]:
    """Build ``(params, batch, vector) -> H @ vector``.

    ``remat=True`` wraps the loss in ``jax.checkpoint`` — forward-over-reverse
    doubles activation memory (SURVEY.md §7 hard part #4), and rematerializing
    the forward trades FLOPs for HBM at LLM scale.

    ``precision`` pins the matmul precision under the HVP trace
    (SURVEY.md §7 hard part #3).  Measured on a real v5e with GPT-2 124M:
    TPU-default single-pass-bf16 breaks Hessian symmetry at ~1e-2 and
    shifts Ritz values by ~2e-3 (fails the 1e-3 parity bar); "high"
    (bf16x3) matches "highest" (f32, 6-pass) to 2e-5 at 1.57x the speed.
    Curvature therefore defaults to "high"; pass "highest" for maximum
    accuracy or ``None`` for the ambient precision.
    """

    def _hvp(params, batch, vector):
        fn = jax.checkpoint(loss_fn) if remat else loss_fn
        scaled = _scaled_loss_fn(fn, batch, normalization, batch_size, dataset_size)
        if precision is not None:
            with jax.default_matmul_precision(precision):
                return jax.jvp(jax.grad(scaled), (params,), (vector,))[1]
        return jax.jvp(jax.grad(scaled), (params,), (vector,))[1]

    return _hvp


def grad_and_loss(
    loss_fn: Callable[[Any, Any], jax.Array], params: Any, batch: Any
) -> tuple[jax.Array, Any]:
    """Convenience: (loss, grad) in one reverse pass."""
    loss, grad = jax.value_and_grad(loss_fn)(params, batch)
    return loss, grad
