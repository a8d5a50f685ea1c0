"""Loss closures binding models to the curvature / training APIs.

Everything downstream (HVP engines, operators, optimizers, train loops)
consumes ``loss_fn(params, batch) -> scalar mean loss``.  These builders are
the only place model-specific calling conventions live.

Reference parity notes:
* The reference computes LM loss as ``model(input_ids, labels=input_ids)``
  (/root/reference/gpt2.py:57, gpt2_hessian.py:85-88) — HF shifts logits
  left vs labels and takes the mean over ALL target positions, INCLUDING
  pad tokens (no ``-100`` labels anywhere).  ``include_padding=True``
  reproduces that exactly; it is the mode to use when matching reference
  artifacts (losses, gradients, Hessian spectra).
* The default (``include_padding=False``) masks pad targets via
  ``attention_mask`` — a deliberate deviation that gives
  padding-independent losses; it differs from the reference beyond a
  constant rescale on padded data.
* Vision CE is ``nn.CrossEntropyLoss`` (train_savespec.py).
* BN-mode control: ``bn_train_mode=True`` evaluates BatchNorm with batch
  statistics inside the HVP (the reference's ``_bn_train_mode`` hack,
  train_savespec.py:57-72); running-average mode is the default eval path.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp


def softmax_cross_entropy(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """Mean CE over the batch, integer labels."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32))
    return -jnp.mean(
        jnp.take_along_axis(logp, labels[:, None], axis=-1).squeeze(-1)
    )


def causal_lm_loss(
    logits: jax.Array,
    input_ids: jax.Array,
    attention_mask: Optional[jax.Array] = None,
    *,
    include_padding: bool = False,
) -> jax.Array:
    """Shifted next-token CE.

    ``include_padding=False`` (default): mean over unmasked target
    positions.  ``include_padding=True``: mean over ALL B*(T-1) target
    positions — the reference / HF ``labels=input_ids`` convention
    (/root/reference/gpt2_hessian.py:85-88); use it when reproducing
    reference losses/spectra on padded data.
    """
    logits = logits[:, :-1].astype(jnp.float32)
    targets = input_ids[:, 1:]
    logp = jax.nn.log_softmax(logits)
    token_ll = jnp.take_along_axis(logp, targets[..., None], axis=-1).squeeze(-1)
    if attention_mask is not None and not include_padding:
        mask = attention_mask[:, 1:].astype(jnp.float32)
        return -(token_ll * mask).sum() / jnp.maximum(mask.sum(), 1.0)
    return -token_ll.mean()


def _head_precision_arg(head_precision: Optional[str]):
    """Map the head-precision knob to a ``lax.dot_general`` precision.

    TPU MXU pass counts: "high" splits BOTH operands into hi/lo bf16
    (3 passes: hi*hi + hi*lo + lo*hi); "act_high"/"weight_high" split ONE
    operand (2 passes) — a measured speed/accuracy point between the
    bf16x3 head of mixed mode and the 1-pass "default" (see bench.py
    mixed-mode notes and .logs/head_prec_r3.log).
    """
    if head_precision is None:
        return None  # inherit the caller's jax.default_matmul_precision
    P = jax.lax.Precision
    return {
        "default": P.DEFAULT,
        "high": P.HIGH,
        "highest": P.HIGHEST,
        "act_high": (P.HIGH, P.DEFAULT),
        "weight_high": (P.DEFAULT, P.HIGH),
    }[head_precision]


def chunked_causal_lm_loss(
    hidden: jax.Array,
    out_kernel: jax.Array,
    input_ids: jax.Array,
    attention_mask: Optional[jax.Array] = None,
    *,
    chunk: int = 128,
    include_padding: bool = False,
    remat: bool = True,
    unroll: bool = False,
    head_precision: Optional[str] = None,
) -> jax.Array:
    """Shifted next-token CE WITHOUT materializing the (B, T, V) logits.

    ``hidden``: final pre-logit states (B, T, C); ``out_kernel``: (C, V)
    with ``logits = hidden @ out_kernel`` (``model.output_kernel(params)``).
    A ``lax.scan`` over sequence chunks computes each (B, chunk, V) logit
    tile, reduces it to a CE partial sum, and (with ``remat``, default)
    discards it — so under grad / jvp-of-grad only ``hidden`` is a
    residual.  At GPT-2 124M bs16/seq512 this removes the ~1.6 GB f32
    logits (plus their log_softmax and tangent copies) from the HVP
    working set.  Numerically identical to :func:`causal_lm_loss` on the
    dense logits (parity-tested <=1e-5, tests/unit/test_blockwise.py).
    """
    B, T, C = hidden.shape
    h = hidden[:, :-1].astype(jnp.float32)
    targets = input_ids[:, 1:]
    if attention_mask is not None and not include_padding:
        w = attention_mask[:, 1:].astype(jnp.float32)
    else:
        w = jnp.ones((B, T - 1), jnp.float32)
    n = T - 1
    chunk = min(chunk, n)
    pad = (-n) % chunk
    if pad:
        h = jnp.pad(h, ((0, 0), (0, pad), (0, 0)))
        targets = jnp.pad(targets, ((0, 0), (0, pad)))
        w = jnp.pad(w, ((0, 0), (0, pad)))
    nb = (n + pad) // chunk
    hb = h.reshape(B, nb, chunk, C).transpose(1, 0, 2, 3)
    tb = targets.reshape(B, nb, chunk).transpose(1, 0, 2)
    wb = w.reshape(B, nb, chunk).transpose(1, 0, 2)
    wk = out_kernel.astype(jnp.float32)

    # per-chunk partial sums as scan OUTPUTS (no scalar carry): a carried
    # scalar's vma type clashes with sharded inputs under shard_map
    # (the shard_map scan-vma rule); stacked outputs sidestep it.
    prec = _head_precision_arg(head_precision)

    def body(carry, inp):
        hc, tc, wc = inp
        logits = jnp.matmul(hc, wk, precision=prec)  # (B, chunk, V)
        logp = jax.nn.log_softmax(logits)
        ll = jnp.take_along_axis(logp, tc[..., None], axis=-1).squeeze(-1)
        return carry, (ll * wc).sum()

    if remat:
        body = jax.checkpoint(body)
    _, partials = jax.lax.scan(body, None, (hb, tb, wb), unroll=nb if unroll else 1)
    return -partials.sum() / jnp.maximum(w.sum(), 1.0)


def lm_loss_fn(
    model,
    *,
    include_padding: bool = False,
    loss_chunk: Optional[int] = None,
    loss_chunk_unroll: bool = False,
    head_precision: Optional[str] = None,
) -> Callable[[Any, Any], jax.Array]:
    """LM loss closure for GPT2LMHead / NeoXLMHead / LlamaLMHead.

    ``batch`` is a dict with ``input_ids`` (B, T) and optional
    ``attention_mask``.  ``include_padding=True`` -> reference/HF
    ``labels=input_ids`` convention (loss over pad positions too).
    ``loss_chunk``: compute the vocab projection + CE in sequence chunks
    of this size via :func:`chunked_causal_lm_loss` (the memory-light
    curvature configuration); ``None`` = dense logits.
    ``head_precision``: per-operand MXU precision for the vocab-head
    matmul (chunked path only; see :func:`_head_precision_arg`) —
    "act_high"/"weight_high" are the 2-pass points between mixed mode's
    bf16x3 head and the 1-pass "default".
    """

    def loss(params, batch):
        logits = model.apply({"params": params}, batch["input_ids"])
        return causal_lm_loss(
            logits,
            batch["input_ids"],
            batch.get("attention_mask"),
            include_padding=include_padding,
        )

    def loss_chunked(params, batch):
        hidden = model.apply(
            {"params": params}, batch["input_ids"], return_hidden=True
        )
        return chunked_causal_lm_loss(
            hidden,
            model.output_kernel(params),
            batch["input_ids"],
            batch.get("attention_mask"),
            chunk=loss_chunk,
            include_padding=include_padding,
            unroll=loss_chunk_unroll,
            head_precision=head_precision,
        )

    return loss_chunked if loss_chunk else loss


def classification_loss_fn(
    model, *, has_batch_stats: bool = False, bn_train_mode: bool = False
) -> Callable[[Any, Any], jax.Array]:
    """Vision CE closure.  ``batch = (images, labels)`` or dict.

    For BN models, ``params`` is the full variables dict minus batch_stats;
    the closure threads batch_stats as a constant captured at build time via
    ``bind_batch_stats`` below — use :func:`classification_loss_fn_bn` when
    batch_stats matter.
    """

    def loss(params, batch):
        x, y = (batch["image"], batch["label"]) if isinstance(batch, dict) else batch
        logits = model.apply({"params": params}, x)
        return softmax_cross_entropy(logits, y)

    return loss


def classification_loss_fn_bn(
    model, batch_stats: Any, *, bn_train_mode: bool = False
) -> Callable[[Any, Any], jax.Array]:
    """CE closure for BatchNorm models (ResNet).

    ``bn_train_mode=True`` -> BN uses the batch's own statistics during the
    forward (the reference's HVP convention: eval model, BN in train mode —
    train_savespec.py:70-72).  ``False`` -> frozen running averages.
    Either way batch_stats are *not* differentiated — they are captured
    constants, matching torch where BN buffers are not parameters.
    """

    def loss(params, batch):
        x, y = (batch["image"], batch["label"]) if isinstance(batch, dict) else batch
        variables = {"params": params, "batch_stats": batch_stats}
        if bn_train_mode:
            logits, _ = model.apply(
                variables, x, use_running_average=False, mutable=["batch_stats"]
            )
        else:
            logits = model.apply(variables, x, use_running_average=True)
        return softmax_cross_entropy(logits, y)

    return loss


def per_example_lm_losses(model, params, batch) -> jax.Array:
    """No-grad per-sequence LM losses — the reference's loss-per-batch
    evaluator (/root/reference/loss-llama.ipynb cells 6-8)."""
    logits = model.apply({"params": params}, batch["input_ids"])
    logits = logits[:, :-1].astype(jnp.float32)
    targets = batch["input_ids"][:, 1:]
    logp = jax.nn.log_softmax(logits)
    token_ll = jnp.take_along_axis(logp, targets[..., None], axis=-1).squeeze(-1)
    mask = batch.get("attention_mask")
    if mask is not None:
        m = mask[:, 1:].astype(jnp.float32)
        return -(token_ll * m).sum(-1) / jnp.maximum(m.sum(-1), 1.0)
    return -token_ll.mean(-1)
