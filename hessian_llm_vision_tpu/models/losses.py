"""Loss closures binding models to the curvature / training APIs.

Everything downstream (HVP engines, operators, optimizers, train loops)
consumes ``loss_fn(params, batch) -> scalar mean loss``.  These builders are
the only place model-specific calling conventions live.

Reference parity notes:
* LM loss is the HF convention — logits shifted left vs labels, mean over
  non-pad target tokens (``model(input_ids, labels=input_ids)``,
  /root/reference/gpt2.py:57, gpt2_hessian.py:131-132).
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
) -> jax.Array:
    """Shifted next-token CE, mean over unmasked target positions."""
    logits = logits[:, :-1].astype(jnp.float32)
    targets = input_ids[:, 1:]
    logp = jax.nn.log_softmax(logits)
    token_ll = jnp.take_along_axis(logp, targets[..., None], axis=-1).squeeze(-1)
    if attention_mask is not None:
        mask = attention_mask[:, 1:].astype(jnp.float32)
        return -(token_ll * mask).sum() / jnp.maximum(mask.sum(), 1.0)
    return -token_ll.mean()


def lm_loss_fn(model) -> Callable[[Any, Any], jax.Array]:
    """LM loss closure for GPT2LMHead / NeoXLMHead.

    ``batch`` is a dict with ``input_ids`` (B, T) and optional
    ``attention_mask``.
    """

    def loss(params, batch):
        logits = model.apply({"params": params}, batch["input_ids"])
        return causal_lm_loss(
            logits, batch["input_ids"], batch.get("attention_mask")
        )

    return loss


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
