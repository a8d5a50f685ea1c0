"""Hand-written first-order optimizers as optax GradientTransformations.

The reference writes its optimizers by hand with per-param buffer dicts —
manual SGD+momentum+wd with linear-decay LR (/root/reference/
train_savespec.py:196-234), fully bias-corrected manual Adam under gradient
accumulation (gpt2_adam_raw.py:88-137), and a raw ``p -= lr*g`` timing
baseline (gpt2_sgdraw.py:133-150).  Here they are explicit optax transforms
(buffers live in the transform state — one jitted update, donated buffers),
kept separate from optax's own aliases so the update rules are visibly the
reference's (torch conventions: momentum buffer folds in weight decay;
update = buf, not Nesterov)."""

from __future__ import annotations

from typing import Callable, NamedTuple, Union

import jax
import jax.numpy as jnp
import optax

ScheduleOrFloat = Union[float, Callable[[jax.Array], jax.Array]]


def _lr_at(lr: ScheduleOrFloat, step: jax.Array) -> jax.Array:
    return lr(step) if callable(lr) else jnp.asarray(lr, jnp.float32)


class SGDState(NamedTuple):
    step: jax.Array
    momentum: optax.Updates


def sgd_momentum(
    lr: ScheduleOrFloat, momentum: float = 0.9, weight_decay: float = 0.0
) -> optax.GradientTransformation:
    """torch-convention SGD: ``buf = μ·buf + (g + wd·p); p -= lr·buf``."""

    def init(params):
        return SGDState(
            step=jnp.zeros((), jnp.int32),
            momentum=jax.tree_util.tree_map(jnp.zeros_like, params),
        )

    def update(grads, state, params=None):
        if weight_decay and params is None:
            raise ValueError("weight_decay requires params")
        g = grads
        if weight_decay:
            g = jax.tree_util.tree_map(
                lambda gi, pi: gi + weight_decay * pi, g, params
            )
        buf = jax.tree_util.tree_map(
            lambda b, gi: momentum * b + gi, state.momentum, g
        )
        lr_t = _lr_at(lr, state.step)
        updates = jax.tree_util.tree_map(lambda b: -lr_t * b, buf)
        return updates, SGDState(step=state.step + 1, momentum=buf)

    return optax.GradientTransformation(init, update)


class AdamState(NamedTuple):
    step: jax.Array
    m: optax.Updates
    v: optax.Updates


def manual_adam(
    lr: ScheduleOrFloat,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
) -> optax.GradientTransformation:
    """Bias-corrected Adam exactly as the reference's raw loop
    (gpt2_adam_raw.py:113-137)."""

    def init(params):
        # m and v must be DISTINCT buffers — sharing one zeros tree makes
        # donated-state jit fail with "donate the same buffer twice"
        return AdamState(
            step=jnp.zeros((), jnp.int32),
            m=jax.tree_util.tree_map(jnp.zeros_like, params),
            v=jax.tree_util.tree_map(jnp.zeros_like, params),
        )

    def update(grads, state, params=None):
        t = state.step + 1
        m = jax.tree_util.tree_map(
            lambda mi, gi: b1 * mi + (1 - b1) * gi, state.m, grads
        )
        v = jax.tree_util.tree_map(
            lambda vi, gi: b2 * vi + (1 - b2) * gi * gi, state.v, grads
        )
        mhat_scale = 1.0 / (1 - b1 ** t.astype(jnp.float32))
        vhat_scale = 1.0 / (1 - b2 ** t.astype(jnp.float32))
        lr_t = _lr_at(lr, state.step)
        updates = jax.tree_util.tree_map(
            lambda mi, vi: -lr_t
            * (mi * mhat_scale)
            / (jnp.sqrt(vi * vhat_scale) + eps),
            m,
            v,
        )
        return updates, AdamState(step=t, m=m, v=v)

    return optax.GradientTransformation(init, update)


def raw_sgd(lr: ScheduleOrFloat) -> optax.GradientTransformation:
    """Plain ``p -= lr·g`` (the reference's timing baseline)."""

    def init(params):
        return SGDState(
            step=jnp.zeros((), jnp.int32), momentum=optax.EmptyState()
        )

    def update(grads, state, params=None):
        lr_t = _lr_at(lr, state.step)
        updates = jax.tree_util.tree_map(lambda g: -lr_t * g, grads)
        return updates, SGDState(step=state.step + 1, momentum=state.momentum)

    return optax.GradientTransformation(init, update)
