"""Generic training loop.

The reference fuses epoch×batch loops ad hoc into every script
(/root/reference/train_lanczos.py:223-320, gpt2_hessian_cpu.py:183-263,
accum.py:138-234, gpt2_multigpu.py:103-115).  Here: ONE host loop driving a
jitted step.  Two step families plug in:

* optax-based first-order steps (``make_train_step``) — vanilla SGD/Adam
  baselines (gpt2_multigpu.py), with optional micro-batch accumulation;
* state-carrying spectrum-aware steps from ``optim.lanczos_sgd``.

The host loop only moves data and logs; every FLOP is inside the jitted
step (donated state — no buffer copies between steps).
"""

from __future__ import annotations

import time
from typing import Any, Callable, Dict, Iterable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax


class EpochResampledBatches:
    """Re-iterable batch source that redraws per epoch.

    ``train()`` calls ``iter(batches)`` once per epoch; this wrapper maps
    the n-th iteration to ``make_batches(n)`` — the hook for per-epoch
    stochastic augmentation (the reference applies torchvision transforms
    in the loader, so every epoch sees fresh crops/flips/noise,
    /root/reference/train_savespec.py:46-55).  ``transform`` (optional)
    post-processes each fresh list (e.g. micro-batch regrouping)."""

    def __init__(self, make_batches: Callable[[int], list],
                 transform: Optional[Callable[[list], list]] = None):
        self._make = make_batches
        self._transform = transform
        self._epoch = 0

    def __iter__(self):
        batches = self._make(self._epoch)
        if self._transform is not None:
            batches = self._transform(batches)
        self._epoch += 1
        return iter(batches)


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jax.Array


def make_train_step(
    loss_fn: Callable[[Any, Any], jax.Array],
    optimizer: optax.GradientTransformation,
    *,
    accum_steps: int = 1,
):
    """Standard optax step; ``accum_steps>1`` scans micro-batches
    (leading axis of the batch pytree) inside the jitted step
    (accum.py:138-234 semantics)."""

    def init_fn(params) -> TrainState:
        return TrainState(
            params=params,
            opt_state=optimizer.init(params),
            step=jnp.zeros((), jnp.int32),
        )

    def step_fn(state: TrainState, batch):
        if accum_steps == 1:
            loss, grads = jax.value_and_grad(loss_fn)(state.params, batch)
        else:

            def body(acc, micro):
                l, g = jax.value_and_grad(loss_fn)(state.params, micro)
                return (
                    acc[0] + l,
                    jax.tree_util.tree_map(jnp.add, acc[1], g),
                ), None

            zero = (
                jnp.zeros((), jnp.float32),
                jax.tree_util.tree_map(jnp.zeros_like, state.params),
            )
            (loss, grads), _ = jax.lax.scan(body, zero, batch)
            loss = loss / accum_steps
            grads = jax.tree_util.tree_map(lambda g: g / accum_steps, grads)
        updates, opt_state = optimizer.update(
            grads, state.opt_state, state.params
        )
        params = optax.apply_updates(state.params, updates)
        metrics = {
            "loss": loss,
            "grad_norm": optax.global_norm(grads),
        }
        return TrainState(params, opt_state, state.step + 1), metrics

    return init_fn, step_fn


def train(
    step_fn,
    state,
    batches: Iterable[Any],
    *,
    num_epochs: int = 1,
    max_steps: int = 0,
    log_every: int = 10,
    on_log: Optional[Callable[[int, Dict[str, float]], None]] = None,
    on_epoch_end: Optional[Callable[[int, Any], None]] = None,
    on_state: Optional[Callable[[int, Any, Any], None]] = None,
    on_state_every: int = 0,
    ema_decay: float = 0.99,
    donate: bool = True,
    jit: bool = True,
) -> Any:
    """Drive any ``step_fn(state, batch) -> (state, metrics)``.

    ``batches``: an iterable (re-iterable across epochs) of device-ready
    batches.  Tracks the reference's EMA loss (0.99 decay,
    gpt2_hessian_gpu.py:268-276) and per-step wall-clock.  Returns the
    final state.

    ``on_state(step, state, batch)`` fires every ``on_state_every`` steps
    (0 = never) with the LIVE state — the hook for interleaved diagnostics
    like spectrum snapshots (the train_lanczos.py purpose).  Note: with
    ``donate=True`` the hook must not retain ``state`` beyond the call.

    ``jit=False``: drive a HOST-ORCHESTRATED step (e.g.
    ``optim.lanczos_sgd_host``) that jits its own sub-programs — wrapping
    it again would trace host control flow.
    """
    jit_step = (
        jax.jit(step_fn, donate_argnums=(0,) if donate else ())
        if jit
        else step_fn
    )
    ema_loss = None
    global_step = 0
    last_logged = -1
    last = None
    # Per-step scalar fetches are SYNCHRONOUS host round-trips that stall
    # the dispatch pipeline (measured 1.8x on the whole run through a
    # high-latency device link).  Losses stay on device between log points;
    # the EMA drains them in one batched fetch every ``log_every`` steps.
    pending_losses = []
    t_interval = time.perf_counter()
    steps_in_interval = 0

    def _drain_ema():
        nonlocal ema_loss
        if not pending_losses:
            return
        vals = np.asarray(jnp.stack(pending_losses), np.float64).reshape(-1)
        pending_losses.clear()
        for v in vals:
            ema_loss = float(v) if ema_loss is None else (
                ema_decay * ema_loss + (1 - ema_decay) * float(v)
            )

    def emit(step, metrics):
        nonlocal t_interval, steps_in_interval
        _drain_ema()
        host = {}
        for k, v in metrics.items():
            a = np.asarray(v)
            if a.size == 0:
                host[k] = 0.0
            elif a.size == 1:
                host[k] = float(a.reshape(-1)[0])
            else:
                # vector metrics (e.g. per-layer eigvals) pass through whole
                # plus scalar min/max summaries for scalar-only loggers
                host[k] = a
                host[f"{k}_min"] = float(a.min())
                host[f"{k}_max"] = float(a.max())
        host["ema_loss"] = ema_loss
        # average over the interval: per-step wall-clock is meaningless
        # when dispatch is async
        now = time.perf_counter()
        host["step_time"] = (now - t_interval) / max(steps_in_interval, 1)
        t_interval, steps_in_interval = now, 0
        on_log(step, host)

    done = False
    for epoch in range(num_epochs):
        if done:
            break
        steps_this_epoch = 0
        for batch in batches:
            if max_steps and global_step >= max_steps:
                done = True
                break
            state, metrics = jit_step(state, batch)
            pending_losses.append(metrics["loss"])
            # without a logger the pending list would otherwise retain one
            # device scalar per step for the whole run — drain it so the
            # EMA stays correct with bounded live buffers
            if on_log is None and len(pending_losses) >= log_every:
                _drain_ema()
            steps_in_interval += 1
            last = (global_step, metrics)
            if (
                on_state is not None
                and on_state_every > 0
                and global_step % on_state_every == 0
            ):
                on_state(global_step, state, batch)
            if on_log is not None and global_step % log_every == 0:
                emit(global_step, metrics)
                last_logged = global_step
            global_step += 1
            steps_this_epoch += 1
        # max_steps can trip on an epoch's FIRST iteration: no phantom
        # epoch-end hook (duplicate checkpoint/eval) for zero executed steps
        if on_epoch_end is not None and steps_this_epoch > 0:
            on_epoch_end(epoch, state)
    # the final step always reaches the log (sweeps/HPO read the last loss)
    if on_log is not None and last is not None and last[0] != last_logged:
        emit(*last)
    else:
        _drain_ema()
    return state
