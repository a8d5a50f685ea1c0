"""Host-orchestrated LanczosSGD for program-size-limited backends.

Semantically identical to ``make_lanczos_sgd_step`` (grad-seeded Lanczos ->
rank-k spectral adjustment -> SGD+momentum), but decomposed into SMALL
jitted programs driven from host instead of one fused step:

* ``grad_program``      — value_and_grad of the loss (one fwd+bwd);
* ``hvp_program``       — one batch HVP (reused k times per refresh);
* ``adjust_update``     — rank-k adjustment + momentum + parameter update.

Why: at GPT-2-124M scale a single fused step (grad + k HVPs + eigh + update)
is a compiler-hostile program — this machine's remote TPU compiler refuses
anything much bigger than one 124M HVP — and the fused step also re-runs
Lanczos inside ``lax.cond`` branches.  The host split compiles each piece
once (~50 s each, cached), keeps every FLOP on device, and matches the
reference's own phase structure (gpt2_hessian_gpu.py:209-240: refresh
every k steps, frozen adjustment in between).

All params/batches are explicit jit arguments (closure constants bloat
remote compiles).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from hessian_llm_vision_tpu.curvature.hvp import hvp_fn
from hessian_llm_vision_tpu.krylov.lanczos import host_recurrence_step
from hessian_llm_vision_tpu.ops.spectral import spectral_adjust
from hessian_llm_vision_tpu.optim.lanczos_sgd import LanczosSGDConfig
from hessian_llm_vision_tpu.optim.manual import _lr_at
from hessian_llm_vision_tpu.utils.flatten import Flattener


@dataclasses.dataclass
class HostLanczosSGDState:
    """MUTABLE host-side state: ``step`` updates it in place so the stale
    (k, P) basis can actually be freed before a refresh allocates the new
    one — with an immutable tuple the caller's reference would pin
    gigabytes of dead HBM through the most memory-hungry phase."""

    params: Any
    momentum: Any
    step: int  # host int
    eigvals: jax.Array  # (k,)
    basis: Optional[jax.Array]  # (k, P) on device, None before 1st refresh


class HostLanczosSGDTrainer:
    """step(state, batch) driven from host; refreshes every
    ``config.refresh_every`` steps with host-driven grad-seeded Lanczos."""

    def __init__(
        self,
        loss_fn: Callable[[Any, Any], jax.Array],
        params_template: Any,
        config: LanczosSGDConfig,
        *,
        batch_size: Optional[int] = None,
        basis_dtype: jnp.dtype = jnp.float32,
    ):
        """``basis_dtype=jnp.bfloat16`` halves the stored (k, P) basis —
        needed at GPT-2-124M scale where k=10 f32 rows (5 GB) plus the HVP
        working set exceed one chip's HBM.  The Lanczos RECURRENCE stays
        f32; only the stored rows/Ritz basis are cast."""
        self.cfg = config
        self.basis_dtype = basis_dtype
        self.fl = Flattener(params_template)
        self.loss_fn = loss_fn
        _hvp = hvp_fn(
            loss_fn,
            normalization=config.normalization,
            batch_size=batch_size,
            remat=config.remat,
        )
        fl = self.fl

        @jax.jit
        def grad_program(params, batch):
            loss, grad = jax.value_and_grad(loss_fn)(params, batch)
            return loss, fl.flatten(grad)

        @jax.jit
        def hvp_program(v, params, batch):
            return fl.flatten(_hvp(params, batch, fl.unflatten(v)))

        cfg = config

        @jax.jit
        def adjust_update(params, momentum, g_flat, basis, eigvals, step):
            adj = spectral_adjust(g_flat, basis, eigvals, cfg.delta)
            adj_tree = fl.unflatten(adj)
            if cfg.weight_decay:
                adj_tree = jax.tree_util.tree_map(
                    lambda g, p: g + cfg.weight_decay * p, adj_tree, params
                )
            buf = jax.tree_util.tree_map(
                lambda b, g: cfg.momentum * b + g, momentum, adj_tree
            )
            lr_t = _lr_at(cfg.lr, step)
            new_params = jax.tree_util.tree_map(
                lambda p, b: p - lr_t * b, params, buf
            )
            return new_params, buf

        basis_dtype = self.basis_dtype

        @jax.jit
        def rotate(evecs, basis):
            # Ritz rotation S^T Q: inputs stay in basis_dtype (no 5 GB f32
            # materialization at 124M scale), f32 MXU accumulation
            return jnp.einsum(
                "ij,jp->ip",
                evecs.astype(basis.dtype),
                basis,
                preferred_element_type=jnp.float32,
            ).astype(basis_dtype)

        self._grad = grad_program
        self._hvp = hvp_program
        self._recurrence = host_recurrence_step
        self._adjust_update = adjust_update
        self._rotate = rotate

    def init(self, params) -> HostLanczosSGDState:
        # basis starts as None (step 0 always refreshes) — at 124M scale a
        # placeholder (k, P) buffer is 2.5-5 GB of dead HBM during the
        # first, most memory-hungry refresh
        return HostLanczosSGDState(
            params=params,
            momentum=jax.tree_util.tree_map(jnp.zeros_like, params),
            step=0,
            eigvals=jnp.ones((self.cfg.k,), jnp.float32),
            basis=None,
        )

    def refresh_spectrum(self, params, batch, g_flat):
        """Grad-seeded k-iteration Lanczos (host loop, device math).

        Three-term recurrence without reorthogonalization (the memory-light
        diego_pythia.py:157-192 style — at refresh depths k~10 the drift is
        negligible; the CPU parity test matches the fully-reorthogonalized
        fused step to 1e-3).  Rows stored in ``basis_dtype``.
        """
        k = self.cfg.k
        rows = []
        q_cur = g_flat / jnp.maximum(jnp.linalg.norm(g_flat), 1e-30)
        q_prev = jnp.zeros_like(q_cur)
        beta_prev = jnp.float32(0.0)
        alphas, betas = [], []
        for i in range(k):
            rows.append(q_cur.astype(self.basis_dtype))
            w = self._hvp(q_cur, params, batch)
            alpha, beta, q_next = self._recurrence(w, q_cur, q_prev, beta_prev)
            q_prev, q_cur, beta_prev = q_cur, q_next, beta
            alphas.append(float(alpha))
            betas.append(float(beta))
        del q_prev, q_cur, w
        basis = jnp.stack(rows)  # (k, P) in basis_dtype
        del rows
        a = np.asarray(alphas)
        b = np.asarray(betas)[:-1]
        T = np.diag(a) + np.diag(b, 1) + np.diag(b, -1)
        ev, evec = np.linalg.eigh(T)
        V = self._rotate(jnp.asarray(evec.T, jnp.float32), basis)
        return jnp.asarray(ev, jnp.float32), V

    def step(self, state: HostLanczosSGDState, batch):
        """Advance one step IN PLACE; returns (state, metrics)."""
        loss, g_flat = self._grad(state.params, batch)
        if state.step % self.cfg.refresh_every == 0 or state.basis is None:
            m = self.cfg.lanczos_momentum
            use_ema = m > 0 and state.step > 0 and state.basis is not None
            if not use_ema:
                state.basis = None  # free stale basis before the refresh
            new_ev, new_V = self.refresh_spectrum(state.params, batch, g_flat)
            if use_ema:
                state.eigvals = m * state.eigvals + (1 - m) * new_ev
                state.basis = (m * state.basis + (1 - m) * new_V).astype(
                    self.basis_dtype
                )
            else:
                state.eigvals, state.basis = new_ev, new_V
        new_params, buf = self._adjust_update(
            state.params, state.momentum, g_flat, state.basis, state.eigvals,
            jnp.asarray(state.step),
        )
        state.params = new_params
        state.momentum = buf
        state.step += 1
        metrics = {
            "loss": loss,
            "eig_max": state.eigvals[-1],
            "eig_min": state.eigvals[0],
        }
        return state, metrics
