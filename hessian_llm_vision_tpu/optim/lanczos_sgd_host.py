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
import functools
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
        refresh_batch_size: Optional[int] = None,
        refresh_precision: str = "high",
        refresh_linearized: bool = False,
    ):
        """``basis_dtype=jnp.bfloat16`` halves the stored (k, P) basis —
        needed at GPT-2-124M scale where k=10 f32 rows (5 GB) plus the HVP
        working set exceed one chip's HBM.  The Lanczos RECURRENCE stays
        f32; only the stored rows/Ritz basis are cast.

        ``refresh_batch_size``: run the refresh's Lanczos HVPs on only the
        first N sequences of the batch.  The 124M bs8/seq512 HVP working
        set is ~12 GB (measured by OOM bisection); during an EMA refresh
        the old basis + recurrence buffer leave too little headroom —
        halving the HVP batch halves the activation working set while the
        spectrum stays a same-expectation stochastic estimate (the
        reference's accumulation variant makes the same sub-batch
        approximation, accum.py:144-151).

        ``refresh_precision``: matmul precision for the refresh HVPs.
        "high" (bf16x3) keeps Ritz values within ~2e-5 of f32 — the
        parity-grade default.  "default" (one bf16 MXU pass) is measured
        1.68x faster on the 124M HVP with ~1e-3 relative error on the
        extreme Ritz values — acceptable for TRAINING refreshes, where the
        delta-damped adjustment tolerates %-level eigenvalue error, but not
        for reference-parity spectra.  Those error bars are INIT-scale
        measurements: bf16-tier error grows with the curvature scale (5.8×
        λmax inflation at a 2000-step Adam checkpoint,
        artifacts/trained124m_r3/) — when resuming a trained checkpoint,
        probe first (:func:`refresh_precision_probe` / the train CLI's
        ``--precision_check``).

        ``config.accum_steps > 1``: ``step`` expects batch leaves with a
        leading ``(accum, batch, ...)`` micro-batch axis and accumulates
        the MEAN gradient over micro-batches as a host loop over the one
        cached grad program (the fused path's lax.scan would multiply the
        program size past this backend's compile ceiling at 124M; the
        reference's accumulation is likewise a host loop, accum.py:144-151).
        Refresh HVPs run on the first micro-batch (further sliced by
        ``refresh_batch_size``) — the same stochastic sub-batch
        approximation as the refresh itself.

        ``refresh_linearized``: pay the refresh's primal forward+backward
        ONCE per refresh instead of once per HVP — params and the refresh
        batch are fixed across the k Lanczos iterations, so the tangent
        map alone (0.72x the HVP flops, measured) serves iterations 2..k
        (curvature/linearized.py).  Opt-in: the linearization residuals
        are ~2.65 GiB PER SEQUENCE at 124M/seq512, so combine with
        ``refresh_batch_size<=2`` at that scale (use
        ``curvature.residual_bytes`` to budget)."""
        self.cfg = config
        self.basis_dtype = basis_dtype
        self.refresh_batch_size = refresh_batch_size
        self.refresh_linearized = refresh_linearized
        self.fl = Flattener(params_template)
        self.loss_fn = loss_fn
        self._batch_size = batch_size
        #: optional optim.precision_guard.RefreshPrecisionGuard — probed
        #: at every refresh boundary; escalations land via set_refresh_tier
        self.precision_guard = None
        self._refresh_count = 0
        self._build_refresh_hvp(loss_fn, refresh_precision)
        fl = self.fl

        @jax.jit
        def grad_program(params, batch):
            loss, grad = jax.value_and_grad(loss_fn)(params, batch)
            return loss, fl.flatten(grad)

        cfg = config

        # NOTE: params/momentum are NOT donated — the initial params pytree
        # is caller-owned (donating it would invalidate aliased references,
        # e.g. a second trainer initialized from the same arrays)
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
            # Ritz rotation S^T Q: inputs stay in basis_dtype and the MXU
            # emits basis_dtype directly — materializing a f32 (k, P)
            # intermediate is a ~5 GB transient at 124M that tips the EMA
            # refresh over HBM; a k<=~100-term dot loses nothing real in
            # bf16 output.  NOT donated: a dot operand can never alias its
            # own output, so donating the buffer only produced the
            # "donated buffers were not usable" warning — peak here is
            # basis + V either way, and the caller's reference dies right
            # after this call.
            return jnp.einsum(
                "ij,jp->ip",
                evecs.astype(basis.dtype),
                basis,
                preferred_element_type=basis_dtype,
            )

        @functools.partial(jax.jit, donate_argnums=(0,))
        def set_row(buf, row, i):
            # in-place row write into the single (k, P) recurrence buffer —
            # a python list of k rows + jnp.stack doubles peak HBM at 124M
            return jax.lax.dynamic_update_slice(
                buf, row.astype(buf.dtype)[None], (i, 0)
            )

        inv_accum = 1.0 / max(config.accum_steps, 1)

        @functools.partial(jax.jit, donate_argnums=(0,))
        def acc_add(g_acc, g_new):
            # running mean accumulator: g_acc += g_new / accum (donated —
            # at 124M each flat grad is ~0.5 GB)
            return g_acc + inv_accum * g_new

        m = config.lanczos_momentum

        @functools.partial(jax.jit, donate_argnums=(0,))
        def ema_blend(old, new):
            # elementwise, fused — no f32 (k, P) materialization.  Only
            # ONE input can alias the single output, so only `old` is
            # donated (donating both produced the "donated buffers were
            # not usable" warning); `new` dies with the caller's
            # reference right after the call either way
            return (
                m * old.astype(jnp.float32) + (1.0 - m) * new.astype(jnp.float32)
            ).astype(basis_dtype)

        self._grad = grad_program
        self._recurrence = host_recurrence_step
        self._adjust_update = adjust_update
        self._rotate = rotate
        self._set_row = set_row
        self._ema_blend = ema_blend
        self._acc_add = acc_add

    def _build_refresh_hvp(self, loss_fn, precision: str) -> None:
        """(Re)build the refresh-HVP program for a precision tier.

        Called at construction and by :meth:`set_refresh_tier` when the
        precision guard escalates mid-training — jit is lazy, so an
        escalation costs one compile at the NEXT refresh (cached across
        escalation flaps by the jax compilation cache)."""
        fl = self.fl
        _hvp = hvp_fn(
            loss_fn,
            normalization=self.cfg.normalization,
            batch_size=self._batch_size,
            remat=self.cfg.remat,
            precision=precision,
        )

        @jax.jit
        def hvp_program(v, params, batch):
            return fl.flatten(_hvp(params, batch, fl.unflatten(v)))

        self._hvp = hvp_program
        self._resid = self._tangent = None
        if self.refresh_linearized:
            from hessian_llm_vision_tpu.curvature.linearized import (
                linearized_hvp_programs,
            )

            self._resid, self._tangent = linearized_hvp_programs(
                loss_fn, self.cfg.normalization, precision, fl,
                self._batch_size,
            )
        self.refresh_precision = precision
        #: the loss the refresh HVPs actually differentiate (may be a
        #: tier-rebuilt model; the GRAD step keeps the original loss)
        self.refresh_loss_fn = loss_fn

    def set_refresh_tier(self, tier) -> None:
        """Apply a precision-guard tier (optim.precision_guard.GuardTier)."""
        self._build_refresh_hvp(tier.loss_fn, tier.precision)

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
        # ONE preallocated (k, P) buffer, rows written in place (donated) —
        # a rows list + stack holds 2x the basis at the peak, which at
        # 124M + an EMA-retained old basis OOMs a 16 GB chip
        basis = jnp.zeros((k, g_flat.shape[0]), self.basis_dtype)
        q_cur = g_flat / jnp.maximum(jnp.linalg.norm(g_flat), 1e-30)
        q_prev = jnp.zeros_like(q_cur)
        beta_prev = jnp.float32(0.0)
        consts = None
        if self._tangent is not None:
            # linearized refresh: ONE primal fwd+bwd for all k iterations
            consts = self._resid(params, batch)
        alphas, betas = [], []
        for i in range(k):
            basis = self._set_row(basis, q_cur, jnp.asarray(i))
            if consts is not None:
                w = self._tangent(q_cur, consts, params, batch)
            else:
                w = self._hvp(q_cur, params, batch)
            alpha, beta, q_next = self._recurrence(w, q_cur, q_prev, beta_prev)
            q_prev, q_cur, beta_prev = q_cur, q_next, beta
            alphas.append(float(alpha))
            betas.append(float(beta))
        del q_prev, q_cur, w, consts
        a = np.asarray(alphas)
        b = np.asarray(betas)[:-1]
        T = np.diag(a) + np.diag(b, 1) + np.diag(b, -1)
        ev, evec = np.linalg.eigh(T)
        V = self._rotate(jnp.asarray(evec.T, jnp.float32), basis)
        return jnp.asarray(ev, jnp.float32), V

    def step(self, state: HostLanczosSGDState, batch):  # noqa: C901
        """Advance one step IN PLACE; returns (state, metrics).

        With ``config.accum_steps > 1``, ``batch`` leaves carry a leading
        micro-batch axis ``(accum, batch, ...)``.
        """
        accum = max(self.cfg.accum_steps, 1)
        if accum > 1:
            losses = []
            g_flat = None
            for i in range(accum):
                mb = jax.tree_util.tree_map(lambda x, i=i: x[i], batch)
                loss_i, g_i = self._grad(state.params, mb)
                losses.append(loss_i)
                g_flat = (
                    self._acc_add(g_flat, g_i) if g_flat is not None
                    else self._acc_add(jnp.zeros_like(g_i), g_i)
                )
            loss = jnp.mean(jnp.stack(losses))
            # refresh on the first micro-batch (sub-batch approximation)
            batch = jax.tree_util.tree_map(lambda x: x[0], batch)
        else:
            loss, g_flat = self._grad(state.params, batch)
        if state.step % self.cfg.refresh_every == 0 or state.basis is None:
            m = self.cfg.lanczos_momentum
            use_ema = m > 0 and state.step > 0 and state.basis is not None
            if not use_ema:
                state.basis = None  # free stale basis before the refresh
            rbatch = batch
            if self.refresh_batch_size is not None:
                rbatch = jax.tree_util.tree_map(
                    lambda x: x[: self.refresh_batch_size], batch
                )
            if self.precision_guard is not None:
                # pre-refresh drift check: λmax from the PREVIOUS refresh
                # is the sharpening signal (one scalar fetch per refresh —
                # negligible next to the k-HVP refresh itself).  NOTE
                # state.basis may already be freed above; eigvals survive
                # and are meaningful once any refresh has run
                self.precision_guard.maybe_recheck(
                    self, state.params, rbatch,
                    step=state.step, refresh_index=self._refresh_count,
                    eig_max=(
                        float(state.eigvals[-1])
                        if self._refresh_count > 0 else None
                    ),
                )
            self._refresh_count += 1
            new_ev, new_V = self.refresh_spectrum(state.params, rbatch, g_flat)
            if use_ema:
                state.eigvals = m * state.eigvals + (1 - m) * new_ev
                old = state.basis
                state.basis = None  # only the blend's donated refs remain
                state.basis = self._ema_blend(old, new_V)
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


@dataclasses.dataclass
class HostLayerwiseState:
    """Mutable host state for the layer-wise trainer: per-active-leaf
    eigvals + (k_i, size) Ritz bases (aligned with the trainer's active
    leaf list)."""

    params: Any
    momentum: Any
    step: int
    eigvals: list  # per active leaf, (k_i,) f32 or None before 1st refresh
    bases: list  # per active leaf, (k_i, size) in basis_dtype or None


class HostLayerwiseLanczosSGDTrainer:
    """Layer-wise (block-diagonal) LanczosSGD at LLM scale, host-driven.

    The reference runs one k-iteration Lanczos per parameter tensor every
    step (/root/reference/lanczostrain_layer_hand.py:117-208).  The fused
    jitted variant (optim.lanczos_sgd.make_layerwise_lanczos_sgd_step)
    inlines ~148 Lanczos runs into ONE XLA program — far beyond this
    backend's compile ceiling at 124M.  Here instead:

    * ONE masked-HVP program serves every leaf (mask from (start, size)
      scalars — krylov.driver._jitted_masked_batch_hvp);
    * the three-term recurrence runs on full-P vectors from host;
    * per-leaf Ritz bases are stored SLICED ((k_i, size), basis_dtype),
      totalling <= k x P elements across all leaves;
    * the frozen step applies every per-leaf rank-k adjustment in ONE
      jitted program whose slices are static (the partition is fixed).

    ``refresh_every`` amortizes the (num_leaves x k) HVPs of a refresh —
    the reference refreshed every step, which is also available.
    """

    def __init__(
        self,
        loss_fn: Callable[[Any, Any], jax.Array],
        params_template: Any,
        config: LanczosSGDConfig,
        *,
        batch_size: Optional[int] = None,
        basis_dtype: jnp.dtype = jnp.float32,
        min_leaf_size: int = 2,
        refresh_precision: str = "high",
    ):
        from hessian_llm_vision_tpu.krylov.driver import (
            _jitted_masked_batch_hvp,
        )
        from hessian_llm_vision_tpu.utils import trees

        self.cfg = config
        self.basis_dtype = basis_dtype
        self.loss_fn = loss_fn
        self.fl = Flattener(params_template)
        fl = self.fl
        cfg = config

        if cfg.normalization == "sum":
            if batch_size is None:
                raise ValueError('normalization="sum" requires batch_size')
            self._hvp_scale = float(batch_size)
        else:
            self._hvp_scale = 1.0
        self.precision_guard = None
        self._refresh_count = 0
        self._build_refresh_hvp(loss_fn, refresh_precision)

        labels, spans = trees.partition_labels(params_template)
        #: (label, offset, size, k_i) for every adjusted leaf
        self.active = [
            (label, off, size, min(cfg.k, size))
            for label, (off, size) in zip(labels, spans)
            if size >= min_leaf_size and min(cfg.k, size) >= 2
        ]

        @jax.jit
        def grad_program(params, batch):
            loss, grad = jax.value_and_grad(loss_fn)(params, batch)
            return loss, fl.flatten(grad)

        # shape-cached helpers (jit specializes per (k_i, size); the number
        # of UNIQUE leaf shapes is small — ~10 for GPT-2 124M)
        @functools.partial(jax.jit, static_argnames=("size",))
        def slice_vec(v, start, size: int):
            return jax.lax.dynamic_slice(v, (start,), (size,))

        @jax.jit
        def rotate_block(evecs, basis):
            return jnp.einsum(
                "ij,jp->ip", evecs.astype(basis.dtype), basis,
                preferred_element_type=jnp.float32,
            ).astype(basis.dtype)

        active = self.active
        basis_dt = basis_dtype

        @jax.jit
        def layer_adjust_update(params, momentum, g_flat, bases, eigvals, step):
            from hessian_llm_vision_tpu.ops.spectral import spectral_adjust

            adj = g_flat
            for (label, off, size, k_i), V, ev in zip(active, bases, eigvals):
                g_l = jax.lax.slice(g_flat, (off,), (off + size,))
                a_l = spectral_adjust(g_l, V, ev, cfg.delta)
                adj = jax.lax.dynamic_update_slice(adj, a_l, (off,))
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

        self._grad = grad_program
        self._slice = slice_vec
        self._rotate_block = rotate_block
        self._adjust_update = layer_adjust_update
        self._recurrence = host_recurrence_step

    def _build_refresh_hvp(self, loss_fn, precision: str) -> None:
        """(Re)build the masked refresh-HVP program for a precision tier."""
        from hessian_llm_vision_tpu.krylov.driver import (
            _jitted_masked_batch_hvp,
        )

        self._mhvp = _jitted_masked_batch_hvp(loss_fn, "mean", precision, self.fl)
        self.refresh_precision = precision
        self.refresh_loss_fn = loss_fn

    def set_refresh_tier(self, tier) -> None:
        """Apply a precision-guard tier (optim.precision_guard.GuardTier)."""
        self._build_refresh_hvp(tier.loss_fn, tier.precision)

    def init(self, params) -> HostLayerwiseState:
        n = len(self.active)
        return HostLayerwiseState(
            params=params,
            momentum=jax.tree_util.tree_map(jnp.zeros_like, params),
            step=0,
            eigvals=[None] * n,
            bases=[None] * n,
        )

    def refresh_leaf(self, params, batch, g_flat, off: int, size: int, k_i: int):
        """Grad-seeded k_i-iteration Lanczos of one diagonal block."""
        P = self.fl.size
        idx_start, idx_size = jnp.int32(off), jnp.int32(size)
        q_cur = self._slice(g_flat, jnp.int32(off), size)
        # expand back to full-P via a zero-padded buffer for the masked HVP
        norm = jnp.maximum(jnp.linalg.norm(q_cur), 1e-30)
        full = jnp.zeros((P,), jnp.float32)
        q_cur = jax.lax.dynamic_update_slice(full, q_cur / norm, (jnp.int32(off),))
        q_prev = jnp.zeros_like(q_cur)
        beta_prev = jnp.float32(0.0)
        rows, alphas, betas = [], [], []
        for _ in range(k_i):
            rows.append(self._slice(q_cur, jnp.int32(off), size).astype(self.basis_dtype))
            w = self._mhvp(q_cur, idx_start, idx_size, params, batch)
            if self._hvp_scale != 1.0:
                w = w * self._hvp_scale
            alpha, beta, q_next = self._recurrence(w, q_cur, q_prev, beta_prev)
            q_prev, q_cur, beta_prev = q_cur, q_next, beta
            alphas.append(float(alpha))
            betas.append(float(beta))
        a = np.asarray(alphas)
        b = np.asarray(betas)[:-1]
        T = np.diag(a) + np.diag(b, 1) + np.diag(b, -1)
        ev, evec = np.linalg.eigh(T)
        V = self._rotate_block(jnp.asarray(evec.T, jnp.float32), jnp.stack(rows))
        return jnp.asarray(ev, jnp.float32), V

    def step(self, state: HostLayerwiseState, batch):
        """Advance one step IN PLACE; returns (state, metrics)."""
        loss, g_flat = self._grad(state.params, batch)
        if state.step % self.cfg.refresh_every == 0 or state.bases[0] is None:
            m = self.cfg.lanczos_momentum
            use_ema = m > 0 and state.step > 0 and state.bases[0] is not None
            if self.precision_guard is not None:
                self.precision_guard.maybe_recheck(
                    self, state.params, batch,
                    step=state.step, refresh_index=self._refresh_count,
                    eig_max=(
                        max(float(e[-1]) for e in state.eigvals)
                        if state.bases[0] is not None else None
                    ),
                )
            self._refresh_count += 1
            for i, (label, off, size, k_i) in enumerate(self.active):
                ev, V = self.refresh_leaf(
                    state.params, batch, g_flat, off, size, k_i
                )
                if use_ema:
                    state.eigvals[i] = m * state.eigvals[i] + (1 - m) * ev
                    state.bases[i] = (
                        m * state.bases[i].astype(jnp.float32)
                        + (1 - m) * V.astype(jnp.float32)
                    ).astype(self.basis_dtype)
                else:
                    state.eigvals[i], state.bases[i] = ev, V
        new_params, buf = self._adjust_update(
            state.params, state.momentum, g_flat,
            tuple(state.bases), tuple(state.eigvals), jnp.asarray(state.step),
        )
        state.params = new_params
        state.momentum = buf
        state.step += 1
        eig_max = jnp.stack([e[-1] for e in state.eigvals])
        eig_min = jnp.stack([e[0] for e in state.eigvals])
        metrics = {
            "loss": loss,
            "layer_eig_max": eig_max,
            "layer_eig_min": eig_min,
        }
        return state, metrics


def refresh_precision_probe(
    trainer, params: Any, batch: Any, *,
    key: Optional[jax.Array] = None, ritz_iters: int = 10,
    referee_loss_fn: Optional[Callable[[Any, Any], jax.Array]] = None,
) -> dict:
    """Measure the trainer's ``refresh_precision`` HVP fidelity at THESE
    params against an f32 referee (one batch, ~2×``ritz_iters`` HVPs).

    Low-precision refresh error is CHECKPOINT-dependent: the landscape
    sharpens through training (λmax 4.96 → 3.7e5 over 2000 Adam steps at
    124M, artifacts/trained124m_r3/), so a ``refresh_precision`` that was
    parity-grade at init can silently corrupt the Ritz pairs the adjusted
    step relies on after resuming a trained checkpoint.  Call this at
    resume time (the ``train --precision_check`` flag does) and gate on
    ``ritz_rel_err`` — see ``krylov.matvec_precision_probe`` for why the
    extreme-Ritz error, not the raw matvec error, is the right gate.

    Works for both :class:`HostLanczosSGDTrainer` and
    :class:`HostLayerwiseLanczosSGDTrainer` (the probe runs the FULL
    Hessian; per-leaf refresh fidelity is bounded by it since the masked
    HVP is the same program with a restriction).

    ``referee_loss_fn``: REQUIRED when the low precision is baked into the
    model itself (``--refresh_precision mixed`` / a model built with
    ``block_matmul_precision``): the model's inner
    ``jax.default_matmul_precision`` context overrides the referee's outer
    'highest', so without a clean-model loss BOTH arms run bf16 blocks and
    the probe falsely passes on exactly the mode it exists to catch.  The
    train CLI rebuilds the model with ``block_matmul_precision=None`` for
    this argument (mirroring spectrum ``--precision_check``).
    """
    from hessian_llm_vision_tpu.krylov.driver import matvec_precision_probe

    if key is None:
        key = jax.random.PRNGKey(0)
    return matvec_precision_probe(
        # the refresh loss may be a precision-guard tier rebuild; probe
        # what the refresh HVPs actually differentiate
        getattr(trainer, "refresh_loss_fn", trainer.loss_fn),
        params, batch, key=key,
        precision=trainer.refresh_precision, flattener=trainer.fl,
        ritz_iters=ritz_iters, referee_loss_fn=referee_loss_fn,
    )
