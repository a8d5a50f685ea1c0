"""Matrix-free linear operators on flat ℝᴾ vectors.

The reference's operator layer is the ``CurvVecProduct`` closure family
(/root/reference/gpt2_hessian.py:102-127 and ~12 copies) plus the CoLA
``BatchedHessian`` (/root/reference/marc_pythia.py:101-118).  Here it is a
small protocol: an operator owns a jit-traceable ``matvec`` on flat f32
vectors, its dimension ``P``, and nothing else.  Krylov solvers consume the
``matvec`` directly — under ``jit`` every HVP inlines into one XLA program
(no per-iteration re-trace; SURVEY.md §7 hard part #4).

Timing/``init_vec`` injection from ``CurvVecProduct`` are NOT operator
concerns here: grad-seeding is an explicit ``v0`` argument to Lanczos, and
timing lives in ``obs.timing``.

Tunnel-safety: every operator's ``matvec`` is backed by ONE internally
jitted program whose params/batch are EXPLICIT jit arguments — a
host-driven solver (thick restart, host Lanczos, CG) calling ``matvec``
per iteration dispatches one cached program per call.  Re-wrapping an
operator matvec in ``jax.jit`` would trace through the closure and lower
the captured params as inline HLO constants, which this backend's remote
compiler cannot digest at 124M+ (CLAUDE.md); don't — it is already jitted.
Under an OUTER jit (fused Lanczos scan, bench.py) the inner jit inlines
into the caller's program as before.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp

from hessian_llm_vision_tpu.curvature.hvp import hvp_fn
from hessian_llm_vision_tpu.utils.flatten import Flattener
from hessian_llm_vision_tpu.utils import trees
from hessian_llm_vision_tpu.utils.programs import mark_program_backed


@dataclasses.dataclass
class LinearOperator:
    """A symmetric matrix-free operator: ``matvec: (P,) f32 -> (P,) f32``."""

    matvec: Callable[[jax.Array], jax.Array]
    dim: int

    def __call__(self, v: jax.Array) -> jax.Array:
        return self.matvec(v)

    def shifted(self, sigma: float) -> "LinearOperator":
        """A + sigma*I (the reference's ``cola.PSD(G + 1e-3 I)`` damping,
        /root/reference/colaexp.py:106).  The axpy runs as ONE cached
        program (`_shift_prog`), not two eager ops — a host-driven solver
        (CG, thick restart) calling this per iteration would otherwise pay
        a synchronous tunnel round trip per eager op."""
        base = self.matvec
        return LinearOperator(
            self._wrap(lambda v: _shift_prog(base(v), sigma, v)), self.dim
        )

    def scaled(self, alpha: float) -> "LinearOperator":
        base = self.matvec
        return LinearOperator(
            self._wrap(lambda v: _scale_prog(alpha, base(v))), self.dim
        )

    def _wrap(self, fn):
        # propagate the tunnel-safety marker: a wrapper around a
        # program-backed matvec must not be re-jitted either (the re-jit
        # would trace through to the captured params — module docstring)
        if getattr(self.matvec, "is_program_backed", False):
            mark_program_backed(fn)
        return fn


@jax.jit
def _shift_prog(av, sigma, v):
    # sigma arrives as a weak-typed scalar arg: one compile covers every
    # damping value (no per-sigma recompiles through the remote tunnel)
    return av + sigma * v


@jax.jit
def _scale_prog(alpha, av):
    return alpha * av


@jax.jit
def _dense_matvec(mat, v):
    return mat.astype(jnp.float32) @ v.astype(jnp.float32)


def MatrixOperator(mat: jax.Array) -> LinearOperator:
    """Dense symmetric matrix as an operator (test fixtures — the reference's
    First-Principles-Lanczos dense ``M=(A+Aᵀ)/2`` notebooks, SURVEY.md §4.1)."""
    return LinearOperator(
        mark_program_backed(lambda v: _dense_matvec(mat, v)), mat.shape[0]
    )


def HessianOperator(
    loss_fn: Callable[[Any, Any], jax.Array],
    params: Any,
    batch: Any,
    *,
    normalization: str = "mean",
    batch_size: int | None = None,
    dataset_size: int | None = None,
    remat: bool = False,
    precision: str | None = "high",
    flattener: Flattener | None = None,
) -> LinearOperator:
    """Single-batch Hessian of ``loss_fn`` at ``params``.

    Reference: ``hess_vec(vector, input_ids, model)`` closure per batch
    (/root/reference/gpt2_hessian.py:66-127).
    """
    fl = flattener or Flattener(params)
    _hvp = hvp_fn(
        loss_fn,
        normalization=normalization,
        batch_size=batch_size,
        dataset_size=dataset_size,
        remat=remat,
        precision=precision,
    )

    @jax.jit
    def _prog(v, params, batch):
        return fl.flatten(_hvp(params, batch, fl.unflatten(v)))

    return LinearOperator(
        mark_program_backed(lambda v: _prog(v, params, batch)), fl.size
    )


def DatasetHessianOperator(
    loss_fn: Callable[[Any, Any], jax.Array],
    params: Any,
    batches: Any,
    *,
    normalization: str = "dataset",
    batch_size: int | None = None,
    dataset_size: int | None = None,
    remat: bool = True,
    precision: str | None = "high",
    flattener: Flattener | None = None,
) -> LinearOperator:
    """Hessian of the whole dataset of stacked batches.

    ``batches`` is a pytree whose leaves have a leading ``num_batches`` axis
    (the TPU-native replacement for looping a DataLoader); accumulation runs as one
    ``lax.scan`` inside the jitted matvec, replacing the reference's Python
    loop with ``loss *= batch/N`` scaling
    (/root/reference/gpt2_savehessian.py:130-163, diego_pythia.py:92-123).

    Normalization semantics over the WHOLE dataset (identical to
    ``krylov.driver.dataset_spectrum_host``):

    * ``"dataset"`` / ``"mean"`` — Hessian of the dataset-mean loss;
    * ``"sum"``     — Hessian of the dataset-summed loss
                      (= dataset_size x mean).
    """
    fl = flattener or Flattener(params)
    num_batches = jax.tree_util.tree_leaves(batches)[0].shape[0]
    if batch_size is None:
        batch_size = jax.tree_util.tree_leaves(batches)[0].shape[1]
    if dataset_size is None:
        dataset_size = num_batches * batch_size
    _hvp = hvp_fn(
        loss_fn,
        normalization=normalization,
        batch_size=batch_size,
        dataset_size=dataset_size,
        remat=remat,
        precision=precision,
    )
    # per-batch contributions: "dataset" -> mean*(batch/N) sums to the
    # dataset mean; "mean" -> per-batch means must be averaged; "sum" ->
    # per-batch means*batch_size sum to the dataset-summed loss
    post_scale = 1.0 / num_batches if normalization == "mean" else 1.0

    @jax.jit
    def _prog(v, params, batches):
        vt = fl.unflatten(v)

        def body(acc, batch):
            out = _hvp(params, batch, vt)
            return jax.tree_util.tree_map(jnp.add, acc, out), None

        zero = jax.tree_util.tree_map(jnp.zeros_like, params)
        acc, _ = jax.lax.scan(body, zero, batches)
        return fl.flatten(acc) * post_scale

    return LinearOperator(
        mark_program_backed(lambda v: _prog(v, params, batches)), fl.size
    )


def LayerHessianOperator(
    loss_fn: Callable[[Any, Any], jax.Array],
    params: Any,
    batch: Any,
    mask: Any,
    *,
    normalization: str = "mean",
    batch_size: int | None = None,
    dataset_size: int | None = None,
    flattener: Flattener | None = None,
) -> LinearOperator:
    """Diagonal-block Hessian restricted to the masked parameter subtree:
    ``v -> M H (M v)`` with M the subtree projector.

    Reference: single-parameter ``hess_vec(…, layer_idx, …)``
    (/root/reference/lanczostrain_layer_hand.py:74-91); the mask generalizes
    ``layer_idx`` to arbitrary subtrees (a whole transformer block, all
    LayerNorms, …) via ``utils.trees.subtree_mask``.
    """
    fl = flattener or Flattener(params)
    _hvp = hvp_fn(
        loss_fn,
        normalization=normalization,
        batch_size=batch_size,
        dataset_size=dataset_size,
    )

    @jax.jit
    def _prog(v, params, batch):
        # mask is a static pytree of Python bools — a jit constant, not data
        vt = trees.mask_tree(fl.unflatten(v), mask)
        out = trees.mask_tree(_hvp(params, batch, vt), mask)
        return fl.flatten(out)

    return LinearOperator(
        mark_program_backed(lambda v: _prog(v, params, batch)), fl.size
    )


def BlockDiagonalOperator(
    loss_fn: Callable[[Any, Any], jax.Array],
    params: Any,
    batch: Any,
    masks: Sequence[Any] | None = None,
    *,
    normalization: str = "mean",
    batch_size: int | None = None,
    dataset_size: int | None = None,
    flattener: Flattener | None = None,
) -> LinearOperator:
    """Full block-diagonal Hessian action: ``v -> Σᵢ Mᵢ H (Mᵢ v)``.

    With ``masks=None`` every parameter leaf is its own block — the
    reference's layer-by-layer Hessian
    (/root/reference/gpt2_savehessian_layer.py:130-178).  Cost is one HVP per
    block (as in the reference's per-param double backprop loop); all blocks
    trace into one XLA program under jit.
    """
    fl = flattener or Flattener(params)
    if masks is None:
        n_leaves = len(jax.tree_util.tree_leaves(params))
        masks = []
        for i in range(n_leaves):
            leaves = [j == i for j in range(n_leaves)]
            masks.append(
                jax.tree_util.tree_unflatten(
                    jax.tree_util.tree_structure(params), leaves
                )
            )
    _hvp = hvp_fn(
        loss_fn,
        normalization=normalization,
        batch_size=batch_size,
        dataset_size=dataset_size,
    )

    @jax.jit
    def _prog(v, params, batch):
        vt = fl.unflatten(v)
        acc = jax.tree_util.tree_map(jnp.zeros_like, params)
        for mask in masks:
            out = trees.mask_tree(
                _hvp(params, batch, trees.mask_tree(vt, mask)), mask
            )
            acc = jax.tree_util.tree_map(jnp.add, acc, out)
        return fl.flatten(acc)

    return LinearOperator(
        mark_program_backed(lambda v: _prog(v, params, batch)), fl.size
    )
