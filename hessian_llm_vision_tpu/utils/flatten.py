"""Pytree <-> flat-vector bridge.

The reference re-pastes offset-based flatten/unflatten into every script
(e.g. /root/reference/gpt2_hessian.py:68-75, marc_pythia.py:70-82,
spiral_exp.py:113-128).  Here it is a single jit-friendly ``Flattener``
built once from a parameter pytree.  All Krylov linear algebra in this
framework operates on flat ``(P,)`` vectors; curvature engines operate on
pytrees; the Flattener is the only place the two representations meet.

TPU note: the flat vector is the layout the Pallas spectral-adjust /
projection kernels and the sharded Krylov basis consume, so we keep it
contiguous f32 by default (Lanczos recurrences need f32 — SURVEY.md §7
"hard parts" #3) while the parameter pytree may be bf16.
"""

from __future__ import annotations

import functools
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np


def tree_size(tree: Any) -> int:
    """Total number of scalar entries in a pytree (the Hessian dimension P)."""
    return sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(tree))


class Flattener:
    """Bidirectional map between a parameter pytree and a flat ``(P,)`` vector.

    Unlike ``jax.flatten_util.ravel_pytree`` this is constructed once from an
    *abstract* template (shapes/dtypes only), so both directions are pure
    functions safe to close over inside ``jit``/``scan`` without retracing,
    and the flat dtype is controllable independently of the leaf dtypes.
    """

    def __init__(self, template: Any, flat_dtype: jnp.dtype = jnp.float32):
        leaves, treedef = jax.tree_util.tree_flatten(template)
        self._treedef = treedef
        self._shapes = [tuple(l.shape) for l in leaves]
        self._dtypes = [l.dtype for l in leaves]
        self._sizes = [int(np.prod(s)) for s in self._shapes]
        self._offsets = np.concatenate([[0], np.cumsum(self._sizes)])
        self.size = int(self._offsets[-1])
        self.flat_dtype = flat_dtype

    def flatten(self, tree: Any) -> jax.Array:
        """Pytree -> flat ``(P,)`` vector (cast to ``flat_dtype``)."""
        leaves = self._treedef.flatten_up_to(tree)
        return jnp.concatenate(
            [jnp.ravel(l).astype(self.flat_dtype) for l in leaves]
        )

    def unflatten(self, vec: jax.Array) -> Any:
        """Flat ``(P,)`` vector -> pytree with the template's shapes/dtypes."""
        leaves = []
        for off, size, shape, dtype in zip(
            self._offsets[:-1], self._sizes, self._shapes, self._dtypes
        ):
            leaves.append(
                jax.lax.dynamic_slice_in_dim(vec, int(off), size)
                .reshape(shape)
                .astype(dtype)
            )
        return jax.tree_util.tree_unflatten(self._treedef, leaves)

    # Structural equality/hash: two Flatteners built from templates with the
    # same treedef/shapes/dtypes are interchangeable pure functions, so
    # caches keyed on a Flattener (e.g. krylov.driver._jitted_batch_hvp)
    # hit across independently-constructed instances.
    def _signature(self):
        return (
            self._treedef,
            tuple(self._shapes),
            tuple(str(d) for d in self._dtypes),
            str(self.flat_dtype.__name__ if hasattr(self.flat_dtype, "__name__") else self.flat_dtype),
        )

    def __eq__(self, other) -> bool:
        return (
            isinstance(other, Flattener) and self._signature() == other._signature()
        )

    def __hash__(self) -> int:
        return hash(self._signature())

    def __repr__(self) -> str:  # pragma: no cover
        return f"Flattener(P={self.size}, leaves={len(self._sizes)})"


def make_flat_fn(
    fn: Callable[[Any], Any], template: Any, flat_dtype=jnp.float32
) -> Callable[[jax.Array], jax.Array]:
    """Lift a pytree->pytree function to a flat-vector->flat-vector function.

    Used e.g. to turn the pytree HVP into the flat matvec the Krylov layer
    consumes (the reference's ``CurvVecProduct`` role,
    /root/reference/gpt2_hessian.py:102-127).
    """
    fl = Flattener(template, flat_dtype)

    def flat_fn(v: jax.Array) -> jax.Array:
        return fl.flatten(fn(fl.unflatten(v)))

    return flat_fn
