"""Small pytree linear-algebra helpers and parameter-subtree selection.

Subtree masks drive the layer-restricted / block-diagonal Hessian operators
(reference: lanczostrain_layer_hand.py:74-91, gpt2_savehessian_layer.py:130-178),
replacing the reference's ``layer_idx`` integer indexing into
``model.parameters()`` with path-predicate masks over the parameter pytree.
"""

from __future__ import annotations

from typing import Any, Callable, List, Tuple

import jax
import jax.numpy as jnp


def param_labels(tree: Any) -> List[str]:
    """Stable '/'-joined path names for every leaf, in flatten order."""
    paths = jax.tree_util.tree_flatten_with_path(tree)[0]
    return ["/".join(_key_str(k) for k in path) for path, _ in paths]


def _key_str(k) -> str:
    if hasattr(k, "key"):
        return str(k.key)
    if hasattr(k, "idx"):
        return str(k.idx)
    if hasattr(k, "name"):
        return str(k.name)
    return str(k)


def subtree_mask(tree: Any, predicate: Callable[[str], bool]) -> Any:
    """Boolean pytree: True where the leaf's path name satisfies ``predicate``.

    ``predicate`` receives the '/'-joined path (e.g. ``"transformer/h_0/attn/kernel"``).
    """
    paths = jax.tree_util.tree_flatten_with_path(tree)
    leaves = [
        predicate("/".join(_key_str(k) for k in path)) for path, _ in paths[0]
    ]
    return jax.tree_util.tree_unflatten(paths[1], leaves)


def mask_tree(tree: Any, mask: Any) -> Any:
    """Zero out leaves where ``mask`` is False (block-restriction of a vector)."""
    return jax.tree_util.tree_map(
        lambda x, m: x if m else jnp.zeros_like(x), tree, mask
    )


def tree_dot(a: Any, b: Any) -> jax.Array:
    """<a, b> summed over all leaves, accumulated in f32."""
    leaves = jax.tree_util.tree_map(
        lambda x, y: jnp.vdot(x.astype(jnp.float32), y.astype(jnp.float32)), a, b
    )
    return jax.tree_util.tree_reduce(jnp.add, leaves)


def tree_norm(a: Any) -> jax.Array:
    return jnp.sqrt(tree_dot(a, a))


def tree_axpy(alpha, x: Any, y: Any) -> Any:
    """alpha * x + y, leafwise."""
    return jax.tree_util.tree_map(lambda xi, yi: alpha * xi + yi, x, y)


def tree_scale(alpha, x: Any) -> Any:
    return jax.tree_util.tree_map(lambda xi: alpha * xi, x)


def partition_labels(
    tree: Any,
) -> Tuple[List[str], List[Tuple[int, int]]]:
    """Labels plus (offset, size) flat-vector spans per leaf, in flatten order.

    Lets callers map a leaf (a "layer" in the reference's block-Hessian
    terminology) to its slice of the flat ℝᴾ vector.
    """
    import numpy as np

    labels = param_labels(tree)
    sizes = [int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(tree)]
    offsets = np.concatenate([[0], np.cumsum(sizes)])
    spans = [(int(o), int(s)) for o, s in zip(offsets[:-1], sizes)]
    return labels, spans


#: Matches one repeated-block path component (GPT-2 ``h_3``, LLaMA/NeoX
#: ``layer_0``, generically ``block(s)_i``/``layer(s)_i``) — the
#: "model.transformer.h[i]" grouping of the reference's per-block
#: eigenvalue sweep (ipynbs/visual-eigen.ipynb cell 12).
BLOCK_GROUP_REGEX = r"(?:^|/)((?:h|blocks?|layers?)_\d+)(?:/|$)"


def group_spans(
    labels: List[str],
    spans: List[Tuple[int, int]],
    regex: str,
) -> Tuple[List[str], List[Tuple[int, int]]]:
    """Merge per-leaf flat-vector spans into per-group contiguous spans.

    ``regex`` is searched against each leaf label; the group label is capture
    group 1 (or the whole match).  Leaves that do not match are dropped —
    mirroring the reference's block sweep, which iterates
    ``model.transformer.h`` only (skipping embeddings/head;
    ipynbs/visual-eigen.ipynb cell 12).  Because flatten order is depth-first,
    the leaves of one subtree are adjacent in ℝᴾ; a non-contiguous group
    (regex spanning unrelated subtrees) is an error.
    """
    import re

    pat = re.compile(regex)
    order: List[str] = []
    merged: dict = {}
    for label, (off, size) in zip(labels, spans):
        m = pat.search(label)
        if not m:
            continue
        g = m.group(1) if m.groups() else m.group(0)
        if g not in merged:
            order.append(g)
            merged[g] = (off, size)
        else:
            o0, s0 = merged[g]
            if o0 + s0 != off:
                raise ValueError(
                    f"group {g!r} is non-contiguous in flatten order "
                    f"(leaf {label!r} at offset {off}, group ends at {o0 + s0}); "
                    "a group must be one parameter subtree"
                )
            merged[g] = (o0, s0 + size)
    return order, [merged[g] for g in order]
