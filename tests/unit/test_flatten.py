"""Flatten/unflatten round-trip tests (SURVEY.md §4 'implication': unit)."""

import jax
import jax.numpy as jnp
import numpy as np

from hessian_llm_vision_tpu.utils.flatten import Flattener, tree_size, make_flat_fn
from hessian_llm_vision_tpu.utils import trees


def _tree(key):
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "dense": {"kernel": jax.random.normal(k1, (4, 3)), "bias": jnp.zeros((3,))},
        "scale": jax.random.normal(k2, (5,), dtype=jnp.bfloat16),
        "out": jax.random.normal(k3, (3, 2)),
    }


def test_roundtrip(key):
    t = _tree(key)
    fl = Flattener(t)
    flat = fl.flatten(t)
    assert flat.shape == (tree_size(t),)
    assert flat.dtype == jnp.float32
    back = fl.unflatten(flat)
    for a, b in zip(jax.tree_util.tree_leaves(t), jax.tree_util.tree_leaves(back)):
        assert a.dtype == b.dtype
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32), rtol=1e-2
        )


def test_flatten_under_jit(key):
    t = _tree(key)
    fl = Flattener(t)

    @jax.jit
    def f(tree):
        return fl.flatten(tree) * 2.0

    np.testing.assert_allclose(np.asarray(f(t)), 2 * np.asarray(fl.flatten(t)), rtol=1e-5)


def test_make_flat_fn(key):
    t = _tree(key)
    double = make_flat_fn(lambda tr: jax.tree_util.tree_map(lambda x: 2 * x, tr), t)
    fl = Flattener(t)
    v = fl.flatten(t)
    np.testing.assert_allclose(np.asarray(double(v)), 2 * np.asarray(v), rtol=1e-2)


def test_tree_dot_matches_flat(key):
    t = _tree(key)
    fl = Flattener(t)
    d = trees.tree_dot(t, t)
    np.testing.assert_allclose(
        float(d), float(jnp.vdot(fl.flatten(t), fl.flatten(t))), rtol=1e-3
    )


def test_subtree_mask_and_spans(key):
    t = _tree(key)
    mask = trees.subtree_mask(t, lambda name: name.startswith("dense"))
    masked = trees.mask_tree(t, mask)
    assert float(jnp.abs(masked["out"]).sum()) == 0.0
    assert float(jnp.abs(masked["dense"]["kernel"]).sum()) > 0.0
    labels, spans = trees.partition_labels(t)
    assert len(labels) == len(spans) == len(jax.tree_util.tree_leaves(t))
    assert sum(s for _, s in spans) == tree_size(t)


def test_group_spans():
    """Per-block span merging (visual-eigen.ipynb cell-12 grouping)."""
    import pytest

    labels = [
        "params/h_0/attn/kernel", "params/h_0/mlp/kernel",
        "params/h_1/attn/kernel", "params/h_1/mlp/kernel",
        "params/wte",
    ]
    spans = [(0, 10), (10, 4), (14, 10), (24, 4), (28, 100)]
    glabels, gspans = trees.group_spans(labels, spans, trees.BLOCK_GROUP_REGEX)
    assert glabels == ["h_0", "h_1"]          # wte skipped, order preserved
    assert gspans == [(0, 14), (14, 14)]      # leaf spans merged per block
    # LLaMA/NeoX use layer_i (singular) path components
    gl2, _ = trees.group_spans(
        ["params/layer_0/mlp/kernel", "params/layer_1/mlp/kernel"],
        [(0, 4), (4, 4)], trees.BLOCK_GROUP_REGEX,
    )
    assert gl2 == ["layer_0", "layer_1"]
    # a regex that lumps non-adjacent subtrees into one group must raise
    with pytest.raises(ValueError, match="non-contiguous"):
        trees.group_spans(
            ["a/x", "b/y", "a/z"], [(0, 2), (2, 3), (5, 1)], r"^(a)/"
        )


def test_flattener_structural_equality(key):
    t = _tree(key)
    a, b = Flattener(t), Flattener(jax.tree_util.tree_map(lambda x: x + 1, t))
    assert a == b and hash(a) == hash(b)  # same structure, different values
    # different structure/dtype -> different
    c = Flattener({"only": jnp.zeros((3,))})
    assert a != c
    d = Flattener(t, flat_dtype=jnp.float64)
    assert a != d
    # usable as a cache key across fresh instances
    cache = {a: 1}
    assert cache[b] == 1
