"""Data layer tests."""

import os

import numpy as np
import pytest

from hessian_llm_vision_tpu.data import (
    make_spirals,
    random_token_batches,
    random_image_batches,
    get_class_subset,
    add_gaussian_noise,
    augment_batch,
    collate_tokens,
    stack_batches,
    load_mnist,
)


def test_spirals():
    x, y = make_spirals(300, num_classes=3, seed=0)
    assert x.shape == (300, 2) and y.shape == (300,)
    assert set(np.unique(y)) == {0, 1, 2}
    x2, _ = make_spirals(300, num_classes=3, seed=0)
    np.testing.assert_array_equal(x, x2)  # seeded determinism


def test_random_tokens():
    b = random_token_batches(3, 4, 16, 100, seed=1, random_mask=True)
    assert b["input_ids"].shape == (3, 4, 16)
    assert b["attention_mask"].shape == (3, 4, 16)
    assert (b["attention_mask"][..., 0] == 1).all()  # first token visible
    assert b["input_ids"].max() < 100


def test_collate_and_stack():
    c = collate_tokens([[1, 2, 3], [4, 5], list(range(10))], max_length=8, pad_id=0)
    assert c["input_ids"].shape == (3, 8)
    np.testing.assert_array_equal(c["input_ids"][1], [4, 5, 0, 0, 0, 0, 0, 0])
    np.testing.assert_array_equal(c["attention_mask"][1], [1, 1, 0, 0, 0, 0, 0, 0])
    assert c["input_ids"][2, -1] == 7  # truncated to 8
    s = stack_batches({"input_ids": np.zeros((10, 8))}, batch_size=3)
    assert s["input_ids"].shape == (3, 3, 8)  # drop remainder


def test_class_subset():
    x = np.arange(20).reshape(10, 2).astype(np.float32)
    y = np.array([0, 1, 2, 3, 4, 0, 1, 2, 3, 4], np.int32)
    xs, ys = get_class_subset(x, y, [1, 3])
    assert len(xs) == 4
    assert set(np.unique(ys)) == {0, 1}  # remapped
    _, ys2 = get_class_subset(x, y, [1, 3], remap=False)
    assert set(np.unique(ys2)) == {1, 3}


def test_transforms():
    x = np.random.RandomState(0).rand(4, 32, 32, 3).astype(np.float32)
    noisy = add_gaussian_noise(x, 0.1, seed=1)
    assert noisy.shape == x.shape and not np.allclose(noisy, x)
    aug = augment_batch(x, seed=2)
    assert aug.shape == x.shape
    aug2 = augment_batch(x, seed=2)
    np.testing.assert_array_equal(aug, aug2)  # seeded


@pytest.mark.skipif(
    not os.path.exists("/root/reference/data/MNIST/raw"),
    reason="reference MNIST not mounted",
)
def test_mnist_loads():
    x, y = load_mnist("test")
    assert x.shape == (10000, 28, 28, 1)
    assert y.shape == (10000,)
    assert 0 <= y.min() and y.max() <= 9


def test_random_images():
    x, y = random_image_batches(2, 4, seed=0)
    assert x.shape == (2, 4, 32, 32, 3) and y.shape == (2, 4)


def test_local_corpus(tmp_path):
    from hessian_llm_vision_tpu.data import load_local_corpus

    (tmp_path / "a.txt").write_text("hello world, " * 200)
    sub = tmp_path / "sub"
    sub.mkdir()
    (sub / "b.md").write_text("the quick brown fox. " * 200)
    b = load_local_corpus(
        str(tmp_path), max_length=32, batch_size=4, seed=0
    )
    assert b["input_ids"].ndim == 3 and b["input_ids"].shape[1:] == (4, 32)
    assert b["input_ids"].dtype == np.int32
    assert 0 <= b["input_ids"].min() and b["input_ids"].max() < 256
    assert (b["attention_mask"] == 1).all()  # full chunks, no padding
    # deterministic across calls
    b2 = load_local_corpus(str(tmp_path), max_length=32, batch_size=4, seed=0)
    np.testing.assert_array_equal(b["input_ids"], b2["input_ids"])
    # different seed shuffles differently
    b3 = load_local_corpus(str(tmp_path), max_length=32, batch_size=4, seed=1)
    assert not np.array_equal(b["input_ids"], b3["input_ids"])


def test_local_corpus_single_file_and_subsample(tmp_path):
    from hessian_llm_vision_tpu.data import load_local_corpus

    f = tmp_path / "c.py"
    f.write_text("def f(x):\n    return x + 1\n" * 300)
    b = load_local_corpus(str(f), max_length=16, batch_size=2, subsample=0.5)
    full = load_local_corpus(str(f), max_length=16, batch_size=2)
    assert b["input_ids"].shape[0] <= full["input_ids"].shape[0]


def test_local_corpus_missing(tmp_path):
    from hessian_llm_vision_tpu.data import load_local_corpus

    with pytest.raises(FileNotFoundError):
        load_local_corpus(str(tmp_path / "nope"), max_length=8, batch_size=2)
