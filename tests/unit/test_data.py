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


@pytest.mark.skipif(
    not os.path.exists("/root/reference/data/MNIST/raw"),
    reason="reference MNIST not mounted",
)
def test_mnist_as_cifar_bridge():
    from hessian_llm_vision_tpu.data import load_mnist_as_cifar

    x, y = load_mnist_as_cifar("test")
    assert x.shape == (10000, 32, 32, 3) and y.shape == (10000,)
    # channels are tiled copies of the padded grayscale image
    np.testing.assert_array_equal(x[..., 0], x[..., 1])
    np.testing.assert_array_equal(x[..., 0], x[..., 2])
    # interior matches load_mnist; border is the normalized background
    raw, _ = load_mnist("test")
    np.testing.assert_allclose(x[:, 2:30, 2:30, :1], raw, rtol=0, atol=0)
    assert np.allclose(x[:, 0, 0, 0], x[0, 0, 0, 0])  # constant border


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


def _write_cifar_fixture(root, n_per_batch=20, train_batches=2):
    """Synthetic cifar-10-batches-py distribution: real pickle format
    (bytes keys, (N, 3072) uint8 rows, list labels) so load_cifar10's
    reader runs end-to-end (reference data: train_savespec.py:125-170)."""
    import pickle

    base = os.path.join(root, "cifar-10-batches-py")
    os.makedirs(base, exist_ok=True)
    rng = np.random.RandomState(0)

    def one(path, seed):
        r = np.random.RandomState(seed)
        data = r.randint(0, 256, size=(n_per_batch, 3072), dtype=np.uint8)
        labels = [int(v) for v in r.randint(0, 10, size=n_per_batch)]
        with open(path, "wb") as f:
            pickle.dump({b"data": data, b"labels": labels}, f)
        return data, labels

    train = [
        one(os.path.join(base, f"data_batch_{i}"), i)
        for i in range(1, 6)
    ]
    test = one(os.path.join(base, "test_batch"), 99)
    return train, test


def test_cifar10_fixture_roundtrip(tmp_path):
    from hessian_llm_vision_tpu.data import load_cifar10
    from hessian_llm_vision_tpu.data.vision import CIFAR_MEAN, CIFAR_STD

    train, (test_data, test_labels) = _write_cifar_fixture(str(tmp_path))
    x, y = load_cifar10("train", data_dir=str(tmp_path))
    assert x.shape == (100, 32, 32, 3) and x.dtype == np.float32
    assert y.shape == (100,) and y.dtype == np.int32
    # first train batch, first image: NCHW->NHWC + normalize must match
    raw = train[0][0][0].reshape(3, 32, 32).transpose(1, 2, 0) / 255.0
    np.testing.assert_allclose(
        x[0], (raw.astype(np.float32) - CIFAR_MEAN) / CIFAR_STD, atol=1e-6
    )
    assert y[0] == train[0][1][0]

    xt, yt = load_cifar10("test", data_dir=str(tmp_path), normalize=False)
    assert xt.shape == (20, 32, 32, 3)
    assert xt.max() <= 1.0 and xt.min() >= 0.0
    np.testing.assert_array_equal(yt, np.asarray(test_labels, np.int32))

    # the reference task-split path on top of the loaded data
    xa, ya = get_class_subset(x, y, [0, 1, 2, 3, 4])
    assert set(np.unique(ya)) <= {0, 1, 2, 3, 4}
    assert len(xa) == int(np.isin(y, [0, 1, 2, 3, 4]).sum())


def test_cifar10_missing_raises(tmp_path):
    from hessian_llm_vision_tpu.data import load_cifar10

    with pytest.raises(FileNotFoundError):
        load_cifar10("train", data_dir=str(tmp_path / "nope"))


def test_cifar10_cli_workload(tmp_path, monkeypatch):
    """vgg16 workload builds from REAL (fixture) CIFAR pickles — the
    previously dead reader now feeds the vision CLI path end-to-end."""
    _write_cifar_fixture(str(tmp_path))
    monkeypatch.setenv("HLV_CIFAR_DIR", str(tmp_path))
    import hessian_llm_vision_tpu.cli.common as common
    from hessian_llm_vision_tpu.cli.spectrum import build_parser

    args = build_parser().parse_args(
        ["--model", "vgg16", "--batch_size", "10", "--classes", "0", "1",
         "--subsample", "1.0", "--cpu"]
    )
    wl = common.build_workload(args)
    n_sel = sum(len(b[0]) for b in wl.batches)
    assert n_sel >= 10  # at least one full batch of the 2-class subset
    for xb, yb in wl.batches:
        assert xb.shape[1:] == (32, 32, 3)
        assert int(yb.max()) <= 1


def test_per_epoch_augmentation_redraws(tmp_path, monkeypatch):
    """--augment: make_batches(epoch) redraws crops/flips per epoch
    (train_savespec.py:46-55 loader semantics); epoch 0 == wl.batches so
    curvature jobs keep a fixed operator."""
    import numpy as np

    _write_cifar_fixture(str(tmp_path))
    monkeypatch.setenv("HLV_CIFAR_DIR", str(tmp_path))
    import hessian_llm_vision_tpu.cli.common as common
    from hessian_llm_vision_tpu.cli.spectrum import build_parser

    args = build_parser().parse_args(
        ["--model", "vgg16", "--batch_size", "10", "--augment", "--cpu"]
    )
    wl = common.build_workload(args)
    assert wl.make_batches is not None
    b0 = wl.make_batches(0)
    b1 = wl.make_batches(1)
    # epoch 0 reproduces the workload's fixed draw exactly
    np.testing.assert_array_equal(
        np.asarray(b0[0][0]), np.asarray(wl.batches[0][0])
    )
    # epoch 1 is a DIFFERENT draw of the same images
    assert not np.array_equal(np.asarray(b1[0][0]), np.asarray(b0[0][0]))
    # same epoch is deterministic
    np.testing.assert_array_equal(
        np.asarray(wl.make_batches(1)[0][0]), np.asarray(b1[0][0])
    )
    # labels never change
    np.testing.assert_array_equal(np.asarray(b1[0][1]), np.asarray(b0[0][1]))

    # the loop-facing wrapper advances one draw per epoch
    from hessian_llm_vision_tpu.train import EpochResampledBatches

    src = EpochResampledBatches(wl.make_batches)
    first = [np.asarray(x) for x, _ in src]
    second = [np.asarray(x) for x, _ in src]
    assert not np.array_equal(first[0], second[0])

    # without --augment/--noise there is no per-epoch hook
    args2 = build_parser().parse_args(
        ["--model", "vgg16", "--batch_size", "10", "--cpu"]
    )
    assert common.build_workload(args2).make_batches is None
