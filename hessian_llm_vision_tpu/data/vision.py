"""Vision data: MNIST (idx files), CIFAR-10 (python pickles), transforms.

Reference pipeline: torchvision CIFAR-10/MNIST with normalize / RandomCrop /
flip / custom ``AddGaussianNoise`` transforms and class-subset task splits
(/root/reference/train_savespec.py:46-55,125-170, data/MNIST).  torchvision
is not in this image, so the loaders read the raw formats directly (numpy)
and the transforms are seeded numpy ops applied per batch on host — the
device-side pipeline stays static-shape.
"""

from __future__ import annotations

import gzip
import os
import pickle
import struct
from typing import Optional, Sequence, Tuple

import numpy as np

MNIST_MEAN, MNIST_STD = 0.1307, 0.3081
CIFAR_MEAN = np.array([0.4914, 0.4822, 0.4465], np.float32)
CIFAR_STD = np.array([0.2470, 0.2435, 0.2616], np.float32)

def _mnist_dir() -> str:
    return os.environ.get("HLV_MNIST_DIR", "/root/reference/data/MNIST/raw")


def _cifar_dir() -> str:
    return os.environ.get("HLV_CIFAR_DIR", "")


def _read_idx(path: str) -> np.ndarray:
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "rb") as f:
        magic = struct.unpack(">I", f.read(4))[0]
        ndim = magic & 0xFF
        dims = struct.unpack(">" + "I" * ndim, f.read(4 * ndim))
        return np.frombuffer(f.read(), dtype=np.uint8).reshape(dims)


def _find_idx(base: str, stem: str) -> Optional[str]:
    for suffix in ("", ".gz"):
        p = os.path.join(base, stem + suffix)
        if os.path.exists(p):
            return p
    return None


def load_mnist(
    split: str = "test", data_dir: Optional[str] = None, normalize: bool = True
) -> Tuple[np.ndarray, np.ndarray]:
    """(images (N,28,28,1) f32, labels (N,) i32) from raw idx files.

    ``data_dir`` defaults to ``$HLV_MNIST_DIR`` resolved at CALL time (so
    tests/deployments can point it at fixtures after import)."""
    data_dir = data_dir or _mnist_dir()
    prefix = "train" if split == "train" else "t10k"
    img_p = _find_idx(data_dir, f"{prefix}-images-idx3-ubyte")
    lbl_p = _find_idx(data_dir, f"{prefix}-labels-idx1-ubyte")
    if img_p is None or lbl_p is None:
        raise FileNotFoundError(
            f"MNIST {split} idx files not found under {data_dir} "
            "(set HLV_MNIST_DIR)"
        )
    x = _read_idx(img_p).astype(np.float32)[..., None] / 255.0
    y = _read_idx(lbl_p).astype(np.int32)
    if normalize:
        x = (x - MNIST_MEAN) / MNIST_STD
    return x, y


def load_mnist_as_cifar(
    split: str = "train", data_dir: Optional[str] = None, normalize: bool = True
) -> Tuple[np.ndarray, np.ndarray]:
    """Real MNIST bridged to the CIFAR input contract: (N,32,32,3) f32.

    Zero-pads 28x28 -> 32x32 and tiles the channel to RGB so the VGG/ResNet
    spectrum workloads (reference train_savespec.py:125-170 era) can run on
    REAL image data in this offline environment where the CIFAR-10 pickle
    distribution is absent.  Labels are the true digit labels, so the loss
    landscape is that of a genuine 10-class problem, not noise."""
    x, y = load_mnist(split, data_dir=data_dir, normalize=normalize)
    # pad with the (normalized) black-background value, not literal zero
    bg = float((0.0 - MNIST_MEAN) / MNIST_STD) if normalize else 0.0
    n = x.shape[0]
    out = np.full((n, 32, 32, 1), bg, np.float32)
    out[:, 2:30, 2:30, :] = x
    return np.repeat(out, 3, axis=3), y


def load_cifar10(
    split: str = "train", data_dir: Optional[str] = None, normalize: bool = True
) -> Tuple[np.ndarray, np.ndarray]:
    """(images (N,32,32,3) f32 NHWC, labels (N,) i32) from the python-pickle
    distribution (cifar-10-batches-py).  ``data_dir`` defaults to
    ``$HLV_CIFAR_DIR`` resolved at CALL time."""
    data_dir = data_dir or _cifar_dir()
    base = os.path.join(data_dir, "cifar-10-batches-py")
    if not os.path.isdir(base):
        raise FileNotFoundError(
            f"CIFAR-10 python batches not found under {data_dir} "
            "(set HLV_CIFAR_DIR; no network egress to download)"
        )
    files = (
        [f"data_batch_{i}" for i in range(1, 6)]
        if split == "train"
        else ["test_batch"]
    )
    xs, ys = [], []
    for fn in files:
        with open(os.path.join(base, fn), "rb") as f:
            d = pickle.load(f, encoding="bytes")
        xs.append(d[b"data"])
        ys.append(np.asarray(d[b"labels"]))
    x = np.concatenate(xs).reshape(-1, 3, 32, 32).transpose(0, 2, 3, 1)
    x = x.astype(np.float32) / 255.0
    y = np.concatenate(ys).astype(np.int32)
    if normalize:
        x = (x - CIFAR_MEAN) / CIFAR_STD
    return x, y


def get_class_subset(
    x: np.ndarray, y: np.ndarray, classes: Sequence[int], remap: bool = True
) -> Tuple[np.ndarray, np.ndarray]:
    """Filter to a class subset (the reference's task-A/B continual-learning
    splits, train_savespec.py:139-170, load_model.py).  ``remap=True``
    relabels to 0..len(classes)-1."""
    classes = list(classes)
    sel = np.isin(y, classes)
    xs, ys = x[sel], y[sel]
    if remap:
        lut = {c: i for i, c in enumerate(classes)}
        ys = np.vectorize(lut.get)(ys).astype(np.int32)
    return xs, ys


def add_gaussian_noise(
    x: np.ndarray, std: float, seed: int = 0
) -> np.ndarray:
    """The reference's custom ``AddGaussianNoise`` transform
    (train_savespec.py:46-55)."""
    rng = np.random.RandomState(seed)
    return x + rng.randn(*x.shape).astype(np.float32) * std


def augment_batch(
    x: np.ndarray, seed: int, crop_pad: int = 4, flip: bool = True
) -> np.ndarray:
    """RandomCrop(pad)+HorizontalFlip, seeded, batch-at-once (NHWC)."""
    rng = np.random.RandomState(seed)
    n, h, w, c = x.shape
    padded = np.pad(
        x, ((0, 0), (crop_pad, crop_pad), (crop_pad, crop_pad), (0, 0)), "reflect"
    )
    out = np.empty_like(x)
    offs = rng.randint(0, 2 * crop_pad + 1, size=(n, 2))
    flips = rng.rand(n) < 0.5 if flip else np.zeros(n, bool)
    for i in range(n):
        oy, ox = offs[i]
        img = padded[i, oy : oy + h, ox : ox + w]
        out[i] = img[:, ::-1] if flips[i] else img
    return out
