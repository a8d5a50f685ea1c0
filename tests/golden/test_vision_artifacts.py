"""Golden pins for the real-MNIST vision artifacts (artifacts/vision_r3_real).

The reference's vision evidence is CIFAR spectra + the train-then-save-
spectrum loop (/root/reference/train_savespec.py:125-170).  These runs are
the TPU counterpart on real MNIST bridged to 32x32x3 (data.
load_mnist_as_cifar); the pins protect the committed *result shape*:

- VGG-16 at init: an O(1)-scale indefinite spectrum,
- ResNet-50 with BN in train mode: the O(1e4) BN-at-init curvature
  explosion,
- the train_savespec trajectory: lambda_max grows monotonically by orders
  of magnitude during training (sharpening) while lambda_min stays O(-10).
"""

import glob
import os

import numpy as np
import pytest

ART = os.path.join(os.path.dirname(__file__), "..", "..", "artifacts",
                   "vision_r3_real")


def _load(name):
    path = os.path.join(ART, name)
    if not os.path.exists(path):
        pytest.skip(f"artifact not present: {path}")
    return np.load(path)


def test_vgg16_init_spectrum_pin():
    with _load("vgg16_mnist.npz") as z:
        ev = np.sort(z["eigvals"])
        assert ev.shape == (20,)
        np.testing.assert_allclose(ev[-1], 0.646924, atol=1e-4)
        np.testing.assert_allclose(ev[0], -0.610765, atol=1e-4)
        # SLQ weights form a distribution
        assert abs(float(np.sum(z["gammas"])) - 1.0) < 1e-3


def test_resnet50_bn_train_mode_curvature_explosion():
    with _load("resnet50_bn_mnist.npz") as z:
        ev = np.sort(z["eigvals"])
        np.testing.assert_allclose(ev[-1], 28577.935547, rtol=1e-5)
        assert ev[0] < -1e4  # strongly indefinite, not PSD
        assert abs(float(np.sum(z["gammas"])) - 1.0) < 1e-3


def test_train_savespec_sharpening_trajectory():
    pat = os.path.join(ART, "train_vgg16", "sgd", "*", "*", "T_step*.npz")
    files = sorted(glob.glob(pat))
    if not files:
        pytest.skip("training T snapshots not present")
    assert len(files) == 3  # steps 0, 65, 130
    lam_max = []
    for f in files:
        with np.load(f) as z:
            T = (np.diag(z["alphas"])
                 + np.diag(z["betas"], 1)
                 + np.diag(z["betas"], -1))
            lam_max.append(float(np.linalg.eigvalsh(T)[-1]))
    # monotone sharpening over training, by orders of magnitude
    assert lam_max[0] < lam_max[1] < lam_max[2]
    assert lam_max[0] < 2.0 and lam_max[2] > 50.0
    # post-training 20-iter spectrum continues the trend
    with _load("vgg16_trained_spec.npz") as z:
        ev = np.sort(z["eigvals"])
        np.testing.assert_allclose(ev[-1], 145.2343, rtol=1e-4)
        assert lam_max[2] < ev[-1]
        assert ev[0] > -10.0  # bulk-negative stays O(-10) while top explodes
