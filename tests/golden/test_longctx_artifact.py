"""Golden pins for the seq-2048 long-context 124M spectrum artifact.

Beyond reference (its curvature jobs cap at n_positions=512,
gpt2_savehessian.py:12-19): the blockwise-attention memory-light path
runs the same Lanczos at 4x the context on one chip.
"""

import os

import numpy as np
import pytest

ART = os.path.join(
    os.path.dirname(__file__), "..", "..", "artifacts", "longctx_r3"
)


def test_longctx_spectrum():
    path = os.path.join(ART, "spec.npz")
    if not os.path.exists(path):
        pytest.skip(f"artifact not committed yet: {path}")
    d = np.load(path)
    ev, ga = d["eigvals"], d["gammas"]
    assert ev.shape == ga.shape == (20,)
    np.testing.assert_allclose(ga.sum(), 1.0, atol=1e-3)
    assert abs(float(np.dot(ev, ga))) < 1e-3  # trace ~ 0 at init
    assert 200.0 < ev.max() < 320.0 and -320.0 < ev.min() < -200.0
