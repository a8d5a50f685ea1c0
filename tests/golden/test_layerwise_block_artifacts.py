"""Golden pins for the 124M per-block layerwise sweep artifact.

The reference's per-layer eigenvalue figure sweeps Lanczos over every
transformer block of a trained GPT-2 124M and plots a grid of per-block
spectra (/root/reference/ipynbs/visual-eigen.ipynb cells 12-13).
artifacts/layerwise_block_r3 is that sweep run here on the real chip via
the host-loop masked-HVP path (--layerwise --layerwise_group block
--host_loop): 12 block spectra (h_0..h_11) of GPT-2 124M on the local
byte-level corpus.  Pins the seed-independent invariants: one artifact
per block, SLQ weights summing to 1, and per-block trace ~ 0 at init.
"""

import glob
import os

import numpy as np
import pytest

ART = os.path.join(
    os.path.dirname(__file__), "..", "..", "artifacts", "layerwise_block_r3"
)


def test_layerwise_block_artifacts():
    paths = sorted(glob.glob(os.path.join(ART, "blk_h_*.npz")))
    if not paths:
        pytest.skip(f"artifact not committed yet: {ART}/blk_h_*.npz")
    assert len(paths) == 12  # GPT-2 124M has 12 transformer blocks
    for p in paths:
        d = np.load(p)
        ev, ga = d["eigvals"], d["gammas"]
        assert ev.shape == ga.shape and ev.ndim == 1 and ev.size >= 10
        np.testing.assert_allclose(ga.sum(), 1.0, atol=1e-5)
        assert (ga >= 0).all()
        # block-restricted LM Hessian at init: trace estimate ~ 0
        assert abs(float(np.dot(ev, ga))) < 1e-2 * max(1.0, abs(ev).max())
    assert os.path.exists(os.path.join(ART, "grid.png"))
