"""Golden pins for the at-scale LLaMA spectrum artifact.

The reference family coverage includes LLaMA-class models only via loss
evaluation (/root/reference/loss-llama.ipynb); this framework adds full
curvature analysis for the family.  artifacts/llama134m_r3 is the
at-scale evidence: a 134M-param LLaMA (llama-134m, models/llama.py)
Hessian spectrum on the real chip via the memory-light host loop.  Pins
the invariants that don't depend on the probe seed: Ritz/γ shapes, SLQ
weights summing to 1, the ~0 LM-Hessian trace estimate at init (the
GPT2 spectrum.ipynb cell 4 invariant holds architecture-wide), and a
λmax in the same decade as the 124M GPT-2 value once measured values are
pinned in README.md.
"""

import json
import os

import numpy as np
import pytest

ART = os.path.join(
    os.path.dirname(__file__), "..", "..", "artifacts", "llama134m_r3"
)


def test_llama134m_spectrum_artifact():
    path = os.path.join(ART, "spec.npz")
    if not os.path.exists(path):
        pytest.skip(f"artifact not committed yet: {path}")
    d = np.load(path)
    ev, ga = d["eigvals"], d["gammas"]
    assert ev.shape == ga.shape and ev.ndim == 1 and ev.size >= 15
    np.testing.assert_allclose(ga.sum(), 1.0, atol=1e-5)
    assert (ga >= 0).all()
    # LM Hessian at init: trace estimate ~ 0
    assert abs(float(np.dot(ev, ga))) < 1e-3 * max(1.0, abs(ev).max())

    # measured values pinned alongside the artifact
    mpath = os.path.join(ART, "summary.json")
    if os.path.exists(mpath):
        with open(mpath) as f:
            s = json.load(f)
        np.testing.assert_allclose(ev.max(), s["lambda_max"], rtol=1e-6)
        np.testing.assert_allclose(ev.min(), s["lambda_min"], rtol=1e-6)
