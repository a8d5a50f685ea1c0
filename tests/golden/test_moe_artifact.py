"""Golden pins for the at-scale MoE spectrum artifact.

The reference has no MoE models (SURVEY.md §2.7 marks EP absent);
artifacts/moe_r3 is this framework's beyond-parity evidence that full
Hessian curvature analysis extends to mixture-of-experts transformers
(models/moe.py, GPT2Config.moe_80m) on the real chip.  Pins the
probe-seed-independent invariants: Ritz/γ shapes, SLQ weights summing to
1, the ~0 LM-Hessian trace estimate at init, and summary.json extremes
matching the committed spectrum.
"""

import json
import os

import numpy as np
import pytest

ART = os.path.join(
    os.path.dirname(__file__), "..", "..", "artifacts", "moe_r3"
)


def test_moe_spectrum_artifact():
    path = os.path.join(ART, "spec.npz")
    if not os.path.exists(path):
        pytest.skip(f"artifact not committed yet: {path}")
    d = np.load(path)
    ev, ga = d["eigvals"], d["gammas"]
    assert ev.shape == ga.shape and ev.ndim == 1 and ev.size == 20
    np.testing.assert_allclose(ga.sum(), 1.0, atol=1e-5)
    assert (ga >= 0).all()
    # LM Hessian at init: trace estimate ~ 0 (holds for the MoE family too)
    assert abs(float(np.dot(ev, ga))) < 1e-3 * max(1.0, abs(ev).max())

    mpath = os.path.join(ART, "summary.json")
    with open(mpath) as f:
        s = json.load(f)
    np.testing.assert_allclose(ev.max(), s["lambda_max"], rtol=1e-6)
    np.testing.assert_allclose(ev.min(), s["lambda_min"], rtol=1e-6)
    # measured round-3 values (one-chip run, .logs/moe_r3.log)
    np.testing.assert_allclose(s["lambda_max"], 92.9843, rtol=1e-3)
    np.testing.assert_allclose(s["lambda_min"], -84.5810, rtol=1e-3)
