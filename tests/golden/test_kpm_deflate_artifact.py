"""Golden pins for the on-chip 124M deflated-KPM density artifact.

artifacts/kpm_deflate124m_r3: exact thick-restart spikes + KPM bulk of the
deflated GPT-2 124M Hessian (cli.spectrum --kpm 60 --kpm_deflate 4, bf16
basis storage).  Pins the spike values, their residual certificates, the
SLQ cross-check, the bulk support, and the combined trace≈0 invariant.
"""

import os

import numpy as np
import pytest

ART = os.path.join(
    os.path.dirname(__file__), "..", "..", "artifacts", "kpm_deflate124m_r3"
)

# measured 2026-08-18 on the real chip (README.md)
SPIKES = (-4.4544, 4.5913, 4.7766, 4.9608)
SLQ_LAMBDA_MAX = 4.960876


def test_kpm_deflate_124m_artifact():
    path = os.path.join(ART, "spec.npz")
    if not os.path.exists(path):
        pytest.skip("artifact not present")
    with np.load(path) as z:
        spikes = np.sort(np.asarray(z["meta_kpm_deflate_eigvals"], np.float64))
        resid = np.asarray(z["meta_kpm_deflate_residuals"], np.float64)
        converged = int(z["meta_kpm_deflate_converged"])
        center = float(z["meta_kpm_center"])
        radius = float(z["meta_kpm_radius"])
        mu = np.asarray(z["meta_kpm_raw_moments"], np.float64)
        ev = np.sort(np.asarray(z["eigvals"], np.float64))

    assert converged == 1
    np.testing.assert_allclose(spikes, SPIKES, atol=1e-3)
    # residual certificates: all under the bf16 tolerance bar
    assert resid.max() < 3e-3
    # the top spike is the SLQ lambda_max, independently estimated
    np.testing.assert_allclose(spikes[-1], SLQ_LAMBDA_MAX, rtol=1e-4)
    np.testing.assert_allclose(ev[-1], SLQ_LAMBDA_MAX, rtol=1e-4)
    # bulk support sits strictly inside the full support's extremes
    assert center + radius < spikes[-1]
    assert spikes[-1] - (center + radius) > 0.3
    # combined trace invariant: exact spike mass (k/P ~ 3e-8, negligible)
    # + bulk first moments ~ 0
    e_bulk = center * mu[0] + radius * mu[1]
    assert abs(e_bulk) < 1e-3
    np.testing.assert_allclose(mu[0], 1.0, rtol=1e-3)
