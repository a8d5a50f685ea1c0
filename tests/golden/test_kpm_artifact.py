"""Golden pins for the on-chip 124M KPM density artifact.

artifacts/kpm124m_r3: whole-support Chebyshev density of the bench-protocol
GPT-2 124M Hessian (examples/kpm_density_124m.py).  Pins the measured
range, the trace≈0 invariant, moment normalization, and density mass.
"""

import json
import os

import numpy as np
import pytest

ART = os.path.join(
    os.path.dirname(__file__), "..", "..", "artifacts", "kpm124m_r3"
)

# measured 2026-08-18 on the real chip (README.md)
RANGE = (-4.8546, 4.9655)
# 35-iter SLQ extremes at the same protocol (bench headline)
SLQ_EXTREMES = (-4.751, 4.811)


def test_kpm_124m_artifact():
    path = os.path.join(ART, "moments.npz")
    if not os.path.exists(path):
        pytest.skip("artifact not present")
    with np.load(path) as z:
        center, radius = float(z["center"]), float(z["radius"])
        mu = np.asarray(z["raw_moments"], np.float64)
        grid = np.asarray(z["grid"], np.float64)
        rho = np.asarray(z["density"], np.float64)
        proto = json.loads(str(z["protocol"]))

    assert proto["moments"] == 80 and proto["probes"] == 2
    np.testing.assert_allclose(center - radius, RANGE[0], atol=1e-3)
    np.testing.assert_allclose(center + radius, RANGE[1], atol=1e-3)
    # the auto range must bracket the SLQ Ritz extremes
    assert center - radius < SLQ_EXTREMES[0] < center + radius
    assert center - radius < SLQ_EXTREMES[1] < center + radius
    # unit probes -> mu_0 = 1; trace invariant E[lambda] ~ 0
    np.testing.assert_allclose(mu[0], 1.0, rtol=1e-3)
    e_lambda = center * mu[0] + radius * mu[1]
    assert abs(e_lambda) < 1e-3
    # density integrates to ~1 and is (near-)nonnegative under Jackson
    mass = np.trapezoid(rho, grid)
    np.testing.assert_allclose(mass, 1.0, atol=0.03)
    assert rho.min() > -0.02
