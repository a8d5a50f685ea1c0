"""Golden pins for the Pythia-1.4B on-chip spectrum artifacts.

The >1B-parameter workload the reference ran on A100-80GB
(/root/reference/diego_pythia.py:151-192, diego_pythia_massive.py) —
executed here on ONE 16 GB TPU v5e chip via the bigmodel host loop
(pytree-native donating step, bf16-stored Krylov vectors, f32
recurrence; krylov/driver.py).  Two runs are committed: the round-3
15-iter run and its 45-iter deepening (same probe seed/protocol) —
the deeper run must agree with the shallower one where Lanczos has
converged (λmax) and extend the bulk coverage.
"""

import os

import numpy as np
import pytest

ART = os.path.join(
    os.path.dirname(__file__), "..", "..", "artifacts", "pythia1p4b_r3"
)


def _load(name):
    path = os.path.join(ART, name)
    if not os.path.exists(path):
        pytest.skip(f"artifact not committed yet: {path}")
    return np.load(path)


def test_pythia_15iter_spectrum():
    d = _load("spectrum.npz")
    ev, ga = d["eigvals"], d["gammas"]
    assert ev.shape == ga.shape == (15,)
    np.testing.assert_allclose(ga.sum(), 1.0, atol=1e-3)
    # SLQ LM-Hessian-at-init invariant: E[lambda] ~ 0 despite extremes ~566
    assert abs(float(np.dot(ev, ga))) < 1e-3
    assert 550.0 < ev.max() < 580.0 and -580.0 < ev.min() < -550.0


def test_pythia_45iter_spectrum_deepens_the_15iter_run():
    d15 = _load("spectrum.npz")
    d45 = _load("spectrum45.npz")
    ev45, ga45 = d45["eigvals"], d45["gammas"]
    assert ev45.shape == ga45.shape == (45,)
    np.testing.assert_allclose(ga45.sum(), 1.0, atol=1e-3)
    assert abs(float(np.dot(ev45, ga45))) < 1e-3
    # lambda_max was converged by iteration 15: the runs must agree
    np.testing.assert_allclose(
        ev45.max(), d15["eigvals"].max(), rtol=2e-3
    )
    # more iterations reach at least as deep on the negative end
    assert ev45.min() <= d15["eigvals"].min() + 1.0
