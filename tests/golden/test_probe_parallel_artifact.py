"""Golden pins for the probe-parallel SLQ mechanics artifact.

artifacts/probe_parallel_r3/scaling.json records the simulated-mesh run of
``parallel/probe_parallel.py`` (all probes in ONE fused program, probe axis
sharded): per-probe equality with sequential ``dataset_spectrum_host``
runs and the dispatch-count reduction.  Pins the contract the README
claims; numeric behavior itself is pinned live in
tests/distributed/test_probe_parallel.py.
"""

import json
import os

import numpy as np
import pytest

ART = os.path.join(
    os.path.dirname(__file__), "..", "..", "artifacts", "probe_parallel_r3"
)


def test_probe_parallel_scaling_artifact():
    path = os.path.join(ART, "scaling.json")
    if not os.path.exists(path):
        pytest.skip("artifact not present")
    with open(path) as f:
        s = json.load(f)
    assert s["probes"] == 8 and s["iters"] == 12
    # one dispatch per iteration regardless of probe count
    assert s["dispatches_parallel"] == s["iters"]
    assert s["dispatches_sequential"] == s["iters"] * s["probes"]
    # probe-for-probe tridiagonal equality with the sequential path
    assert s["max_alpha_abs_err_vs_sequential"] < 1e-4
    # all probes estimate the same lambda_max (SLQ probe consistency)
    lm = np.asarray(s["per_probe_lambda_max"])
    assert lm.std() / abs(lm.mean()) < 1e-3
