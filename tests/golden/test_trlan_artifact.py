"""Golden pins for the 124M thick-restart converged-eigenpair artifact.

The reference's eigenbases are one unrestarted Lanczos pass — accuracy
capped by how long a basis fits in memory (gpt2_savehessian.py:202-223).
artifacts/trlan124m_r3 is a beyond-reference run on the real chip:
k=5 CONVERGED extremal eigenpairs of the GPT-2 124M Hessian by
thick-restart Lanczos (krylov/thick_restart.py, Wu & Simon TRLan) inside
a fixed 16-vector bf16-stored basis buffer.  Pins the seed-independent
invariants: k pairs, orthonormal converged eigenvectors, the reported
max residual under the run's tolerance, and the converged flag.
"""

import json
import os

import numpy as np
import pytest

ART = os.path.join(
    os.path.dirname(__file__), "..", "..", "artifacts", "trlan124m_r3"
)


def test_trlan_artifact():
    path = os.path.join(ART, "spec.npz")
    if not os.path.exists(path):
        pytest.skip(f"artifact not committed yet: {path}")
    d = np.load(path)
    ev, ga = d["eigvals"], d["gammas"]
    assert ev.shape == ga.shape == (5,)
    assert (ga >= 0).all()
    # converged + residual bar of the committed run (--tr_tol 2e-3)
    assert int(d["meta_tr_converged"]) == 1
    scale = float(np.abs(ev).max())
    assert float(d["meta_tr_max_residual"]) <= 2e-3 * scale * 1.01
    # eigenvectors of a symmetric operator: orthonormal rows.  The full
    # (5, 124M) basis is 2.5 GB — the committed artifact carries its Gram
    # matrix (computed on host from the on-chip V before compaction) plus
    # a fixed-seed 8-direction sketch instead of V itself.
    if "V" in d.files:
        V = d["V"].astype(np.float32)
        assert V.shape[0] == 5
        gram = V @ V.T
    else:
        gram = d["V_gram"].astype(np.float32)
        assert gram.shape == (5, 5)
        assert d["V_sketch8_seed0"].shape == (5, 8)
    np.testing.assert_allclose(gram, np.eye(5), atol=5e-3)
    # largest-|lambda| pairs of the 124M LM Hessian at init: the strict
    # bf16x3 35-iter extremes at this protocol are +4.808/-4.750 (bench);
    # converged TRLan pairs must bracket at least that spread
    assert ev.max() > 4.5 and ev.min() < -4.5


def test_trlan_summary():
    path = os.path.join(ART, "summary.json")
    if not os.path.exists(path):
        pytest.skip(f"summary not committed yet: {path}")
    with open(path) as f:
        s = json.load(f)
    assert s["num_ritz"] == 5
    assert s["tr_converged"] == 1


ART_R4 = os.path.join(
    os.path.dirname(__file__), "..", "..", "artifacts", "trlan124m_r4"
)


def test_trlan_r4_dataset_artifact():
    """Round-4 fused-path artifact: DATASET-MEAN operator (the reference's
    eigenbasis level, gpt2_savehessian.py:130-163), converged in <=60 s
    warm (VERDICT r3 #4 bar; r3 single-batch unfused: 155.7 s)."""
    path = os.path.join(ART_R4, "spec.npz")
    if not os.path.exists(path):
        pytest.skip(f"artifact not committed yet: {path}")
    d = np.load(path)
    ev, ga = d["eigvals"], d["gammas"]
    assert ev.shape == ga.shape == (5,)
    assert (ga >= 0).all()
    assert int(d["meta_tr_converged"]) == 1
    assert int(d["meta_num_batches"]) == 4
    assert str(d["meta_normalization"]) == "dataset"
    scale = float(np.abs(ev).max())
    assert float(d["meta_tr_max_residual"]) <= 2e-3 * scale * 1.01
    # the committed warm wall-clock IS the VERDICT bar
    assert float(d["meta_wall_s"]) <= 60.0
    gram = d["V_gram"].astype(np.float32)
    assert gram.shape == (5, 5)
    assert d["V_sketch8_seed0"].shape == (5, 8)
    # bf16-stored rows: ORTHOGONALITY (off-diagonal) holds well below the
    # storage floor; the DIAGONAL carries the bf16 norm quantization
    # (~2^-8 relative per row, measured 5.1e-3 with the MXU-emitted bf16
    # restart rotation) — assert the two at their own scales
    off = gram - np.diag(np.diag(gram))
    assert np.abs(off).max() <= 2e-3, np.abs(off).max()
    assert np.abs(np.diag(gram) - 1.0).max() <= 8e-3
    # dataset-mean byte-corpus curvature at init keeps 100+-scale extremes
    # (random-token batches show only ~5 at this config)
    assert ev.max() > 100 and ev.min() < -100
