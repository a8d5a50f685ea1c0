"""Golden pins for the committed 50-trial HPO studies (artifacts/hpo_r3).

The reference's Optuna protocol (/root/reference/optun.py:47-59,
optun_adam.py) runs 50 trials over (k, lr, delta, lanczos_momentum) /
(beta2, lr, delta), failures count as inf, and the best params are written
to JSON.  These tests pin the committed studies' structural contract so a
regression in cli.hpo (space definition, trial accounting, best-selection)
is caught against real study artifacts.
"""

import json
import math
import os

import pytest

ART = os.path.join(os.path.dirname(__file__), "..", "..", "artifacts", "hpo_r3")

STUDIES = {
    "lanczos": {
        "file": "lanczos_gpt2tiny_markov.json",
        "bounds": {
            "k": (5, 50),
            "lr": (1e-4, 1e-1),
            "delta": (1e-6, 1e-2),
            "lanczos_momentum": (0.0, 0.99),
        },
    },
    "adam": {
        "file": "adam_gpt2tiny_markov.json",
        "bounds": {
            "beta2": (0.9, 0.9999),
            "lr": (1e-6, 1e-3),
            "delta": (1e-9, 1.0),
        },
    },
    # native TPE head-to-head vs the random-search study at identical budget
    "lanczos-tpe": {
        "file": "lanczos_tpe_gpt2tiny_markov.json",
        "bounds": {
            "k": (5, 50),
            "lr": (1e-4, 1e-1),
            "delta": (1e-6, 1e-2),
            "lanczos_momentum": (0.0, 0.99),
        },
    },
    # --space wide: the lr bound lifted past the reference's 1e-3 cap
    "adam-wide": {
        "file": "adam_wide_gpt2tiny_markov.json",
        "trials": 25,
        "bounds": {
            "beta2": (0.9, 0.9999),
            "lr": (1e-6, 1e-1),
            "delta": (1e-9, 1.0),
        },
    },
}


@pytest.mark.parametrize("name", list(STUDIES))
def test_hpo_study_contract(name):
    spec = STUDIES[name]
    path = os.path.join(ART, spec["file"])
    if not os.path.exists(path):
        pytest.skip(f"study artifact not committed yet: {path}")
    with open(path) as f:
        study = json.load(f)

    # the reference's trial count (optun.py:47 n_trials=50) unless the
    # study spec overrides it (the wide-space follow-up ran 25)
    assert len(study["trials"]) == spec.get("trials", 50)
    assert study["backend"] in ("optuna", "tpe", "random-search")

    # every trial draws from the documented space
    for t in study["trials"]:
        assert set(t["params"]) == set(spec["bounds"])
        for p, (lo, hi) in spec["bounds"].items():
            assert lo <= t["params"][p] <= hi, (p, t["params"][p])

    # best = min over finite trials, and params echo that trial
    finite = [t for t in study["trials"] if math.isfinite(t["loss"])]
    assert finite, "all 50 trials failed"
    best_trial = min(finite, key=lambda t: t["loss"])
    assert study["loss"] == best_trial["loss"]
    assert study["params"] == best_trial["params"]

    # the study must have signal: the best trial beats the median trial
    losses = sorted(t["loss"] for t in finite)
    median = losses[len(losses) // 2]
    assert study["loss"] < median


def test_hpo_validation_artifact():
    """Pin the seed-transfer validation of the committed studies.

    Measured 2026-08-17 (artifacts/hpo_r3/validation.json): the LanczosSGD
    study best must beat the CLI default on the study seed AND on the fresh
    seed; the Adam rows record that no point in the reference search space
    (optun_adam.py lr <= 1e-3) beats the lr=1e-3 default at this horizon —
    an honest negative result, pinned so the numbers stay consistent with
    the study JSONs.
    """
    path = os.path.join(ART, "validation.json")
    if not os.path.exists(path):
        pytest.skip(f"validation artifact not committed yet: {path}")
    with open(path) as f:
        val = json.load(f)

    for seed_key in ("study_seed", "fresh_seed_1"):
        rows = val[seed_key]
        assert rows["lanczos_best"] < rows["lanczos_default"], seed_key

    # the in-study best losses must match the study artifacts exactly
    with open(os.path.join(ART, STUDIES["lanczos"]["file"])) as f:
        assert val["study_seed"]["lanczos_best"] == json.load(f)["loss"]
    with open(os.path.join(ART, STUDIES["adam"]["file"])) as f:
        adam_best = json.load(f)["loss"]
    assert val["study_seed"]["adam_best"] == adam_best

    # the wide-space follow-up must beat both the reference-space best and
    # the lr=1e-3 default, with an lr the reference space excludes — the
    # negative result is the space's boundary, not the tooling
    wide_path = os.path.join(ART, STUDIES["adam-wide"]["file"])
    if os.path.exists(wide_path):
        with open(wide_path) as f:
            wide = json.load(f)
        assert wide["params"]["lr"] > 1e-3
        assert wide["loss"] < adam_best
        assert wide["loss"] < val["study_seed"]["adam_default"]
