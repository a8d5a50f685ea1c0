"""Native TPE sampler (utils/tpe.py) — the optuna-absent backend of
cli/hpo.py (reference protocol: optun.py:47-59, 50 TPE trials)."""

import math
import random

import pytest

from hessian_llm_vision_tpu.utils.tpe import TPESampler

SPACE = {
    "k": ("int", 5, 50),
    "lr": ("log", 1e-4, 1e-1),
    "momentum": ("float", 0.0, 0.99),
}


def _objective(point):
    # smooth bowl with optimum inside the space: lr*=1e-2, k*=20, m*=0.5
    return (
        (math.log10(point["lr"]) + 2.0) ** 2
        + ((point["k"] - 20) / 15.0) ** 2
        + (point["momentum"] - 0.5) ** 2
    )


def _run_study(sampler_factory, n_trials, seed):
    trials = []
    sampler = sampler_factory(seed)
    for _ in range(n_trials):
        point = sampler(trials)
        trials.append({"params": point, "loss": _objective(point)})
    return min(t["loss"] for t in trials)


def _random_sampler(seed):
    rng = random.Random(seed)

    def suggest(trials):
        return {
            "k": rng.randint(5, 50),
            "lr": math.exp(rng.uniform(math.log(1e-4), math.log(1e-1))),
            "momentum": rng.uniform(0.0, 0.99),
        }

    return suggest


def test_tpe_respects_space():
    tpe = TPESampler(SPACE, seed=0, n_startup=3)
    trials = []
    for _ in range(30):
        point = tpe.suggest(trials)
        assert isinstance(point["k"], int) and 5 <= point["k"] <= 50
        assert 1e-4 <= point["lr"] <= 1e-1
        assert 0.0 <= point["momentum"] <= 0.99
        trials.append({"params": point, "loss": _objective(point)})


def test_tpe_handles_inf_and_short_history():
    tpe = TPESampler(SPACE, seed=1, n_startup=2)
    trials = [
        {"params": tpe.suggest([]), "loss": float("inf")},
        {"params": tpe.suggest([]), "loss": float("inf")},
    ]
    # all-failed history: falls back to random, still in-space
    point = tpe.suggest(trials)
    assert 5 <= point["k"] <= 50
    trials.append({"params": point, "loss": 1.0})
    trials.append({"params": tpe.suggest(trials), "loss": 2.0})
    # mixed finite/inf history: inf trials join the bad split, no crash
    point = tpe.suggest(trials)
    assert 1e-4 <= point["lr"] <= 1e-1


def test_parzen_duplicate_and_edge_bandwidths():
    """Duplicate observations (routine for int params like k) must get the
    FLOOR bandwidth, not the full range width (the old srt.index(mu)
    resolved every duplicate to the first occurrence — code-review r3);
    edge kernels see virtual neighbours at lo/hi, not the range width."""
    from hessian_llm_vision_tpu.utils.tpe import _Parzen

    p = _Parzen([12.0, 12.0, 20.0], 5.0, 50.0)
    width = 45.0
    floor = width / 4.0
    # kernels are stored sorted: [12, 12, 20, prior]
    assert p.mus[:3] == [12.0, 12.0, 20.0]
    # the duplicate pair: spacing 0 on one side, 7/8 on the other -> their
    # sigma is the max of (left, right) neighbour gaps, nowhere near width
    assert p.sigmas[0] == max(12.0 - 5.0, floor)   # left edge -> lo
    assert p.sigmas[1] == max(8.0, floor)          # 20-12, not width
    assert p.sigmas[2] == max(50.0 - 20.0, floor)  # right edge -> hi
    assert all(s < width for s in p.sigmas[:3])
    assert p.sigmas[3] == width  # prior kernel spans the range


def test_tpe_beats_random_on_smooth_bowl():
    """Mean best-of-40 over 5 seeds: TPE must beat random search on a
    smooth objective (the point of shipping the algorithm, not just the
    protocol). Fully seeded — deterministic."""
    seeds = range(5)
    tpe_best = [
        _run_study(
            lambda s: TPESampler(SPACE, seed=s, n_startup=10).suggest, 40, s
        )
        for s in seeds
    ]
    rnd_best = [_run_study(_random_sampler, 40, s) for s in seeds]
    mean_tpe = sum(tpe_best) / len(tpe_best)
    mean_rnd = sum(rnd_best) / len(rnd_best)
    assert mean_tpe < mean_rnd, (tpe_best, rnd_best)
    # and it should land near the optimum on average
    assert mean_tpe < 0.05, tpe_best
