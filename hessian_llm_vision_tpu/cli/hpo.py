"""Hyperparameter optimisation for LanczosSGD / Adam.

The reference's Optuna studies (optun.py:5-59, optun_adam.py) suggest
(k, lr, delta, lanczos_momentum) or (beta2, lr, delta), launch the train
script via subprocess, parse the last stdout line as the loss, and treat
failures as inf.  Here the objective calls the train CLI in-process (same
last-line contract), uses Optuna when installed, and falls back to a native
TPE sampler otherwise (utils/tpe.py; this image ships no optuna).
--sampler random recovers the plain seeded random search.

Example:
  python -m hessian_llm_vision_tpu.cli.hpo --trials 10 --model spiral --cpu \
      --optimiser lanczos --epochs 2
"""

from __future__ import annotations

import argparse
import json
import math
import random


SPACE = {
    "lanczos": {
        "k": ("int", 5, 50),
        "lr": ("log", 1e-4, 1e-1),
        "delta": ("log", 1e-6, 1e-2),
        "lanczos_momentum": ("float", 0.0, 0.99),
    },
    # reference optun_adam.py suggests (beta2, lr, delta=eps), same ranges
    "adam": {
        "beta2": ("log", 0.9, 0.9999),
        "lr": ("log", 1e-6, 1e-3),
        "delta": ("log", 1e-9, 1.0),
    },
}


def _suggest(space, trial=None, rng=None):
    point = {}
    for name, (kind, lo, hi) in space.items():
        if trial is not None:
            if kind == "int":
                point[name] = trial.suggest_int(name, lo, hi)
            elif kind == "log":
                point[name] = trial.suggest_float(name, lo, hi, log=True)
            else:
                point[name] = trial.suggest_float(name, lo, hi)
        else:
            if kind == "int":
                point[name] = rng.randint(lo, hi)
            elif kind == "log":
                point[name] = math.exp(rng.uniform(math.log(lo), math.log(hi)))
            else:
                point[name] = rng.uniform(lo, hi)
    return point


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--trials", type=int, default=50)
    p.add_argument("--optimiser", default="lanczos")
    p.add_argument("--hpo_seed", type=int, default=0)
    p.add_argument("--space", default="reference", choices=["reference", "wide"],
                   help="'reference' = the exact optun.py / optun_adam.py "
                   "ranges; 'wide' lifts the lr upper bound to 1e-1 "
                   "(the reference Adam space caps lr at 1e-3, which its "
                   "own CLI default sits ON — measured in "
                   "artifacts/hpo_r3/validation.json)")
    p.add_argument("--sampler", default="auto",
                   choices=["auto", "optuna", "tpe", "random"],
                   help="'auto' = optuna when installed, else the native "
                   "TPE sampler (utils/tpe.py — the reference's optun.py "
                   "algorithm, not just its protocol); 'random' keeps the "
                   "plain seeded random search")
    p.add_argument("--out_json", default="best_params.json")
    args, passthrough = p.parse_known_args(argv)
    passthrough = [a for a in passthrough if a != "--"]

    from hessian_llm_vision_tpu.cli import train as train_cli

    space = dict(SPACE.get(args.optimiser, SPACE["lanczos"]))
    if args.space == "wide":
        kind, lo, _ = space["lr"]
        space["lr"] = (kind, lo, 1e-1)

    def run_point(point) -> float:
        cli_args = list(passthrough) + ["--optimiser", args.optimiser]
        for k, v in point.items():
            cli_args += [f"--{k}", str(v)]
        try:
            loss = float(train_cli.main(cli_args))
            return loss if math.isfinite(loss) else float("inf")
        except Exception as e:  # failed trial == inf (optun.py:33-45)
            print(f"trial failed: {type(e).__name__}: {e}")
            return float("inf")

    trials = []  # the full study, persisted alongside the best point

    sampler = args.sampler
    if sampler in ("auto", "optuna"):
        try:
            import optuna  # noqa: F401
            sampler = "optuna"
        except ImportError:
            if sampler == "optuna":
                raise SystemExit("--sampler optuna: optuna is not installed")
            sampler = "tpe"
            print("[hpo] optuna not installed; using the native TPE sampler")

    if sampler == "optuna":
        import optuna

        def objective(trial):
            point = _suggest(space, trial=trial)
            loss = run_point(point)
            trials.append({"params": point, "loss": loss})
            return loss

        study = optuna.create_study(direction="minimize")
        study.optimize(objective, n_trials=args.trials)
        best = {"params": study.best_params, "loss": study.best_value,
                "backend": "optuna"}
    elif sampler == "tpe":
        from hessian_llm_vision_tpu.utils.tpe import TPESampler

        tpe = TPESampler(space, seed=args.hpo_seed)
        best = {"params": None, "loss": float("inf"), "backend": "tpe"}
        for i in range(args.trials):
            point = tpe.suggest(trials)
            loss = run_point(point)
            trials.append({"params": point, "loss": loss})
            print(f"trial {i}: {point} -> {loss:.5f}", flush=True)
            if loss < best["loss"]:
                best = {"params": point, "loss": loss, "backend": "tpe"}
    else:
        print("[hpo] seeded random search")
        rng = random.Random(args.hpo_seed)
        best = {"params": None, "loss": float("inf"), "backend": "random-search"}
        for i in range(args.trials):
            point = _suggest(space, rng=rng)
            loss = run_point(point)
            trials.append({"params": point, "loss": loss})
            print(f"trial {i}: {point} -> {loss:.5f}", flush=True)
            if loss < best["loss"]:
                best = {"params": point, "loss": loss, "backend": "random-search"}
    best["trials"] = trials

    print(json.dumps(best, indent=2))
    import os

    # a 50-trial study must not lose its result to a missing dir (same
    # hardening as cli.sweep)
    parent = os.path.dirname(os.path.abspath(args.out_json))
    os.makedirs(parent, exist_ok=True)
    with open(args.out_json, "w") as f:
        json.dump(best, f, indent=2)
    print(f"best -> {args.out_json}")
    return best


if __name__ == "__main__":
    main()
