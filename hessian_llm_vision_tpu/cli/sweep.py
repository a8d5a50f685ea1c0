"""Grid sweeps over training hyperparameters.

Replaces the reference's bash grids (train.sh lr x optimiser, hessian.sh
lr x delta x k, adam.sh lr list, d.sh data_seed x vector_seed) with one
in-process driver: each point runs the train CLI's main() and the summary
table is written as JSON.

Example:
  python -m hessian_llm_vision_tpu.cli.sweep --model spiral --cpu \
      --grid lr=0.01,0.1 k=5,10 --epochs 2 --optimiser lanczos
"""

from __future__ import annotations

import argparse
import itertools
import json
import math


def parse_grid(items):
    grid = {}
    for item in items:
        key, _, vals = item.partition("=")
        if not vals:
            raise SystemExit(f"bad --grid entry {item!r}; want key=v1,v2,...")
        grid[key] = vals.split(",")
    return grid


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--grid", nargs="+", required=True,
                   help="key=v1,v2 ... (flags of cli.train, no leading --)")
    p.add_argument("--out_json", default=None)
    args, passthrough = p.parse_known_args(argv)
    passthrough = [a for a in passthrough if a != "--"]

    from hessian_llm_vision_tpu.cli import train as train_cli

    grid = parse_grid(args.grid)
    keys = list(grid)
    results = []
    for combo in itertools.product(*(grid[k] for k in keys)):
        point = dict(zip(keys, combo))
        cli_args = list(passthrough)
        for k, v in point.items():
            cli_args += [f"--{k}", v]
        print(f"=== sweep point {point} ===")
        try:
            loss = float(train_cli.main(cli_args))
            if not math.isfinite(loss):  # diverged (NaN) counts as failed
                loss = float("inf")
        except SystemExit:
            raise
        except Exception as e:  # a diverged point must not kill the sweep
            print(f"point failed: {type(e).__name__}: {e}")
            loss = float("inf")
        results.append({"point": point, "final_loss": loss})

    results.sort(key=lambda r: r["final_loss"])
    print(json.dumps(results, indent=2, default=str))
    if args.out_json:
        import os

        # an hours-long sweep must not lose its table to a missing dir
        os.makedirs(os.path.dirname(os.path.abspath(args.out_json)),
                    exist_ok=True)
        with open(args.out_json, "w") as f:
            json.dump(results, f, indent=2, default=str)
    return results


if __name__ == "__main__":
    main()
