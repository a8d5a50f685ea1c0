"""Evaluation CLI — per-batch losses and accuracy, no grad.

The reference's loss-per-batch evaluator (/root/reference/loss-llama.ipynb
cells 6-8: no-grad sweep saving per-batch LM losses to pickle) plus the
per-task accuracy evals scattered through its training scripts.

Example:
  python -m hessian_llm_vision_tpu.cli.evaluate --model gpt2-tiny \
      --num_batches 8 --out_losses /tmp/losses.pkl --cpu
"""

from __future__ import annotations

import argparse
import pickle

import numpy as np

from hessian_llm_vision_tpu.cli.common import (
    add_common_args,
    build_workload,
    maybe_force_cpu,
)


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    add_common_args(p)
    p.add_argument("--out_losses", default=None, help="pickle of per-batch losses")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    maybe_force_cpu(args)

    from hessian_llm_vision_tpu.train import evaluate_accuracy, per_batch_losses

    wl = build_workload(args)
    losses = per_batch_losses(wl.loss_fn, wl.params, wl.batches)
    print(f"{len(losses)} batches: mean {losses.mean():.4f}  "
          f"min {losses.min():.4f}  max {losses.max():.4f}")
    if wl.apply_fn is not None:
        acc = evaluate_accuracy(wl.apply_fn, wl.params, wl.batches)
        print(f"accuracy: {acc:.4f}")
    if args.out_losses:
        with open(args.out_losses, "wb") as f:
            pickle.dump({"per_batch_losses": np.asarray(losses)}, f)
        print(f"losses -> {args.out_losses}")
    return losses


if __name__ == "__main__":
    main()
