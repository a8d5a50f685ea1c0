"""Shared CLI plumbing: common argparse flags + backend selection.

The heavy lifting lives in sibling modules — cli/workloads.py (model/
data/loss registry) and cli/precision.py (precision resolution) — and is
re-exported here so every existing ``from ...cli.common import X`` keeps
working (the CLIs, tests, and examples all import through this module).
"""

from __future__ import annotations

import jax

from hessian_llm_vision_tpu.cli.workloads import (  # noqa: F401
    Workload,
    build_workload,
)
from hessian_llm_vision_tpu.cli.precision import (  # noqa: F401
    lm_loss_factory,
    referee_loss_fn_for,
    report_precision_probe,
    resolve_auto_precision,
    resolve_mixed_precision,
)


def _block_precision_arg(value: str) -> str:
    """--block_precision values: the named tiers or a jax dot-algorithm
    preset (validated by models.precision's rule: uppercase preset names
    pass through; jax itself rejects unknown presets at scope entry)."""
    import argparse

    if value in ("default", "high", "highest") or (
        isinstance(value, str) and value.isupper()
    ):
        return value
    raise argparse.ArgumentTypeError(
        f"invalid block precision {value!r}: expected default | high | "
        "highest or a jax dot-algorithm preset name (e.g. BF16_BF16_F32_X6)"
    )


def add_common_args(parser) -> None:
    """Flag names follow the reference argparse surface
    (accum.py:15-28, gpt2_savehessian.py:12-19, train_savespec.py:23-42)."""
    parser.add_argument("--model", default="gpt2-tiny",
                        help="gpt2 | gpt2-tiny | gpt2-moe | pythia-70m | pythia-160m | "
                        "pythia-1.4b | llama-tiny | llama-micro | llama-134m | llama-7b | "
                        "spiral | simplenet | vgg16 | resnet50")
    parser.add_argument("--dataset", default="random",
                        help="wikipedia | random | markov | local:<path> "
                        "(byte-level corpus from on-disk text) for LMs; "
                        "builtin for vision")
    parser.add_argument("--batch_size", type=int, default=8)
    parser.add_argument("--subsample", type=float, default=1.0)
    parser.add_argument("--max_length", type=int, default=64)
    parser.add_argument("--num_batches", type=int, default=None,
                        help="batch-count cap: synthetic datasets generate "
                        "this many (default 4); local:<path> corpora are "
                        "truncated to it (default: whole corpus)")
    parser.add_argument("--allow_fallback", action="store_true",
                        help="permit the wikipedia->random-tokens fallback "
                        "(offline dev); without it a failed hub load is an "
                        "error, never silent noise-training")
    parser.add_argument("--random_mask", action="store_true",
                        help="random attention masks on synthetic tokens "
                        "(the Hessian-of-noise probe, gpt2_savehessian_noise.py)")
    parser.add_argument("--attn_block_q", type=int, default=None,
                        help="blockwise-attention query-block size for LMs "
                        "(memory-light curvature path, models/attention.py); "
                        "default dense")
    parser.add_argument("--block_precision", default=None,
                        type=_block_precision_arg,
                        help="matmul precision override for the transformer "
                        "blocks only: default | high | highest, or a jax "
                        "dot-algorithm preset (e.g. BF16_BF16_F32_X6 — the "
                        "trained-checkpoint faithful tier, "
                        "krylov/autoprec.py).  Mixed curvature mode = outer "
                        "'high' + blocks 'default'; unset inherits")
    parser.add_argument("--loss_chunk", type=int, default=None,
                        help="chunked-vocab LM loss: never materialize the "
                        "(B,T,V) logits; chunk size in sequence positions")
    parser.add_argument("--experts", type=int, default=0,
                        help="gpt2 family only: replace every block's MLP "
                        "with a dense softmax-gated MoE of this many "
                        "experts (models/moe.py; expert weights shard over "
                        "an 'ep' mesh axis on multi-chip)")
    parser.add_argument("--moe_top_k", type=int, default=0,
                        help="with --experts: route each token to its top-k "
                        "experts through fixed-capacity buffers (GShard "
                        "semantics) instead of the dense softmax mix. "
                        "Sparse COMPUTE, but piecewise-constant routing — "
                        "curvature jobs over a top-k config get a loud "
                        "TopKCurvatureWarning (models/moe.py)")
    parser.add_argument("--moe_capacity_factor", type=float, default=1.25,
                        help="with --moe_top_k: expert capacity slack "
                        "factor (buffer = ceil(k*N/E * factor))")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--data_seed", type=int, default=42)
    parser.add_argument("--checkpoint", default=None)
    parser.add_argument("--precision_plan", default=None,
                        help="persisted auto-precision plan file (default: "
                        "<--checkpoint>.autoprec.json when --checkpoint is "
                        "set) — a fingerprint-matched plan resolves "
                        "--hvp_precision/--refresh_precision auto with zero "
                        "probe HVPs (krylov/precplan.py)")
    parser.add_argument("--reprobe", action="store_true",
                        help="ignore any persisted auto-precision plan and "
                        "re-probe this checkpoint (overwrites the plan file)")
    parser.add_argument("--bf16", action="store_true")
    parser.add_argument("--bn_train_mode", action="store_true")
    parser.add_argument("--classes", type=int, nargs="*", default=None)
    parser.add_argument("--augment", action="store_true",
                        help="RandomCrop(4)+flip on vision data "
                        "(train_savespec.py:23-42). Multi-epoch training "
                        "redraws crops/flips per epoch keyed on "
                        "(data_seed, epoch) — the reference's torchvision "
                        "loader semantics; curvature/spectrum jobs see the "
                        "fixed epoch-0 draw (a deterministic operator)")
    parser.add_argument("--noise", type=float, default=0.0,
                        help="AddGaussianNoise std on vision data "
                        "(train_savespec.py:46-55)")
    parser.add_argument("--width", type=int, default=64)
    parser.add_argument("--depth", type=int, default=3)
    parser.add_argument("--num_points", type=int, default=600)
    parser.add_argument("--spiral_noise", type=float, default=0.2)
    parser.add_argument("--out", default="runs")
    parser.add_argument("--cpu", action="store_true",
                        help="force CPU backend (useful under the TPU tunnel)")




def maybe_force_cpu(args) -> None:
    if getattr(args, "cpu", False):
        jax.config.update("jax_platforms", "cpu")
        return
    if jax.default_backend() == "cpu":
        # NEVER persist CPU compiles: XLA:CPU AOT artifacts bake the build
        # machine's vector features and LOADING one on a different host
        # SIGILLs/segfaults (observed: a CLI test without --cpu enabled
        # the cache process-wide under the tests' forced-CPU backend, and
        # a later unrelated test crashed loading a stale cross-machine
        # entry).  CPU compiles are fast; only remote TPU compiles need
        # the cache.
        return
    else:
        # persistent compile cache: remote TPU compiles of 124M-scale
        # programs take minutes cold, seconds cached (bench.py pattern)
        import os

        cache = os.environ.get(
            "JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache"
        )
        try:
            os.makedirs(cache, exist_ok=True)
            jax.config.update("jax_compilation_cache_dir", cache)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        except Exception:
            pass  # cache is an optimization, never a failure
