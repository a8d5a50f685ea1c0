"""Shared model/data/loss construction for the CLI entries.

The reference is script-per-experiment (~30 scripts each re-pasting the
same pipeline, SURVEY.md §0); every CLI here goes through this registry
instead.  Works fully offline: LM datasets fall back to seeded random
tokens when the HF cache is unavailable (zero-egress environment), vision
to the mounted MNIST / synthetic generators.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp


@dataclasses.dataclass
class Workload:
    name: str
    model: Any
    params: Any
    loss_fn: Callable[[Any, Any], jax.Array]
    batches: list  # list of device-ready batches
    batch_size: int
    apply_fn: Optional[Callable] = None  # classifier apply for accuracy eval
    labels: Optional[Any] = None
    # for GGN/Fisher operators: model_fn(params, batch)->outputs and
    # out_loss_fn(outputs, batch)->scalar (loss_fn == out_loss_fn(model_fn))
    model_fn: Optional[Callable] = None
    out_loss_fn: Optional[Callable] = None
    # per-epoch stochastic data: make_batches(epoch) -> fresh batch list
    # (vision --augment/--noise redraw crops/flips/noise per epoch, the
    # reference's torchvision-transform semantics, train_savespec.py:46-55;
    # epoch 0 == wl.batches so curvature jobs see a fixed dataset)
    make_batches: Optional[Callable[[int], list]] = None


def _lm_batches(args, vocab_size) -> list:
    from hessian_llm_vision_tpu.data import random_token_batches

    made = False
    if args.dataset.startswith("local:"):
        from hessian_llm_vision_tpu.data import load_local_corpus

        stacked = load_local_corpus(
            args.dataset[len("local:"):],
            max_length=args.max_length,
            batch_size=args.batch_size,
            subsample=args.subsample,
            seed=args.data_seed,
        )
        # --num_batches caps the loaded corpus too (consistent flag
        # semantics across datasets): a default --subsample 1.0 otherwise
        # loads the whole corpus (~4k batches at bs8/seq512) and multiplies
        # host-loop spectrum cost per Lanczos iteration.
        nb = getattr(args, "num_batches", None)
        if nb is not None and int(nb) > 0:
            nb = int(nb)
            if stacked["input_ids"].shape[0] > nb:
                print(
                    f"[data] local corpus: capping "
                    f"{stacked['input_ids'].shape[0]} -> {nb} batches "
                    "(--num_batches; omit it to load the whole corpus)"
                )
                stacked = {k: v[:nb] for k, v in stacked.items()}
        made = True
    if args.dataset == "wikipedia":
        try:
            from transformers import GPT2TokenizerFast

            from hessian_llm_vision_tpu.data import load_lm_dataset

            tok = GPT2TokenizerFast.from_pretrained("gpt2")
            stacked = load_lm_dataset(
                "wikipedia",
                "20220301.simple",
                tokenizer=tok,
                subsample=args.subsample,
                seed=args.data_seed,
                max_length=args.max_length,
                batch_size=args.batch_size,
            )
            made = True
        except Exception as e:
            # Loud by default: a typo'd dataset name in a real deployment
            # must not silently train on noise.  The zero-egress test/dev
            # environment opts into the fallback explicitly.
            if not getattr(args, "allow_fallback", False):
                raise SystemExit(
                    f"dataset 'wikipedia' unavailable ({type(e).__name__}: "
                    f"{e}); pass --allow_fallback to proceed on seeded "
                    "random tokens, or use --dataset random/markov/"
                    "local:<path>"
                )
            print(f"[data] wikipedia unavailable ({type(e).__name__}); "
                  "falling back to seeded random tokens (--allow_fallback)")
    if not made:
        # 0/None = default size (synthetic data has no natural "whole")
        n_batches = max(1, int(getattr(args, "num_batches", None) or 4))
        if args.dataset == "markov":
            from hessian_llm_vision_tpu.data import markov_token_batches

            stacked = markov_token_batches(
                n_batches,
                args.batch_size,
                args.max_length,
                min(vocab_size, 512),  # learnable chain over a small vocab
                seed=args.data_seed,
            )
        else:
            stacked = random_token_batches(
                n_batches,
                args.batch_size,
                args.max_length,
                vocab_size,
                seed=args.data_seed,
                random_mask=getattr(args, "random_mask", False),
            )
    max_id = int(stacked["input_ids"].max())
    if max_id >= vocab_size:
        raise SystemExit(
            f"dataset token id {max_id} >= model vocab_size {vocab_size} "
            "(e.g. gpt2-tiny with the real GPT-2 tokenizer); XLA would "
            "silently clamp out-of-range ids — pick a matching model/tokenizer"
        )
    n = stacked["input_ids"].shape[0]
    return [
        {k: jnp.asarray(v[i]) for k, v in stacked.items()} for i in range(n)
    ]


def _cfg_overrides(cfg, attn_blk, block_prec, bf16=False):
    """Apply the shared LM config flags (one site for all three families)."""
    if bf16:
        cfg = dataclasses.replace(cfg, dtype=jnp.bfloat16)
    if attn_blk:
        cfg = dataclasses.replace(cfg, attn_block_q=attn_blk)
    if block_prec:
        cfg = dataclasses.replace(cfg, block_matmul_precision=block_prec)
    return cfg


def build_workload(args) -> Workload:
    from hessian_llm_vision_tpu.models import (
        GPT2Config,
        GPT2LMHead,
        NeoXLMHead,
        PYTHIA_CONFIGS,
        SimpleNet,
        SpiralMLP,
        VGG16,
        ResNet50,
        losses,
    )

    key = jax.random.PRNGKey(args.seed)
    name = args.model

    attn_blk = getattr(args, "attn_block_q", None)
    loss_chunk = getattr(args, "loss_chunk", None)
    block_prec = getattr(args, "block_precision", None)
    experts = getattr(args, "experts", 0) or 0

    # --experts swaps the GPT-2 MLPs for the dense-gated MoE (models/moe.py)
    if experts and not name.startswith("gpt2"):
        raise SystemExit(
            "--experts applies to the gpt2 family only; "
            f"model {name!r} has no MoE variant"
        )
    moe_top_k = getattr(args, "moe_top_k", 0) or 0
    if moe_top_k and not experts:
        raise SystemExit("--moe_top_k requires --experts N")

    # LM-only knobs must not silently no-op on vision/spiral models (the
    # loud-flags policy: a user asking for the mixed curvature mode or the
    # memory-light attention plan must get it or an error, never neither)
    if not name.startswith(("gpt2", "pythia", "llama")):
        dropped = [
            flag
            for flag, set_ in [
                ("--attn_block_q", attn_blk is not None),
                ("--block_precision (or --*_precision mixed)",
                 block_prec is not None),
                ("--loss_chunk", loss_chunk is not None),
            ]
            if set_
        ]
        if dropped:
            raise SystemExit(
                f"{', '.join(dropped)} apply to LM models only; "
                f"model {name!r} has no transformer-block/vocab path"
            )

    if name.startswith("gpt2"):
        if name == "gpt2-tiny":
            cfg = GPT2Config.tiny(n_positions=max(64, args.max_length))
        elif name == "gpt2-moe":
            cfg = GPT2Config.moe_80m(
                n_positions=max(args.max_length, 32),
                dtype=jnp.bfloat16 if args.bf16 else jnp.float32,
            )
        else:
            cfg = GPT2Config.gpt2_124m(
                n_positions=max(args.max_length, 32),
                dtype=jnp.bfloat16 if args.bf16 else jnp.float32,
            )
        cfg = _cfg_overrides(cfg, attn_blk, block_prec)
        if experts:
            cfg = dataclasses.replace(cfg, n_experts=experts)
        if moe_top_k:
            cfg = dataclasses.replace(
                cfg, moe_top_k=moe_top_k,
                moe_capacity_factor=getattr(
                    args, "moe_capacity_factor", 1.25
                ),
            )
        model = GPT2LMHead(cfg)
        params = model.init_params(key, seq_len=min(16, args.max_length))
        if args.checkpoint:
            from hessian_llm_vision_tpu.io import load_checkpoint

            params = load_checkpoint(args.checkpoint, template=params)
        def lm_model_fn(p, b, _model=model):
            return _model.apply({"params": p}, b["input_ids"])

        def lm_out_loss(logits, b):
            return losses.causal_lm_loss(
                logits, b["input_ids"], b.get("attention_mask")
            )

        return Workload(
            name,
            model,
            params,
            losses.lm_loss_fn(model, loss_chunk=loss_chunk),
            _lm_batches(args, cfg.vocab_size),
            args.batch_size,
            model_fn=lm_model_fn,
            out_loss_fn=lm_out_loss,
        )

    if name.startswith("pythia"):
        cfg = _cfg_overrides(
            cfg=PYTHIA_CONFIGS[name], attn_blk=attn_blk,
            block_prec=block_prec, bf16=args.bf16,
        )
        model = NeoXLMHead(cfg)
        params = model.init_params(key, seq_len=min(16, args.max_length))
        if args.checkpoint:
            from hessian_llm_vision_tpu.io import load_checkpoint

            params = load_checkpoint(args.checkpoint, template=params)
        def lm_model_fn(p, b, _model=model):
            return _model.apply({"params": p}, b["input_ids"])

        def lm_out_loss(logits, b):
            return losses.causal_lm_loss(
                logits, b["input_ids"], b.get("attention_mask")
            )

        return Workload(
            name,
            model,
            params,
            losses.lm_loss_fn(model, loss_chunk=loss_chunk),
            _lm_batches(args, cfg.vocab_size),
            args.batch_size,
            model_fn=lm_model_fn,
            out_loss_fn=lm_out_loss,
        )

    if name.startswith("llama"):
        from hessian_llm_vision_tpu.models import LLAMA_CONFIGS, LlamaLMHead

        cfg = _cfg_overrides(
            cfg=LLAMA_CONFIGS[name], attn_blk=attn_blk,
            block_prec=block_prec, bf16=args.bf16,
        )
        model = LlamaLMHead(cfg)
        params = model.init_params(key, seq_len=min(16, args.max_length))
        if args.checkpoint:
            from hessian_llm_vision_tpu.io import load_checkpoint

            params = load_checkpoint(args.checkpoint, template=params)

        def lm_model_fn(p, b, _model=model):
            return _model.apply({"params": p}, b["input_ids"])

        def lm_out_loss(logits, b):
            return losses.causal_lm_loss(
                logits, b["input_ids"], b.get("attention_mask")
            )

        return Workload(
            name,
            model,
            params,
            losses.lm_loss_fn(model, loss_chunk=loss_chunk),
            _lm_batches(args, cfg.vocab_size),
            args.batch_size,
            model_fn=lm_model_fn,
            out_loss_fn=lm_out_loss,
        )

    if name in ("mlp", "spiral"):
        from hessian_llm_vision_tpu.data import make_spirals

        x, y = make_spirals(
            args.num_points, noise=args.spiral_noise, seed=args.data_seed
        )
        model = SpiralMLP(width=args.width, depth=args.depth)
        params = model.init(key, x[:4])["params"]
        loss_fn = losses.classification_loss_fn(model)

        n = (len(x) // args.batch_size) * args.batch_size
        xs = jnp.asarray(x[:n]).reshape(-1, args.batch_size, 2)
        ys = jnp.asarray(y[:n]).reshape(-1, args.batch_size)
        def cls_model_fn(p, b, _model=model):
            return _model.apply({"params": p}, b[0])

        def cls_out_loss(logits, b):
            return losses.softmax_cross_entropy(logits, b[1])

        return Workload(
            name,
            model,
            params,
            loss_fn,
            [(xs[i], ys[i]) for i in range(xs.shape[0])],
            args.batch_size,
            apply_fn=lambda p, xx: model.apply({"params": p}, xx),
            model_fn=cls_model_fn,
            out_loss_fn=cls_out_loss,
        )

    if name in ("simplenet", "mnist"):
        from hessian_llm_vision_tpu.data import load_mnist

        x, y = load_mnist("test")
        sel = slice(0, int(len(x) * args.subsample) or args.batch_size)
        x, y = x[sel], y[sel]
        model = SimpleNet()
        params = model.init(key, jnp.zeros((1, 28, 28, 1)))["params"]
        loss_fn = losses.classification_loss_fn(model)

        n = (len(x) // args.batch_size) * args.batch_size
        xs = jnp.asarray(x[:n]).reshape(-1, args.batch_size, 28, 28, 1)
        ys = jnp.asarray(y[:n]).reshape(-1, args.batch_size)
        def cls_model_fn(p, b, _model=model):
            return _model.apply({"params": p}, b[0])

        def cls_out_loss(logits, b):
            return losses.softmax_cross_entropy(logits, b[1])

        return Workload(
            name,
            model,
            params,
            loss_fn,
            [(xs[i], ys[i]) for i in range(xs.shape[0])],
            args.batch_size,
            apply_fn=lambda p, xx: model.apply({"params": p}, xx),
            model_fn=cls_model_fn,
            out_loss_fn=cls_out_loss,
        )

    if name in ("vgg16", "resnet50"):
        import numpy as np

        from hessian_llm_vision_tpu.data import (
            add_gaussian_noise,
            augment_batch,
            get_class_subset,
            load_cifar10,
            load_mnist_as_cifar,
            random_image_batches,
        )

        try:
            x, y = load_cifar10("train")
        except FileNotFoundError:
            # fall back to REAL data before noise: MNIST bridged to the
            # 32x32x3 contract (this environment has MNIST on disk but no
            # CIFAR pickles) — the spectra stay spectra of a real problem.
            try:
                try:
                    x, y = load_mnist_as_cifar("train")
                except FileNotFoundError:
                    # some deployments carry only the t10k idx files
                    x, y = load_mnist_as_cifar("test")
                print("[data] CIFAR-10 unavailable; using real MNIST "
                      "upscaled to 32x32x3")
            except FileNotFoundError:
                print("[data] CIFAR-10 and MNIST unavailable; "
                      "falling back to random images")
                x = y = None
        if x is not None:
            if args.classes:
                x, y = get_class_subset(x, y, args.classes)
            n_take = int(len(x) * args.subsample) or args.batch_size
            # --num_batches caps real vision data too (same flag semantics
            # as the LM/local-corpus paths: 0/None = no cap, never empty)
            if args.num_batches:
                n_take = min(n_take, int(args.num_batches) * args.batch_size)
            x, y = x[:n_take], y[:n_take]
            num_classes = len(args.classes) if args.classes else 10
        else:
            # 0/None = default size (synthetic data has no natural "whole")
            nb = max(1, int(args.num_batches or 4))
            xb, yb = random_image_batches(nb, args.batch_size, seed=args.data_seed)
            x = xb.reshape(-1, 32, 32, 3)
            y = yb.reshape(-1)
            num_classes = 10
        # reference transforms: --augment (RandomCrop+flip) / --noise
        # (AddGaussianNoise), train_savespec.py:23-55.  The reference
        # resamples PER EXAMPLE PER EPOCH (torchvision transform in the
        # loader); _transform(epoch) reproduces that — epoch 0 is the
        # fixed draw curvature jobs see, training re-draws each epoch via
        # Workload.make_batches (train/loop.py::EpochResampledBatches).
        x_raw = np.asarray(x) if (
            getattr(args, "augment", False) or getattr(args, "noise", 0.0)
        ) else None

        def _transform(epoch: int):
            xa = x_raw
            seed = args.data_seed + 100003 * epoch
            if getattr(args, "augment", False):
                xa = augment_batch(xa, seed=seed)
            if getattr(args, "noise", 0.0):
                xa = add_gaussian_noise(xa, std=args.noise, seed=seed)
            return xa

        if x_raw is not None:
            x = _transform(0)
        if name == "vgg16":
            model = VGG16(num_classes=num_classes)
            params = model.init(key, jnp.zeros((1, 32, 32, 3)))["params"]
            loss_fn = losses.classification_loss_fn(model)
        else:
            model = ResNet50(num_classes=num_classes)
            variables = model.init(
                key, jnp.zeros((1, 32, 32, 3)), use_running_average=False
            )
            params = variables["params"]
            loss_fn = losses.classification_loss_fn_bn(
                model, variables["batch_stats"], bn_train_mode=args.bn_train_mode
            )
        n = (len(x) // args.batch_size) * args.batch_size

        def _to_batches(xa):
            xs = jnp.asarray(xa[:n]).reshape(-1, args.batch_size, 32, 32, 3)
            ys = jnp.asarray(y[:n]).reshape(-1, args.batch_size)
            return [(xs[i], ys[i]) for i in range(xs.shape[0])]

        return Workload(
            name,
            model,
            params,
            loss_fn,
            _to_batches(x),
            args.batch_size,
            make_batches=(
                (lambda epoch: _to_batches(_transform(epoch)))
                if x_raw is not None else None
            ),
        )

    raise ValueError(f"unknown model {name!r}")


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
                        choices=["default", "high", "highest"],
                        help="matmul precision override for the transformer "
                        "blocks only (mixed curvature mode: outer 'high' + "
                        "blocks 'default'); default inherits")
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


def resolve_mixed_precision(args, attr: str) -> None:
    """Expand the 'mixed' precision sugar on ``args.<attr>`` in place.

    ONE definition for every CLI (spectrum --hvp_precision, train
    --refresh_precision): 'mixed' = outer context (embeddings + vocab head
    + loss) 'high' (bf16x3) with the transformer blocks at 'default'
    (1-pass bf16) — the blocks carry ~71% of HVP FLOPs and tolerate it
    (extreme-Ritz err <=5e-4 measured; bench.py cross-checks every run).
    """
    if getattr(args, attr, None) == "mixed":
        setattr(args, attr, "high")
        if not getattr(args, "block_precision", None):
            args.block_precision = "default"


def report_precision_probe(stats: dict, iters: int, *, what: str,
                           hint: str, bar: float = 2e-3) -> None:
    """ONE report/threshold/WARNING block for every --precision_check CLI
    (spectrum gates its HVP precision, train its refresh precision) — the
    2e-3 extreme-Ritz parity bar lives here and nowhere else."""
    import sys

    print(
        f"[precision] {what} extreme-Ritz rel err vs f32 referee "
        f"({iters} iters): {stats['ritz_rel_err']:.3e}  "
        f"(matvec rel err {stats['rel_err']:.3e}; "
        f"{stats['seconds_requested']:.2f}s vs {stats['seconds_referee']:.2f}s "
        f"per HVP)",
        flush=True,
    )
    if stats["ritz_rel_err"] > bar:
        print(
            f"[precision] WARNING: extreme-Ritz error "
            f"{stats['ritz_rel_err']:.3e} exceeds the {bar:g} parity bar at "
            f"THIS checkpoint — {hint}",
            file=sys.stderr,
            flush=True,
        )


def lm_loss_factory(wl: Workload, args) -> Optional[Callable]:
    """``make_loss_fn(block_spec)`` for the auto-precision planner.

    Rebuilds ONLY the model (with ``block_matmul_precision=block_spec``)
    and its loss closure, reusing the workload's params/batches — the
    planner probes several arms and must not re-load checkpoints/data per
    arm.  Returns None when the model has no block-precision surface
    (vision/MLP families).
    """
    cfg = getattr(wl.model, "config", None)
    if cfg is None or not hasattr(cfg, "block_matmul_precision"):
        return None
    from hessian_llm_vision_tpu.krylov import spec_to_overrides
    from hessian_llm_vision_tpu.models import losses

    model_cls = type(wl.model)
    loss_chunk = getattr(args, "loss_chunk", None)

    def make_loss_fn(spec):
        m = model_cls(dataclasses.replace(cfg, **spec_to_overrides(spec)))
        return losses.lm_loss_fn(m, loss_chunk=loss_chunk)

    return make_loss_fn


def resolve_auto_precision(args, wl: Workload, attr: str = "hvp_precision",
                           *, tol: float = 1e-3) -> Workload:
    """Expand ``--<attr> auto`` by probing the checkpoint (krylov/autoprec).

    Probes the actual params/batch in escalating block-precision arms
    against an f32 referee and resolves ``args.<attr>`` +
    ``args.block_precision`` to the FASTEST configuration meeting the
    1e-3 extreme-Ritz parity bar — fast 'mixed' where it is safe (random
    init), prefix-escalated or strict where the checkpoint demands it
    (trained ckpts inflate mixed λmax 5.8×, artifacts/trained124m_r3).
    Returns the workload with its loss rebuilt per the plan.  No-op when
    ``args.<attr> != 'auto'``.
    """
    if getattr(args, attr, None) != "auto":
        if getattr(args, "reprobe", False) or getattr(
            args, "precision_plan", None
        ):
            raise SystemExit(
                f"--reprobe/--precision_plan have no effect without "
                f"--{attr} auto"
            )
        return wl
    if getattr(args, "block_precision", None):
        raise SystemExit(
            f"--block_precision conflicts with --{attr} auto (auto CHOOSES "
            "the block precisions; pin --hvp_precision high/mixed/default "
            "to combine with an explicit --block_precision)"
        )
    factory = lm_loss_factory(wl, args)
    if factory is None or getattr(args, "operator", "hessian") != "hessian":
        why = (
            "non-LM model: no transformer-block precision surface"
            if factory is None
            else f"--operator {args.operator}: the probe gates the Hessian "
            "program only"
        )
        print(f"[auto-precision] {why}; resolving to 'high'")
        setattr(args, attr, "high")
        return wl
    from hessian_llm_vision_tpu.krylov import (
        auto_precision_plan,
        default_candidates,
        spec_to_overrides,
    )

    cfg = wl.model.config
    # measured cost-ordered ladder: mixed -> strict-high -> blocks-X6
    # (krylov/autoprec.py::default_candidates; depth-prefix and 1-pass
    # op-split arms all fail on trained ckpts without beating mixed)
    candidates = default_candidates()
    probe_batch = wl.batches[0]
    _leaves = jax.tree_util.tree_leaves(probe_batch)
    if _leaves and _leaves[0].shape[0] > 4:
        # cap the probe at 4 sequences: the reorthogonalized probe holds
        # a (ritz_iters, P) bf16 basis + three f32 P-vectors NEXT TO the
        # HVP working set — at bs8/124M that sums to ~16.5 GB and OOMs
        # the 16 GB chip (measured).  Precision error is an operand-scale
        # property of the CHECKPOINT, not of the batch size; bs4 is the
        # protocol the arms studies certified (artifacts/trained124m_r4),
        # and the sliced shapes ride their compile cache.
        probe_batch = jax.tree_util.tree_map(lambda x: x[:4], probe_batch)
    # persisted-plan fast path (krylov/precplan.py): a fingerprint +
    # context hit resolves the tier with ZERO probe HVPs.  Plan file:
    # --precision_plan PATH, else a sibling of --checkpoint; in-memory
    # checkpoints (init params) have no natural home -> probe every run.
    from hessian_llm_vision_tpu.krylov.precplan import (
        default_plan_path,
        load_plan,
        params_fingerprint,
        plan_context,
        save_plan,
    )

    ritz_iters = getattr(args, "precision_check_iters", 10)
    plan_path = getattr(args, "precision_plan", None)
    if plan_path is None and getattr(args, "checkpoint", None):
        plan_path = default_plan_path(args.checkpoint)
    plan = fp = ctx = None
    if plan_path:
        fp = params_fingerprint(wl.params)
        ctx = plan_context(
            model_config=cfg,
            probe_batch=probe_batch,
            tol=tol,
            ritz_iters=ritz_iters,
            candidate_labels=tuple(label for label, _ in candidates),
        )
        if not getattr(args, "reprobe", False):
            plan = load_plan(plan_path, fingerprint=fp, context=ctx)
            if plan is not None:
                print(
                    f"[auto-precision] reusing persisted plan {plan_path} "
                    f"(params fingerprint + context match, 0 probe HVPs): "
                    f"{plan.label} (err {plan.ritz_rel_err:.2e} at probe "
                    "time; --reprobe to re-measure)"
                )
    if plan is None:
        plan = auto_precision_plan(
            factory,
            wl.params,
            probe_batch,
            key=jax.random.PRNGKey(getattr(args, "vector_seed", 0) + 101),
            tol=tol,
            ritz_iters=ritz_iters,
            candidates=candidates,
            log=print,
        )
        print(plan.describe())
        if plan_path:
            save_plan(
                plan_path, plan, fingerprint=fp, context=ctx,
                provenance={
                    "vector_seed": getattr(args, "vector_seed", 0),
                    "source": "cli.resolve_auto_precision",
                    "checkpoint": getattr(args, "checkpoint", None),
                },
            )
            print(f"[auto-precision] plan -> {plan_path}")
    setattr(args, attr, plan.hvp_precision)
    args.block_precision = plan.block_precision
    new_model = type(wl.model)(
        dataclasses.replace(cfg, **spec_to_overrides(plan.block_precision))
    )
    return dataclasses.replace(
        wl,
        model=new_model,
        loss_fn=factory(plan.block_precision),
    )


def referee_loss_fn_for(args):
    """A clean-model loss for the f32 referee arm of --precision_check.

    Returns None when no block precision is baked into the model (the
    probe's outer 'highest' context then suffices).  Otherwise rebuilds the
    workload with ``block_matmul_precision=None`` — the model's inner
    ``jax.default_matmul_precision`` scope overrides any outer context, so
    without this BOTH probe arms would run bf16 blocks and the probe would
    falsely pass on exactly the 'mixed' mode it exists to catch.  The
    rebuild re-loads checkpoint/data only to be discarded — wasteful but
    correct for a diagnostic; the probe's cost is dominated by the referee
    compile either way.
    """
    if not getattr(args, "block_precision", None):
        return None
    import copy

    ref_args = copy.copy(args)
    ref_args.block_precision = None
    return build_workload(ref_args).loss_fn


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
