"""Persisted auto-precision plans: probe a checkpoint ONCE, reuse forever.

``--hvp_precision auto`` (krylov/autoprec.py) probes up to the whole
candidate ladder — 2x``ritz_iters`` HVPs per arm plus an f32 referee —
on EVERY invocation for the same checkpoint.  The jax compilation cache
amortizes the compiles but not the probe HVPs (~40 extra 124M HVPs per
spectrum run, VERDICT r4 #5).  Precision fidelity is a property of the
CHECKPOINT (operand scales) + model/batch configuration, not of the run,
so the verdict is cacheable: this module persists the winning
:class:`~hessian_llm_vision_tpu.krylov.autoprec.AutoPrecisionPlan`
(with every probed arm as evidence) keyed by

* a **params fingerprint** — per-leaf (sum, abs-sum, shape) reduced on
  device in one tiny program and hashed; any retrained/perturbed
  checkpoint changes it, and a backend change (CPU vs TPU reductions)
  conservatively invalidates it too;
* a **context** — model config (with the precision field the plan itself
  decides neutralized), probe batch shapes, tolerance and probe depth,
  candidate-ladder labels.

A later ``spectrum``/``train`` run on the same checkpoint loads the plan,
prints a provenance line, and pays ZERO probe HVPs; ``--reprobe`` forces
a fresh probe and overwrites the file.  Reference role: none (TPU-native
feature) — the reference's CUDA matmuls are f32-native and never faced
the precision choice (SURVEY.md §2.6).
"""

from __future__ import annotations

import dataclasses
import functools
import hashlib
import json
import os
import time
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp

from hessian_llm_vision_tpu.krylov.autoprec import AutoPrecisionPlan, PrecisionArm

PLAN_VERSION = 1


@functools.lru_cache(maxsize=4)
def _fingerprint_program():
    @jax.jit
    def stats(params):
        leaves = jax.tree_util.tree_leaves(params)
        return jnp.stack(
            [
                jnp.stack(
                    [
                        jnp.sum(x.astype(jnp.float32)),
                        jnp.sum(jnp.abs(x.astype(jnp.float32))),
                    ]
                )
                for x in leaves
            ]
        )

    return stats


def params_fingerprint(params: Any) -> str:
    """Content hash of a params pytree: structure + shapes + per-leaf sums.

    One jitted device program (reads every param once, returns 2 floats
    per leaf) — negligible next to a single probe HVP.  The f32 sums are
    hashed bit-exactly: identical checkpoints on the same backend collide,
    anything else (different training step, different arch, different
    backend's reduction order) re-probes.
    """
    import numpy as np

    treedef = jax.tree_util.tree_structure(params)
    shapes = [
        (x.shape, str(x.dtype)) for x in jax.tree_util.tree_leaves(params)
    ]
    stats = np.asarray(_fingerprint_program()(params))
    h = hashlib.sha256()
    h.update(str(treedef).encode())
    h.update(repr(shapes).encode())
    h.update(stats.tobytes())
    return "sha256:" + h.hexdigest()


def checkpoint_fingerprint(path: str) -> Optional[str]:
    """Content hash of an on-disk (Orbax) checkpoint — zero device work.

    Preferred over :func:`params_fingerprint` when the params came from a
    ``--checkpoint`` path: identical bytes on disk mean identical params
    on ANY backend, and it needs no device program at all (the per-leaf
    reduction program is one more remote-tunnel compile that can hang a
    job on this image's flaky compile service — observed round 5).

    Hashes every file's relative path + size, the full bytes of small
    (<1 MB) metadata files, and the first/last 64 KiB of large array
    files — any real checkpoint change moves array bytes at the sampled
    offsets or the metadata.  Returns None when the path is unusable
    (caller falls back to the device fingerprint).
    """
    if not os.path.isdir(path):
        return None
    h = hashlib.sha256()
    n_files = 0
    for root, dirs, files in os.walk(path):
        dirs.sort()
        for name in sorted(files):
            fp = os.path.join(root, name)
            rel = os.path.relpath(fp, path)
            try:
                size = os.path.getsize(fp)
                h.update(rel.encode())
                h.update(str(size).encode())
                with open(fp, "rb") as f:
                    if size <= 1 << 20:
                        h.update(f.read())
                    else:
                        h.update(f.read(65536))
                        f.seek(-65536, os.SEEK_END)
                        h.update(f.read(65536))
                n_files += 1
            except OSError:
                return None
    if n_files == 0:
        return None
    return "sha256-ckpt:" + h.hexdigest()


def _encode_spec(spec: Any) -> dict:
    """JSON-safe encoding of a block-precision spec (see
    autoprec.spec_to_overrides: None | str | per-layer tuple | dict)."""
    if spec is None:
        return {"kind": "none"}
    if isinstance(spec, str):
        return {"kind": "str", "value": spec}
    if isinstance(spec, dict):
        return {"kind": "dict", "value": dict(spec)}
    return {"kind": "tuple", "value": list(spec)}


def _decode_spec(d: dict) -> Any:
    kind = d["kind"]
    if kind == "none":
        return None
    if kind == "str":
        return d["value"]
    if kind == "dict":
        return dict(d["value"])
    return tuple(d["value"])


def plan_context(
    *,
    model_config: Any = None,
    probe_batch: Any = None,
    tol: float,
    ritz_iters: int,
    candidate_labels: Tuple[str, ...] = (),
) -> dict:
    """The non-params half of the cache key.

    ``model_config``: the model's config dataclass — its
    ``block_matmul_precision`` is neutralized (the plan DECIDES it; a
    previously-resolved value must not fracture the key).  ``probe_batch``
    contributes leaf shapes/dtypes only (token values don't gate precision
    verdicts; the probe batch is a fixed-seed slice anyway).
    """
    cfg_repr = None
    if model_config is not None:
        cfg = model_config
        if dataclasses.is_dataclass(cfg) and hasattr(
            cfg, "block_matmul_precision"
        ):
            cfg = dataclasses.replace(cfg, block_matmul_precision=None)
        cfg_repr = repr(cfg)
    batch_shapes = None
    if probe_batch is not None:
        batch_shapes = [
            [list(x.shape), str(x.dtype)]
            for x in jax.tree_util.tree_leaves(probe_batch)
        ]
    return {
        "model_config": cfg_repr,
        "batch_shapes": batch_shapes,
        "tol": tol,
        "ritz_iters": ritz_iters,
        "candidate_labels": list(candidate_labels),
    }


def default_plan_path(checkpoint: str) -> str:
    """Sibling file of an (Orbax) checkpoint dir — never inside it (extra
    files in an ocdbt checkpoint dir are undefined behavior for orbax)."""
    return checkpoint.rstrip("/") + ".autoprec.json"


def save_plan(
    path: str,
    plan: AutoPrecisionPlan,
    *,
    fingerprint: str,
    context: dict,
    provenance: Optional[dict] = None,
) -> None:
    doc = {
        "version": PLAN_VERSION,
        "fingerprint": fingerprint,
        "context": context,
        "plan": {
            "label": plan.label,
            "hvp_precision": plan.hvp_precision,
            "block_precision": _encode_spec(plan.block_precision),
            "ritz_rel_err": plan.ritz_rel_err,
            "referee_extremes": [float(x) for x in plan.referee_extremes],
            "arms": [
                {
                    "label": a.label,
                    "block_precision": _encode_spec(a.block_precision),
                    "hvp_precision": a.hvp_precision,
                    "ritz_rel_err": a.ritz_rel_err,
                    "seconds_per_hvp": a.seconds_per_hvp,
                    "extremes": [float(x) for x in a.extremes],
                }
                for a in plan.arms
            ],
        },
        "provenance": {
            "created_unix": time.time(),
            "backend": jax.default_backend(),
            **(provenance or {}),
        },
    }
    tmp = path + ".tmp"
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(tmp, "w") as f:
        json.dump(doc, f, indent=1)
    os.replace(tmp, path)  # crash-safe: never a half-written plan


def load_plan(
    path: str, *, fingerprint: str, context: dict
) -> Optional[AutoPrecisionPlan]:
    """The persisted plan, or None when absent/stale/mismatched.

    Every mismatch path returns None (= re-probe) rather than raising:
    a stale plan must never block a job, only cost it the probe again.
    """
    try:
        with open(path) as f:
            doc = json.load(f)
    except (OSError, ValueError):
        return None
    if doc.get("version") != PLAN_VERSION:
        return None
    if doc.get("fingerprint") != fingerprint:
        return None
    if doc.get("context") != context:
        return None
    p = doc["plan"]
    return AutoPrecisionPlan(
        block_precision=_decode_spec(p["block_precision"]),
        hvp_precision=p["hvp_precision"],
        label=p["label"],
        ritz_rel_err=p["ritz_rel_err"],
        referee_extremes=tuple(p["referee_extremes"]),
        arms=tuple(
            PrecisionArm(
                label=a["label"],
                block_precision=_decode_spec(a["block_precision"]),
                hvp_precision=a["hvp_precision"],
                ritz_rel_err=a["ritz_rel_err"],
                seconds_per_hvp=a["seconds_per_hvp"],
                extremes=tuple(a["extremes"]),
            )
            for a in p["arms"]
        ),
    )
