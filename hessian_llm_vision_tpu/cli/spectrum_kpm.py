"""--kpm runner for the spectrum CLI: KPM density / deflated-KPM
two-scale density, metadata into the spectrum npz.  (Split out of
cli/spectrum.py in round 5 — VERDICT r4 #6.)"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np


def run_kpm(args, matvec, dim):
    """Shared --kpm runner: moments land in args._extra_meta -> the npz.

    With --kpm_deflate K: exact extremal spikes (thick restart) + KPM bulk
    of the deflated operator (krylov/deflate.py) — the kpm_* meta keys then
    describe the BULK density, plus kpm_deflate_* for the spikes."""
    from hessian_llm_vision_tpu.krylov import deflated_density, kpm_density
    from hessian_llm_vision_tpu.utils.programs import ensure_program

    t1 = time.time()
    if args.kpm_deflate:
        bf16 = args.tr_dtype == "bfloat16"
        dres = deflated_density(
            ensure_program(matvec), dim, args.kpm_deflate, args.kpm,
            jax.random.PRNGKey(args.vector_seed + 2),
            num_probes=args.kpm_probes, progress=True,
            # LLM-scale memory plan (the --thick_restart knobs): bf16
            # restart buffer AND bf16 deflation basis, looser residual bar
            tol=args.tr_tol,
            store_dtype=jnp.bfloat16 if bf16 else jnp.float32,
            deflate_dtype=jnp.bfloat16 if bf16 else None,
        )
        kres = dres.bulk
        status = "converged" if dres.converged else "NOT converged"
        print(
            f"deflated {args.kpm_deflate} extremal pairs ({status}, max "
            f"residual {dres.residuals.max():.2e}): "
            f"{np.round(np.sort(dres.eigvals), 4).tolist()}"
        )
        print(
            f"KPM bulk density ({args.kpm} moments x {args.kpm_probes} "
            f"probes on the deflated operator): bulk range "
            f"[{kres.center - kres.radius:.4f}, "
            f"{kres.center + kres.radius:.4f}], "
            f"combined E[lambda] = {dres.trace_estimate():.6e} "
            f"({time.time() - t1:.2f}s, {dres.matvecs} matvecs)"
        )
        args._extra_meta = {
            **getattr(args, "_extra_meta", {}),
            "kpm_deflate_eigvals": np.asarray(dres.eigvals),
            "kpm_deflate_residuals": np.asarray(dres.residuals),
            "kpm_deflate_converged": int(dres.converged),
            "kpm_deflate_matvecs": dres.matvecs,
        }
    else:
        kres = kpm_density(
            ensure_program(matvec), dim, args.kpm,
            jax.random.PRNGKey(args.vector_seed + 2),
            num_probes=args.kpm_probes,
        )
        print(
            f"KPM density ({args.kpm} moments x {args.kpm_probes} probes): "
            f"range [{kres.center - kres.radius:.4f}, "
            f"{kres.center + kres.radius:.4f}], "
            f"E[lambda] = {kres.trace_estimate():.6e} "
            f"({time.time() - t1:.2f}s)"
        )
    args._extra_meta = {
        **getattr(args, "_extra_meta", {}),
        "kpm_moments": kres.moments,
        "kpm_raw_moments": kres.raw_moments,
        "kpm_center": kres.center,
        "kpm_radius": kres.radius,
        "kpm_probes": kres.num_probes,
    }
