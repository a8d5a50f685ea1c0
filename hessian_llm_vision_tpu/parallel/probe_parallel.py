"""Probe-parallel SLQ: independent Lanczos probes sharded over the mesh.

The reference runs its multi-probe spectrum grids as SEPARATE GPU
processes — /root/reference/d.sh sweeps data_seed x vector_seed with one
``gpt2_savehessian.py`` invocation per point, each recomputing the model
and dataset from scratch.  TPU-native replacement: ONE fused host-loop
program whose Lanczos state carries a leading probe axis sharded over the
mesh's ``data`` axis.  Each device runs its own probe's scan-over-batches
HVP reduce + three-term recurrence (``krylov/driver.py``'s fused iteration
body, vmapped) — the probes are independent, so the partitioned program
contains ZERO collectives and scales at exactly n_devices x the
single-probe throughput.  Params and the stacked batch tensor are
replicated (same working set per device as a single-probe run).

Single-chip note: with one device the vmapped program is n_probes HVPs
big, which exceeds this backend's remote-compiler ceiling at 124M scale
(CLAUDE.md) — on one chip use the sequential ``--probes`` loop; this path
is for real meshes (validated on the 8-device simulated CPU mesh and the
driver's ``dryrun_multichip``).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from hessian_llm_vision_tpu.krylov.driver import (
    LanczosResult,
    dataset_norm,
    fused_dataset_ggn_iteration_body,
    fused_dataset_iteration_body,
)
from hessian_llm_vision_tpu.parallel.mesh import make_mesh, replicated_sharding
from hessian_llm_vision_tpu.utils.flatten import Flattener


@functools.lru_cache(maxsize=8)
def _jitted_probe_step(loss_fn, per_batch_norm, precision, fl,
                       operator, model_fn, out_loss_fn, per_probe_batches):
    if operator in ("ggn", "fisher"):
        body = fused_dataset_ggn_iteration_body(
            model_fn, out_loss_fn, precision, fl
        )
    else:
        body = fused_dataset_iteration_body(
            loss_fn, per_batch_norm, precision, fl
        )
    # probe axis leads q_cur/q_prev/beta_prev; scale/params are shared;
    # batches are shared (vector-seed grid) or per-probe (full d.sh
    # data_seed x vector_seed grid).  Donation keeps per-device memory
    # flat across iterations.
    return jax.jit(
        jax.vmap(body, in_axes=(0, 0, 0, None, None,
                                0 if per_probe_batches else None)),
        donate_argnums=(0, 1),
    )


def probe_parallel_spectrum_host(
    loss_fn: Callable[[Any, Any], jax.Array],
    params: Any,
    batch_list: Sequence[Any],
    num_iters: int,
    *,
    key: jax.Array,
    n_probes: int,
    mesh=None,
    normalization: str = "dataset",
    batch_size: Optional[int] = None,
    precision: Optional[str] = "high",
    flattener: Optional[Flattener] = None,
    operator: str = "hessian",
    model_fn: Optional[Callable[[Any, Any], jax.Array]] = None,
    out_loss_fn: Optional[Callable[[jax.Array, Any], jax.Array]] = None,
    per_probe_batch_lists: Optional[Sequence[Sequence[Any]]] = None,
    progress: bool = False,
) -> List[LanczosResult]:
    """n_probes T-only dataset-operator Lanczos runs in mesh wall-time of one.

    Probe i's start vector is drawn from ``fold_in(key, i)`` — the SAME
    derivation as the sequential ``--probes`` loop in the spectrum CLI, so
    the two paths produce identical tridiagonals probe-for-probe
    (pinned by tests/distributed/test_probe_parallel.py).  Returns one
    :class:`LanczosResult` per probe, ready for ``ritz_decomposition`` +
    SLQ averaging.

    ``per_probe_batch_lists``: optional n_probes equal-shape batch lists —
    probe i sees ITS OWN data (the reference's full d.sh data_seed x
    vector_seed grid, /root/reference/d.sh:1-12, in one program); default
    is the shared ``batch_list`` (vector-seed grid only).
    """
    fl = flattener or Flattener(params)
    if per_probe_batch_lists is not None:
        if len(per_probe_batch_lists) != n_probes:
            raise ValueError(
                f"per_probe_batch_lists has {len(per_probe_batch_lists)} "
                f"entries for n_probes={n_probes}"
            )
        lens = {len(bl) for bl in per_probe_batch_lists}
        if len(lens) != 1:
            raise ValueError(
                f"per-probe batch lists must be equal length, got {lens}"
            )
        batch_list = per_probe_batch_lists[0]
    num_batches = len(batch_list)
    per_batch_norm, scale = dataset_norm(normalization, num_batches, batch_size)
    if operator in ("ggn", "fisher"):
        if model_fn is None or out_loss_fn is None:
            raise ValueError(f"operator={operator!r} needs model_fn+out_loss_fn")
    elif operator != "hessian":
        raise ValueError(f"unknown operator {operator!r}")

    if mesh is None:
        # largest device count that divides the probe count, so every
        # device carries the same number of probes
        import math

        mesh = make_mesh(math.gcd(n_probes, len(jax.devices())))
    n_dev = mesh.shape["data"]
    if n_probes % n_dev != 0:
        raise ValueError(
            f"n_probes={n_probes} must be a multiple of the mesh's data "
            f"axis ({n_dev} devices) — pad the probe count or shrink the "
            "mesh; silent remainder handling would skew the SLQ average"
        )

    probe_sh = NamedSharding(mesh, P("data"))
    repl = replicated_sharding(mesh)
    params = jax.device_put(params, repl)
    if per_probe_batch_lists is not None:
        # (n_probes, n_batches, ...) with the probe axis sharded: each
        # device stores and scans only its probes' data
        stacked = jax.device_put(
            jax.tree_util.tree_map(
                lambda *xs: jnp.stack(xs),
                *[
                    jax.tree_util.tree_map(lambda *b: jnp.stack(b), *bl)
                    for bl in per_probe_batch_lists
                ],
            ),
            probe_sh,
        )
    else:
        stacked = jax.device_put(
            jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *batch_list),
            repl,
        )
    scale_dev = jax.device_put(jnp.float32(scale), repl)

    @jax.jit
    def init_state(keys):
        def one(k):
            v = jax.random.normal(k, (fl.size,), jnp.float32)
            return v / jnp.maximum(jnp.linalg.norm(v), 1e-30)

        q = jax.vmap(one)(keys)
        return q, jnp.zeros_like(q), jnp.zeros((keys.shape[0],), jnp.float32)

    keys = jnp.stack(
        [jax.random.fold_in(key, i) for i in range(n_probes)]
    )
    # the sharded keys seed the whole state's layout: each device draws and
    # normalizes only ITS probes' rows (no (n_probes, P) host staging)
    q_cur, q_prev, beta_prev = init_state(jax.device_put(keys, probe_sh))

    step = _jitted_probe_step(
        loss_fn, per_batch_norm, precision, fl,
        operator, model_fn, out_loss_fn,
        per_probe_batch_lists is not None,
    )
    alphas: List[Any] = []
    betas: List[Any] = []
    import time as _time

    for i in range(num_iters):
        t0 = _time.perf_counter()
        alpha, beta, q_cur, q_prev = step(
            q_cur, q_prev, beta_prev, scale_dev, params, stacked
        )
        beta_prev = beta
        # (n_probes,) device vectors; fetched once at the end — per-iter
        # host fetches would serialize the pipeline (krylov/driver.py note)
        alphas.append(alpha)
        betas.append(beta)
        if progress:
            jax.block_until_ready(beta)
            print(
                f"probe-parallel lanczos iter {i + 1}/{num_iters}  "
                f"({n_probes} probes)  {_time.perf_counter() - t0:.2f}s",
                flush=True,
            )
    a = np.asarray(jnp.stack(alphas), np.float32)  # (iters, n_probes)
    b = (
        np.asarray(jnp.stack(betas[:-1]), np.float32)
        if len(betas) > 1
        else np.zeros((0, n_probes), np.float32)
    )
    return [
        LanczosResult(
            alphas=jnp.asarray(a[:, j]),
            betas=jnp.asarray(b[:, j]),
            basis=None,
        )
        for j in range(n_probes)
    ]
