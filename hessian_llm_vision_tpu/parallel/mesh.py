"""Device mesh construction and sharding vocabulary.

The reference's parallelism is single-process ``torch.nn.DataParallel``
over ≤4 GPUs plus an unused NCCL scratch (/root/reference/gpt2_hessian.py:134,
distributed_scratch.py:6-29; SURVEY.md §2.7).  TPU-native replacement: one
``jax.sharding.Mesh`` with axes ``('data', 'model')``; batches shard over
``data``, parameters replicate (or shard over ``model`` at Pythia-1.4B
scale), and the (k, P) Krylov basis shards its P axis over ``data`` —
SURVEY.md §7 hard part #1: 35×124M×f32 ≈ 17 GB exceeds one chip's HBM, so
the basis must never be replicated.

Collectives are XLA's: the HVP gradient reduction rides a ``psum`` over ICI
inserted by the partitioner; no custom comm code.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    num_data: Optional[int] = None,
    num_model: int = 1,
    *,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Mesh('data', 'model').  Defaults to all devices on the data axis."""
    devs = list(devices) if devices is not None else jax.devices()
    if num_data is None:
        num_data = len(devs) // num_model
    n = num_data * num_model
    if n > len(devs):
        raise ValueError(f"requested {n} devices, have {len(devs)}")
    grid = np.asarray(devs[:n]).reshape(num_data, num_model)
    return Mesh(grid, ("data", "model"))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis batch sharding over the data axis."""
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def basis_sharding(mesh: Mesh) -> NamedSharding:
    """(k, P) Krylov basis: shard the parameter axis P over 'data'.

    Every Lanczos contraction (Q @ w, Qᵀ c) then runs as local partials +
    one psum/all-gather of k-vectors over ICI — k floats per device, not P.
    """
    return NamedSharding(mesh, P(None, "data"))


def flat_vector_sharding(mesh: Mesh) -> NamedSharding:
    """(P,) flat curvature vectors sharded over 'data'."""
    return NamedSharding(mesh, P("data"))


def shard_batch(batch, mesh: Mesh):
    """Device-put a host batch with leading axis sharded over 'data'."""
    sh = data_sharding(mesh)

    def put(x):
        spec = P(*(("data",) + (None,) * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(put, batch)
