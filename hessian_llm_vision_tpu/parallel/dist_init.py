"""Multi-host initialization.

The reference's never-integrated NCCL process-group scratch
(/root/reference/distributed_scratch.py:6-29) maps to one call here:
``jax.distributed.initialize`` wires every host of a TPU pod slice (or a
GPU/CPU cluster) into a single global device mesh; ICI carries intra-slice
collectives, DCN cross-slice — all invisible above the Mesh layer.
"""

from __future__ import annotations

from typing import Optional

import jax


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize multi-host JAX.  On TPU pods all arguments auto-detect
    from the environment; pass them explicitly for manual clusters.
    Safe to call when already initialized (no-op)."""
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError as e:
        if "already" not in str(e).lower():
            raise


def is_multihost() -> bool:
    return jax.process_count() > 1


def local_device_count() -> int:
    return jax.local_device_count()
