"""Host (pinned) memory offload for the Krylov basis.

Reference: Q built on CPU while HVPs run on GPU — every Lanczos iteration
does a P-sized D2H copy and the adjustment loop k P-sized H2D copies
(/root/reference/gpt2_hessian_cpu.py:137,207-228, train_savespec.py:313-319).
TPU-native: ``jax.device_put`` with a ``pinned_host`` memory kind keeps the
basis out of HBM but DMA-reachable; falls back to plain host commit where
the backend lacks memory-kind support (CPU tests).
"""

from __future__ import annotations

import jax


def _kind(sharding_or_device, kind: str):
    try:
        if hasattr(sharding_or_device, "with_memory_kind"):
            return sharding_or_device.with_memory_kind(kind)
    except Exception:  # pragma: no cover
        pass
    return None


def to_host(x, sharding=None):
    """Move an array to pinned host memory (keeps sharding layout)."""
    target = sharding if sharding is not None else (
        x.sharding if hasattr(x, "sharding") else None
    )
    if target is not None:
        host = _kind(target, "pinned_host")
        if host is not None:
            try:
                return jax.device_put(x, host)
            except Exception:  # backend without pinned_host (CPU)
                pass
    import numpy as np

    return np.asarray(x)


def to_device(x, sharding=None):
    """Bring a host-offloaded array back to device HBM."""
    if sharding is not None:
        dev = _kind(sharding, "device")
        return jax.device_put(x, dev if dev is not None else sharding)
    return jax.device_put(x)
