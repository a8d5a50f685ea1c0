"""ctypes loader for the host-side native ops.

The reference JIT-compiles its CUDA kernel at import via PyCUDA
(/root/reference/gpt_hessian_cuda.py:7-54); here the shared lib builds
lazily via make on first use (toolchain is baked into the image; no pip).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libvector_adjust.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None


def _build() -> None:
    subprocess.run(
        ["make", "-s", "libvector_adjust.so"], cwd=_DIR, check=True
    )


def load_library() -> ctypes.CDLL:
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_LIB_PATH):
            _build()
        lib = ctypes.CDLL(_LIB_PATH)
        fp = ctypes.POINTER(ctypes.c_float)
        lib.rank_k_apply.argtypes = [fp, fp, fp, fp, ctypes.c_int64, ctypes.c_int64]
        lib.spectral_adjust.argtypes = [
            fp, fp, fp, fp, ctypes.c_int64, ctypes.c_int64, ctypes.c_float,
        ]
        lib.project_out.argtypes = [fp, fp, fp, ctypes.c_int64, ctypes.c_int64]
        lib.num_threads.restype = ctypes.c_int
        _lib = lib
        return lib


def _as_f32(x) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(x), dtype=np.float32)


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def rank_k_apply_native(g, basis, coeffs) -> np.ndarray:
    """out = g + basisᵀ (coeffs ⊙ (basis @ g)), on host (numpy in/out)."""
    lib = load_library()
    g = _as_f32(g)
    V = _as_f32(basis)
    c = _as_f32(coeffs)
    k, p = V.shape
    assert g.shape == (p,) and c.shape == (k,)
    out = np.empty_like(g)
    lib.rank_k_apply(_ptr(g), _ptr(V), _ptr(c), _ptr(out), k, p)
    return out


def spectral_adjust_native(g, basis, eigvals, delta: float) -> np.ndarray:
    lib = load_library()
    g = _as_f32(g)
    V = _as_f32(basis)
    e = _as_f32(eigvals)
    k, p = V.shape
    out = np.empty_like(g)
    lib.spectral_adjust(_ptr(g), _ptr(V), _ptr(e), _ptr(out), k, p,
                        ctypes.c_float(delta))
    return out


def project_out_native(g, basis) -> np.ndarray:
    lib = load_library()
    g = _as_f32(g)
    V = _as_f32(basis)
    k, p = V.shape
    out = np.empty_like(g)
    lib.project_out(_ptr(g), _ptr(V), _ptr(out), k, p)
    return out


def num_threads() -> int:
    return load_library().num_threads()
