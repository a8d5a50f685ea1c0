"""Host-offloaded-basis Lanczos.

The reference's CPU-offload mode: the Krylov basis and T are built on host
while HVPs run on the accelerator — every iteration one P-sized D2H copy
(/root/reference/gpt2_hessian_cpu.py:137,207-213, train_savespec.py:313-319).
Use when the (k, P) basis exceeds device HBM on a single chip and no mesh
is available to shard it (e.g. GPT-2 124M at 35 iters = 17.4 GB).

The matvec stays jitted on device; orthogonalization runs on host in f64
(numpy BLAS — CGS2 full reorthogonalization, optionally through the native
C++ ops).  Returns a standard :class:`LanczosResult` whose ``basis`` is a
host numpy array, so ``slq.ritz_decomposition`` works unchanged; the
spectral adjustment over a host basis can then run through
``ops.native.spectral_adjust_native`` with zero H2D transfer of the basis
(the reference's adjustment loop pulls k P-sized rows back to device,
gpt2_hessian_cpu.py:224-228 — we avoid that entirely).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from hessian_llm_vision_tpu.krylov.lanczos import LanczosResult
from hessian_llm_vision_tpu.utils.programs import ensure_program


def lanczos_host_basis(
    matvec: Callable[[jax.Array], jax.Array],
    dim: int,
    num_iters: int,
    *,
    v0: Optional[np.ndarray] = None,
    key: Optional[jax.Array] = None,
    reorth: bool = True,
    callback: Optional[Callable[[int, np.ndarray, np.ndarray], None]] = None,
) -> LanczosResult:
    """Host-driven Lanczos with the basis in host RAM.

    ``callback(i, alphas, betas)`` fires per iteration (resumable spectra).
    """
    if (v0 is None) == (key is None):
        raise ValueError("pass exactly one of v0 / key")
    if v0 is None:
        v0 = np.asarray(jax.random.normal(key, (dim,), dtype=jnp.float32))
    v = np.asarray(v0, np.float64)
    v = v / np.linalg.norm(v)

    jit_mv = ensure_program(matvec)
    Q = np.zeros((num_iters, dim), np.float32)
    alphas, betas = [], []
    beta_prev = 0.0
    q_prev = np.zeros(dim, np.float64)

    for i in range(num_iters):
        Q[i] = v.astype(np.float32)
        w = np.asarray(jit_mv(jnp.asarray(v, jnp.float32)), np.float64)
        alpha = float(v @ w)
        w -= alpha * v + beta_prev * q_prev
        if reorth:
            # CGS2 against the full stored basis (host BLAS)
            active = Q[: i + 1]
            w -= active.T @ (active @ w)
            w -= active.T @ (active @ w)
        beta = float(np.linalg.norm(w))
        alphas.append(alpha)
        betas.append(beta)
        if callback is not None:
            callback(i, np.asarray(alphas), np.asarray(betas[:-1]))
        q_prev = v
        v = w / max(beta, 1e-30)

    return LanczosResult(
        alphas=jnp.asarray(alphas, jnp.float32),
        betas=jnp.asarray(betas[:-1], jnp.float32),
        basis=Q,
    )
