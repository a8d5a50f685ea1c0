"""Kernel Polynomial Method (KPM): Chebyshev-moment spectral density.

Beyond-reference capability (the reference's only density estimator is the
Lanczos/SLQ stem plot, /root/reference/gpt2_savehessian.py:210-214 +
GPT2 spectrum.ipynb): KPM expands the spectral density in Chebyshev
polynomials, ``μ_k = (1/n_probes) Σ_v vᵀ T_k(B) v`` with ``B`` the operator
rescaled to [-1, 1], Jackson-damped to suppress Gibbs ringing (Weiße et
al., Rev. Mod. Phys. 78, 275 (2006)).  Complements SLQ: SLQ resolves the
extremal eigenvalues sharply (Ritz pairs) but carries only ``num_iters``
quadrature nodes; KPM gives a smooth density over the WHOLE support whose
resolution grows with the moment count at one matvec per moment — and the
three-term Chebyshev recurrence needs no orthogonalization and no basis,
so memory is 2 P-vectors at any moment count (the T-only memory plan of
krylov/driver.py, with a bounded-size program per matvec).

TPU shape: the recurrence is matvec-bound exactly like Lanczos — every
moment rides the same cached HVP program; moments accumulate as scalars on
device and are fetched once at the end.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np


class KPMDensity(NamedTuple):
    """Chebyshev-moment density estimate of the operator's spectrum."""

    moments: np.ndarray  # (M,) Jackson-damped Chebyshev moments
    raw_moments: np.ndarray  # (M,) undamped moments
    center: float  # rescale: B = (A - center) / radius
    radius: float
    num_probes: int

    def density(self, grid: np.ndarray) -> np.ndarray:
        """Spectral density on ``grid`` (original eigenvalue units)."""
        x = (np.asarray(grid, np.float64) - self.center) / self.radius
        x = np.clip(x, -1.0 + 1e-9, 1.0 - 1e-9)
        M = len(self.moments)
        # Chebyshev series: rho(x) = (1/(pi*sqrt(1-x^2))) * (mu_0 + 2 sum_k mu_k T_k(x))
        tk = np.arccos(x)[None, :] * np.arange(M)[:, None]
        series = self.moments[0] + 2.0 * (self.moments[1:, None] * np.cos(tk[1:])).sum(0)
        rho = series / (np.pi * np.sqrt(1.0 - x**2))
        # change of variables back to A's units (d lambda = radius d x)
        return rho / self.radius

    def trace_estimate(self, dim: Optional[int] = None) -> float:
        """``E[λ] = tr(A)/P`` from the first two moments:
        center·μ₀ + radius·μ₁ (μ₀≈1 for unit probes).  With ``dim`` given,
        scales to a tr(A) estimate — same contract as
        ``krylov.slq.trace_estimate``."""
        est = float(self.center * self.raw_moments[0]
                    + self.radius * self.raw_moments[1])
        return est * dim if dim is not None else est


def estimate_spectral_range(
    matvec: Callable[[jax.Array], jax.Array],
    dim: int,
    key: jax.Array,
    num_iters: int = 12,
    safety: float = 1.05,
) -> tuple[float, float]:
    """(λ_min, λ_max) bound via a short T-only Lanczos pass, widened by
    ``safety`` — KPM requires the spectrum strictly inside the rescaled
    [-1, 1] (moments diverge outside).

    HOST-driven (``lanczos_checkpointed``): the in-core ``lanczos`` would
    chain ``num_iters`` matvecs into one program, which this backend's
    remote compiler rejects at LLM scale (CLAUDE.md compile-budget rule) —
    here each iteration dispatches the caller's cached matvec program."""
    from hessian_llm_vision_tpu.krylov.lanczos import lanczos_checkpointed

    res = lanczos_checkpointed(matvec, dim, min(num_iters, dim), key=key)
    a = np.asarray(res.alphas, np.float64)
    b = np.asarray(res.betas, np.float64)
    T = np.diag(a) + np.diag(b, 1) + np.diag(b, -1)
    ev = np.linalg.eigvalsh(T)
    c = (ev[-1] + ev[0]) / 2
    half = (ev[-1] - ev[0]) / 2
    # extremal Ritz values underestimate the true extremes; widen
    half = max(half * safety, half + 1e-6)
    return float(c - half), float(c + half)


def _jackson(M: int) -> np.ndarray:
    k = np.arange(M, dtype=np.float64)
    n = float(M)
    return ((n - k + 1) * np.cos(np.pi * k / (n + 1))
            + np.sin(np.pi * k / (n + 1)) / np.tan(np.pi / (n + 1))) / (n + 1)


def kpm_density(
    matvec: Callable[[jax.Array], jax.Array],
    dim: int,
    num_moments: int,
    key: jax.Array,
    *,
    num_probes: int = 1,
    lmin: Optional[float] = None,
    lmax: Optional[float] = None,
    jackson: bool = True,
    progress: bool = False,
) -> KPMDensity:
    """Estimate the spectral density with ``num_moments`` Chebyshev moments.

    ``matvec`` must be program-backed (utils/programs.py discipline): the
    host loop dispatches one matvec per moment per probe against the same
    cached program.  At LLM scale mark closure wrappers with
    ``matvec.is_program_backed = True`` so the range estimation's
    ``ensure_program`` never re-jits them — tracing through a closure
    lowers the captured params as inline HLO constants, which this
    backend's remote compiler rejects (measured HTTP 413 at 124M; see
    examples/kpm_density_124m.py).  ``lmin``/``lmax``: spectrum bounds;
    estimated with a short Lanczos pass when omitted (costs ``12`` extra
    matvecs).  Rademacher probes (variance-optimal for Hutchinson-type
    traces).
    """
    if num_moments < 2:
        raise ValueError("need num_moments >= 2")
    if (lmin is None) != (lmax is None):
        raise ValueError("pass both lmin and lmax, or neither")
    if lmin is None:
        kr, key = jax.random.split(key)
        lmin, lmax = estimate_spectral_range(matvec, dim, kr)
    center = (lmax + lmin) / 2.0
    radius = max((lmax - lmin) / 2.0, 1e-30)

    c_dev = jnp.float32(center)
    r_dev = jnp.float32(radius)

    @jax.jit
    def probe_vec(k):
        v = jax.random.rademacher(k, (dim,), jnp.float32)
        return v / jnp.sqrt(jnp.float32(dim))  # unit so mu_0 = 1

    @jax.jit
    def init_step(v, av):
        """t1 = B v from A v; mu_0, mu_1."""
        t1 = (av - c_dev * v) / r_dev
        return t1, jnp.vdot(v, v), jnp.vdot(v, t1)

    @jax.jit
    def cheb_step(t_prev, t_cur, at, v):
        """T_{k+1} = 2 B T_k − T_{k−1} with B folded in from ``at`` = A T_k
        (the cached matvec program runs OUTSIDE — it must not be re-traced
        per step); returns the new moment too.  2 dispatches/moment."""
        t_next = 2.0 * ((at - c_dev * t_cur) / r_dev) - t_prev
        return t_next, jnp.vdot(v, t_next)

    mu = np.zeros(num_moments, np.float64)
    for p in range(num_probes):
        key, kp = jax.random.split(key)
        v = probe_vec(kp)
        t_cur, m0, m1 = init_step(v, matvec(v))
        t_prev = v
        dev_moments = [m0, m1]
        for k in range(2, num_moments):
            t_next, mk = cheb_step(t_prev, t_cur, matvec(t_cur), v)
            t_prev, t_cur = t_cur, t_next
            dev_moments.append(mk)
            if progress and k % 10 == 0:
                jax.block_until_ready(mk)
                print(f"kpm probe {p + 1}/{num_probes} moment {k}/{num_moments}",
                      flush=True)
        mu += np.asarray(jnp.stack(dev_moments), np.float64)
    mu /= num_probes

    damped = mu * _jackson(num_moments) if jackson else mu.copy()
    return KPMDensity(
        moments=damped, raw_moments=mu,
        center=float(center), radius=float(radius), num_probes=num_probes,
    )
