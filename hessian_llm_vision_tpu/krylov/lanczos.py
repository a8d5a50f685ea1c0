"""Lanczos tridiagonalization as a single jitted ``lax.scan``.

The reference carries three implementations — the gpytorch library call
(/root/reference/gpt2_savehessian.py:202-208 and ~13 sites), a hand-rolled
3-term recurrence with no reorthogonalization
(/root/reference/diego_pythia.py:157-192, lanczostrain_hand.py:171-203), and
``cola.Lanczos`` (/root/reference/marc_pythia.py:150-151).  Its own
``Discrepancy.ipynb`` documents the orthogonality drift the hand loop
suffers.  Here there is ONE implementation with explicit switches:

* ``reorth=True``  — full reorthogonalization against the stored basis every
  iteration (the gpytorch-parity mode; required for trustworthy Ritz values).
* ``store_basis=False`` — T-only memory-light mode (the ``diego_pythia``
  mode for models whose k×P basis cannot be held; implies ``reorth=False``).
* ``basis_sharding`` — optional ``NamedSharding``/``PartitionSpec`` constraint
  for the (k, P) basis so Q shards along P over the mesh (SURVEY.md §7 hard
  part #1: 35×124M×f32 ≈ 17 GB exceeds one chip's HBM).

The recurrence runs in f32 regardless of model dtype (hard part #3).  The
matvec is traced *inline* — under ``jit`` the whole k-iteration solve is one
XLA program with zero host round-trips.

Grad-seeding: the reference injects the gradient as the first Krylov vector
via the ``init_vec`` hack in ``CurvVecProduct.__call__``
(/root/reference/gpt2_hessian.py:113-115); here it is simply ``v0=grad``.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from hessian_llm_vision_tpu.utils.programs import ensure_program

_EPS = 1e-30


class LanczosResult(NamedTuple):
    """``alphas`` (m,) diagonal, ``betas`` (m-1,) off-diagonal of T;
    ``basis`` (m, P) rows are the Krylov vectors (or None in T-only mode)."""

    alphas: jax.Array
    betas: jax.Array
    basis: Optional[jax.Array]

    @property
    def num_iters(self) -> int:
        return self.alphas.shape[0]

    def tridiag(self) -> jax.Array:
        """Dense (m, m) tridiagonal T."""
        return (
            jnp.diag(self.alphas)
            + jnp.diag(self.betas, 1)
            + jnp.diag(self.betas, -1)
        )


def _normalize(v: jax.Array) -> jax.Array:
    return v / jnp.maximum(jnp.linalg.norm(v), _EPS)


@jax.jit
def host_recurrence_step(w, q_cur, q_prev, beta_prev):
    """One Lanczos three-term update on device, for host-driven loops.

    Shared by ``lanczos_checkpointed``, ``krylov.driver`` and
    ``optim.lanczos_sgd_host`` (the host-orchestrated variants that keep
    each jitted program small).  Returns ``(alpha, beta, q_next)``.

    JITTED as one program: this backend dispatches EAGER ops through the
    remote tunnel synchronously, so the ~8 un-jitted ops here cost ~8
    round-trips per Lanczos iteration (measured: 24 s of pure dispatch
    overhead on a 35-iter 124M spectrum, 55.5 s -> 31 s once fused).
    """
    w = w.astype(jnp.float32)
    alpha = jnp.vdot(q_cur, w)
    w = w - alpha * q_cur - beta_prev * q_prev
    beta = jnp.linalg.norm(w)
    return alpha, beta, w / jnp.maximum(beta, _EPS)


def _sharding_divisor(sharding) -> int:
    """Product of mesh-axis sizes the sharding assigns to the P axis (the
    last dim of the (k, P) basis)."""
    try:
        spec = sharding.spec
        mesh = sharding.mesh
    except AttributeError:
        return 1
    if len(spec) < 2 or spec[1] is None:
        return 1
    axes = spec[1] if isinstance(spec[1], tuple) else (spec[1],)
    div = 1
    for ax in axes:
        div *= mesh.shape[ax]
    return div


def lanczos(
    matvec: Callable[[jax.Array], jax.Array],
    dim: int,
    num_iters: int,
    *,
    v0: Optional[jax.Array] = None,
    key: Optional[jax.Array] = None,
    reorth: bool = True,
    store_basis: bool = True,
    basis_sharding=None,
) -> LanczosResult:
    """Run ``num_iters`` Lanczos iterations on the symmetric operator.

    Exactly one of ``v0`` (explicit start vector, e.g. the gradient) or
    ``key`` (seeded random unit start, the reference's
    ``torch.manual_seed(vector_seed); randn(P)/‖·‖`` at
    /root/reference/diego_pythia.py:146-149) must be given.
    """
    if (v0 is None) == (key is None):
        raise ValueError("pass exactly one of v0 / key")
    if v0 is None:
        v0 = jax.random.normal(key, (dim,), dtype=jnp.float32)
    v0 = _normalize(v0.astype(jnp.float32))
    if reorth and not store_basis:
        raise ValueError("reorth=True requires store_basis=True")

    m = num_iters

    # Pad P to a multiple of the sharded-axis size so the basis can shard
    # evenly; the pad region provably stays zero through the recurrence.
    pad = 0
    if basis_sharding is not None:
        div = _sharding_divisor(basis_sharding)
        if div > 1 and dim % div:
            pad = div - dim % div
    if pad:
        inner_matvec = matvec
        true_dim = dim

        def matvec(v):  # noqa: F811
            return jnp.pad(inner_matvec(v[:true_dim]), (0, pad))

        v0 = jnp.pad(v0, (0, pad))
        dim = dim + pad

    def constrain(q):
        if basis_sharding is not None:
            return jax.lax.with_sharding_constraint(q, basis_sharding)
        return q

    if store_basis:
        # m+1 rows: row m is a scratch slot so the final iteration's
        # dynamic_update_slice needs no lax.cond guard — a cond around the
        # update blocks GSPMD sharding propagation on the carry, which
        # replicates the whole (m, P) basis into per-device TEMPS at 124M
        # scale (measured 15.5 GB/device vs 2.2 GB sharded)
        basis0 = jnp.zeros((m + 1, dim), dtype=jnp.float32)
        basis0 = constrain(basis0.at[0].set(v0))
    else:
        basis0 = None

    def step(carry, i):
        q_prev, q_cur, beta_prev, basis = carry
        w = matvec(q_cur).astype(jnp.float32)
        alpha = jnp.vdot(q_cur, w)
        w = w - alpha * q_cur - beta_prev * q_prev
        if reorth:
            # project out all previous basis vectors (rows > i are zero so
            # masking is implicit); two (m,P) contractions ride the MXU
            coeffs = basis @ w
            w = w - basis.T @ coeffs
            # second pass guards against cancellation (classical CGS2)
            coeffs2 = basis @ w
            w = w - basis.T @ coeffs2
        beta = jnp.linalg.norm(w)
        q_next = w / jnp.maximum(beta, _EPS)
        if store_basis:
            basis = constrain(
                jax.lax.dynamic_update_slice(basis, q_next[None, :], (i + 1, 0))
            )
        return (q_cur, q_next, beta, basis), (alpha, beta)

    carry0 = (jnp.zeros_like(v0), v0, jnp.float32(0.0), basis0)
    (_, _, _, basis), (alphas, betas) = jax.lax.scan(
        step, carry0, jnp.arange(m)
    )
    if basis is not None:
        basis = basis[:m]  # drop the scratch row
        if pad:
            basis = basis[:, : dim - pad]
    return LanczosResult(alphas=alphas, betas=betas[:-1], basis=basis)


def lanczos_checkpointed(
    matvec: Callable[..., jax.Array],
    dim: int,
    num_iters: int,
    *,
    v0: Optional[jax.Array] = None,
    key: Optional[jax.Array] = None,
    callback: Optional[Callable[[int, jnp.ndarray, jnp.ndarray], None]] = None,
    state_callback: Optional[Callable[[int, dict], None]] = None,
    resume_state: Optional[dict] = None,
    matvec_args: tuple = (),
) -> LanczosResult:
    """Host-driven T-only Lanczos with a per-iteration callback.

    Resumable spectra for crash-prone long runs: the reference saves T every
    iteration (/root/reference/diego_pythia.py:192 -> save_checkpoint).  Each
    iteration is one jitted device step; ``callback(i, alphas, betas)``
    receives host copies for checkpointing.  ``resume_state`` (as produced by
    ``io.spectra.save_lanczos_state``) continues an interrupted run.

    ``matvec_args``: extra EXPLICIT jit arguments forwarded as
    ``matvec(v, *matvec_args)``.  Pass params/batches here instead of
    closing over them — closed-over arrays lower as inline HLO constants,
    which bloats (and on remote-compile backends can outright break)
    compilation at LLM scale.
    """
    if resume_state is None:
        if (v0 is None) == (key is None):
            raise ValueError("pass exactly one of v0 / key")
        if v0 is None:
            v0 = jax.random.normal(key, (dim,), dtype=jnp.float32)
        q_cur = _normalize(v0.astype(jnp.float32))
        q_prev = jnp.zeros_like(q_cur)
        beta_prev = jnp.float32(0.0)
        alphas, betas = [], []
        start = 0
    else:
        q_cur = jnp.asarray(resume_state["q_cur"], jnp.float32)
        q_prev = jnp.asarray(resume_state["q_prev"], jnp.float32)
        beta_prev = jnp.float32(resume_state["beta_prev"])
        alphas = list(resume_state["alphas"])
        betas = list(resume_state["betas"])
        start = len(alphas)

    jit_mv = ensure_program(matvec) if not matvec_args else jax.jit(matvec)

    for i in range(start, num_iters):
        w = jit_mv(q_cur, *matvec_args)
        alpha, beta, q_next = host_recurrence_step(w, q_cur, q_prev, beta_prev)
        q_prev, q_cur = q_cur, q_next
        beta_prev = beta
        alphas.append(alpha)
        betas.append(beta)
        if callback is not None:
            callback(
                i,
                jnp.stack(alphas),
                jnp.stack(betas[:-1]) if len(betas) > 1 else jnp.zeros((0,)),
            )
        if state_callback is not None:
            state_callback(i, {
                "q_prev": q_prev,
                "q_cur": q_cur,
                "beta_prev": beta_prev,
                "alphas": alphas,
                "betas": betas,
            })

    return LanczosResult(
        alphas=jnp.stack(alphas),
        betas=jnp.stack(betas[:-1]) if len(betas) > 1 else jnp.zeros((0,)),
        basis=None,
    )
