"""Causal self-attention cores shared by every LM in the framework.

Two execution paths behind one function:

* ``block_q=None`` — the dense path: one fused einsum pair with the
  (B, H, T, T) score matrix materialized in f32.  Fastest for short
  sequences / small models; this is the path all round-1/2 artifacts used.
* ``block_q=N`` — the blockwise path: a ``lax.scan`` over query blocks
  whose (remat'd) body only ever materializes a (B, H, N, T) score tile.
  Under ``jax.grad`` / ``jax.jvp(jax.grad(...))`` (the curvature hot loop,
  reference role: /root/reference/gpt2_hessian.py:83-89) the rematerialized
  body keeps only q/k/v as residuals — the full score matrix is never part
  of the HVP working set.  At GPT-2 124M bs16/seq512 this removes
  ~4.8 GB of attention residuals from the fwd-over-rev HVP and is what
  lets the reference's own default config (gpt2_savehessian.py:12-19,
  batch_size=16) fit a single v5e chip.

Design notes (TPU-first):
* the scan body is compiled ONCE regardless of the number of blocks, so
  the blockwise path *shrinks* the HLO relative to the dense graph — this
  matters here because the remote TPU compiler hard-fails on oversized
  programs (see CLAUDE.md).
* ``jax.checkpoint`` wraps only the tiny per-block body, not the loss —
  whole-loss remat is what the remote compiler rejects; a per-block remat
  adds one small recompute region per scan.
* query blocks attend to all T keys with the causal mask applied — static
  shapes keep XLA on the MXU; the masked half costs ~11% extra FLOPs at
  T=512 (attention is a small fraction of total model FLOPs) in exchange
  for the O(T^2) -> O(block*T) memory cut.
* no online-softmax bookkeeping is needed: the full key axis is present in
  each tile, so a plain row softmax is exact (unlike flash attention's
  streaming-key variant).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_NEG_INF = jnp.finfo(jnp.float32).min


def _dense_causal(q, k, v, scale, out_dtype):
    T = q.shape[1]
    att = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32) * scale
    mask = jnp.tril(jnp.ones((T, T), dtype=bool))
    att = jnp.where(mask[None, None], att, _NEG_INF)
    att = jax.nn.softmax(att, axis=-1).astype(out_dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", att, v)


def _block_body(k, v, qb, qpos, scale, out_dtype):
    T = k.shape[1]
    att = jnp.einsum("bqhd,bkhd->bhqk", qb, k).astype(jnp.float32) * scale
    mask = qpos[:, None] >= jnp.arange(T)[None, :]
    att = jnp.where(mask[None, None], att, _NEG_INF)
    att = jax.nn.softmax(att, axis=-1).astype(out_dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", att, v)


def causal_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    block_q: int | None = None,
    remat: bool = True,
    unroll: bool = False,
) -> jax.Array:
    """Causal softmax attention.  q, k, v: (B, T, H, D) -> (B, T, H, D).

    ``block_q``: query-block size for the memory-light scan path.  ``None``
    selects the dense path; ``block_q >= T`` also runs dense (one block
    with the scan/remat wrapping removed — the measured-fastest setting
    when the working set fits, see bench.py).  A block that does not
    divide T is an ERROR: silently falling back to dense would defeat the
    memory plan the flag exists for, at exactly the scales where that
    OOMs.  Both paths are numerically identical up to matmul precision
    (parity-tested to <=1e-5 in logits/grad/HVP by
    tests/unit/test_blockwise.py).
    """
    B, T, H, D = q.shape
    scale = 1.0 / jnp.sqrt(jnp.asarray(D, jnp.float32))
    out_dtype = v.dtype
    if block_q is None or block_q >= T:
        return _dense_causal(q, k, v, scale, out_dtype)
    if T % block_q != 0:
        raise ValueError(
            f"attn block_q={block_q} does not divide seq_len={T}; pick a "
            "divisor (or >= seq_len for the dense single-block path)"
        )

    nb = T // block_q
    q_blocks = q.reshape(B, nb, block_q, H, D).transpose(1, 0, 2, 3, 4)
    positions = jnp.arange(T).reshape(nb, block_q)

    # k/v are CLOSED OVER, not threaded through carry: scan hoists closure
    # constants and stores them once; a carry-threaded k/v would be saved
    # per-iteration as residuals of the checkpointed body.
    def body(carry, inp):
        qb, qpos = inp
        return carry, _block_body(k, v, qb, qpos, scale, out_dtype)

    # unroll=True inlines the (few) block bodies — removes the while-loop
    # per-step overhead at the cost of HLO size ~ dense; the remat'd bodies
    # keep the MEMORY profile of the scan either way
    if remat:
        body = jax.checkpoint(body)
    _, y = jax.lax.scan(body, None, (q_blocks, positions), unroll=nb if unroll else 1)
    return y.transpose(1, 0, 2, 3, 4).reshape(B, T, H, D)
