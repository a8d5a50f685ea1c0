"""Mixture-of-experts MLP with expert-parallel sharding.

The reference has no MoE anywhere in its tree (SURVEY.md §2.7 marks EP as
absent) — this is a beyond-parity capability completing the framework's
dp / tp / sp / pp / ep sharding vocabulary, and it exists for a
curvature-specific reason: MoE loss landscapes are the one place the
block-diagonal/layer-restricted operators (curvature/operators.py) meet
genuinely modular parameter spaces, and the framework should be able to
take their spectra.

Design: DENSE softmax-gated MoE — every expert evaluates every token and
the gate's softmax probabilities mix the outputs.  Deliberate choice over
top-k routing:

* smooth and twice-differentiable everywhere, so ``jvp(grad(loss))`` HVPs
  are exact (top-k argmax routing has measure-zero kinks and
  straight-through estimators corrupt curvature);
* static shapes and no gather/scatter — the expert axis is just an einsum
  contraction XLA tiles onto the MXU;
* expert parallelism falls out of SPMD: stack expert weights on a leading
  ``E`` axis, shard it over the ``ep`` mesh axis
  (:func:`moe_param_sharding`), and the partitioner runs each device's
  experts locally and psums the gate-weighted combine over ICI — the
  standard EP data flow without hand-written all-to-alls.

With all experts initialized identically the layer reduces EXACTLY to the
dense MLP (softmax weights sum to 1) — pinned in
tests/distributed/test_moe.py, which also pins ep-sharded == unsharded
loss/grad/HVP to reduction-order tolerance.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


class MoEMLP(nn.Module):
    """Softmax-gated dense-MoE drop-in for the transformer MLP.

    ``config`` needs ``n_embd``, ``n_experts``, ``dtype`` (GPT2Config with
    ``n_experts > 0``).  Expert weights are stacked ``(E, ...)`` leaves —
    shard dim 0 over 'ep' via :func:`moe_param_sharding`.
    """

    config: object

    @nn.compact
    def __call__(self, x, deterministic=True):
        cfg = self.config
        E, C = cfg.n_experts, cfg.n_embd
        F = 4 * C
        gate = nn.Dense(E, dtype=cfg.dtype, name="gate")(x)  # (B, T, E)
        probs = jax.nn.softmax(gate.astype(jnp.float32), axis=-1).astype(
            x.dtype
        )
        init = nn.initializers.normal(0.02)
        w1 = self.param("w1", init, (E, C, F), jnp.float32)
        b1 = self.param("b1", nn.initializers.zeros, (E, F), jnp.float32)
        w2 = self.param("w2", init, (E, F, C), jnp.float32)
        b2 = self.param("b2", nn.initializers.zeros, (E, C), jnp.float32)
        top_k = int(getattr(cfg, "moe_top_k", 0) or 0)
        if top_k:
            return _topk_moe(
                x, probs, w1, b1, w2, b2, cfg, top_k,
                float(getattr(cfg, "moe_capacity_factor", 1.25)),
            )
        # per-expert MLP, expert axis e shards over 'ep'; the final
        # gate-weighted combine contracts e => one psum over ICI
        h = jnp.einsum("btc,ecf->btef", x, w1.astype(cfg.dtype)) + b1.astype(
            cfg.dtype
        )
        h = nn.gelu(h, approximate=True)
        y = jnp.einsum("btef,efc->btec", h, w2.astype(cfg.dtype)) + b2.astype(
            cfg.dtype
        )
        return jnp.einsum("btec,bte->btc", y, probs)


def _topk_moe(x, probs, w1, b1, w2, b2, cfg, top_k: int, cap_factor: float):
    """Capacity-based top-k expert dispatch (Mesh-TensorFlow style).

    The sparse-COMPUTE forward: each token routes to its ``top_k`` experts
    (renormalized gate weights), each expert processes a fixed-capacity
    buffer of ``Cap = ceil(top_k·N/E · cap_factor)`` token slots — all
    shapes STATIC, dispatch/combine are one-hot einsums XLA tiles onto the
    MXU, and the expert axis still shards over 'ep' exactly like the dense
    path (dispatch output is e-leading; the combine contracts e → one
    psum over ICI).  Tokens overflowing an expert's capacity are dropped
    from that expert (standard Switch/GShard semantics; cap_factor sizes
    the slack).

    With ``top_k == E`` and enough capacity every token reaches every
    expert with its full softmax weight — reduces EXACTLY to the dense
    path (pinned in tests/distributed/test_moe.py).

    CURVATURE CAVEAT: top-k index selection is piecewise-constant, so
    grads/HVPs ignore the routing's own curvature (exact only within the
    active routing region).  Curvature jobs keep the default dense gating
    (cfg.moe_top_k = 0), which is smooth and twice-differentiable — the
    documented exactness rationale in the module docstring.
    """
    B, T, C = x.shape
    E = cfg.n_experts
    N = B * T
    cap = int(np.ceil(top_k * N / E * cap_factor))
    cap = max(1, min(cap, N))
    xf = x.reshape(N, C)
    pf = probs.reshape(N, E).astype(jnp.float32)
    vals, sel = jax.lax.top_k(pf, top_k)  # (N, k)
    vals = vals / jnp.maximum(vals.sum(-1, keepdims=True), 1e-30)
    combine = jnp.zeros((N, E, cap), jnp.float32)
    cum_counts = jnp.zeros((E,), jnp.int32)
    for j in range(top_k):  # k is small and static: unrolled at trace time
        mask_j = jax.nn.one_hot(sel[:, j], E, dtype=jnp.int32)  # (N, E)
        pos_j = cum_counts[None, :] + jnp.cumsum(mask_j, axis=0) - mask_j
        within = (pos_j < cap) & (mask_j > 0)
        slot = jax.nn.one_hot(pos_j, cap, dtype=jnp.float32)  # (N, E, cap)
        combine = combine + (
            vals[:, j][:, None, None]
            * within.astype(jnp.float32)[:, :, None]
            * slot
        )
        cum_counts = cum_counts + mask_j.sum(0)
    dispatch = (combine > 0).astype(cfg.dtype)  # (N, E, cap)
    expert_in = jnp.einsum("nec,nd->ecd", dispatch, xf.astype(cfg.dtype))
    h = jnp.einsum("ecd,edf->ecf", expert_in, w1.astype(cfg.dtype))
    h = nn.gelu(h + b1.astype(cfg.dtype)[:, None, :], approximate=True)
    y = jnp.einsum("ecf,efd->ecd", h, w2.astype(cfg.dtype))
    y = y + b2.astype(cfg.dtype)[:, None, :]
    out = jnp.einsum("nec,ecd->nd", combine.astype(cfg.dtype), y)
    return out.reshape(B, T, C)


class TopKCurvatureWarning(UserWarning):
    """Curvature job launched over piecewise-constant top-k MoE routing."""


def topk_curvature_warning(config) -> "str | None":
    """Warning text when ``config`` routes with top-k, else ``None``.

    Top-k index selection is piecewise-constant (``_topk_moe`` docstring):
    grads/HVPs are exact only within the active routing region and ignore
    the routing's own curvature — crossing a routing boundary between the
    refresh that computed a Ritz basis and the steps that reuse it silently
    changes the operator under the basis.  Curvature jobs should use the
    smooth dense gating (``moe_top_k = 0``); this guard makes launching one
    over a top-k config LOUD instead of a docstring caveat (the repo's
    loud-flags convention, cli/common.py).
    """
    top_k = int(getattr(config, "moe_top_k", 0) or 0)
    n_experts = int(getattr(config, "n_experts", 0) or 0)
    if not (n_experts and top_k):
        return None
    return (
        f"curvature over TOP-K MoE routing (n_experts={n_experts}, "
        f"moe_top_k={top_k}): the routing is piecewise-constant, so "
        "HVPs/spectra are exact only within the ACTIVE routing region and "
        "carry zero routing curvature — Ritz pairs computed at a refresh "
        "boundary can describe a different operator than the steps that "
        "reuse them. Use the dense gating (moe_top_k=0 / drop --moe_top_k) "
        "for curvature-exact jobs; top-k results are region-conditional."
    )


def warn_if_topk_curvature(model_or_config, *, what: str = "curvature job"):
    """Emit a loud :class:`TopKCurvatureWarning` (stderr + warnings module)
    when a curvature job targets a top-k-routed MoE config.  Returns the
    warning text (for embedding in spectrum reports/artifacts) or None."""
    import sys
    import warnings

    config = getattr(model_or_config, "config", model_or_config)
    msg = topk_curvature_warning(config)
    if msg is not None:
        warnings.warn(f"[{what}] {msg}", TopKCurvatureWarning, stacklevel=2)
        print(f"WARNING [{what}]: {msg}", file=sys.stderr)
    return msg


def moe_param_sharding(params, mesh: Mesh, *, ep_axis: str = "ep"):
    """NamedSharding tree: expert-stacked MoE leaves (paths containing
    ``moe/w1|w2|b1|b2``) shard dim 0 over ``ep_axis``; everything else
    replicates.  Leaves whose expert count doesn't divide the axis size
    fall back to replicated (tiny test configs on any mesh)."""
    from hessian_llm_vision_tpu.utils.trees import _key_str

    ep = mesh.shape[ep_axis]
    paths, treedef = jax.tree_util.tree_flatten_with_path(params)
    out = []
    for path, leaf in paths:
        name = "/".join(_key_str(k) for k in path)
        expert_leaf = (
            "/moe/" in f"/{name}" and name.rsplit("/", 1)[-1] in
            ("w1", "w2", "b1", "b2")
        )
        if expert_leaf and leaf.shape[0] % ep == 0:
            spec = P(*((ep_axis,) + (None,) * (leaf.ndim - 1)))
        else:
            spec = P()
        out.append(NamedSharding(mesh, spec))
    return jax.tree_util.tree_unflatten(treedef, out)


def shard_params_for_ep(params, mesh: Mesh, *, ep_axis: str = "ep"):
    """device_put params with expert-parallel shardings over ``mesh``."""
    return jax.device_put(params, moe_param_sharding(params, mesh, ep_axis=ep_axis))


def make_ep_mesh(num_data: int, num_experts_axis: int, *, devices=None) -> Mesh:
    """Mesh('data', 'ep'): batch axis x expert axis."""
    import numpy as np

    devs = list(devices) if devices is not None else jax.devices()
    n = num_data * num_experts_axis
    if n > len(devs):
        raise ValueError(f"requested {n} devices, have {len(devs)}")
    grid = np.asarray(devs[:n]).reshape(num_data, num_experts_axis)
    return Mesh(grid, ("data", "ep"))
