"""End-to-end minimum slice (SURVEY.md §7 build step 2): the reference's
k-spiral experiment (/root/reference/spiral_exp.py, colaexp.py) touching
every layer L0-L5 — train an MLP with Adam, compute the full Hessian
spectrum via HVP-Lanczos and compare to dense eigh, take Gauss-Newton and
natural-gradient steps via CG, and plot the SLQ spectral density.

Runs on CPU or a single TPU chip:
    python examples/spiral_experiment.py [--cpu] [--out DIR]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--out", default="/tmp/spiral_experiment")
    p.add_argument("--width", type=int, default=24)
    p.add_argument("--depth", type=int, default=2)
    p.add_argument("--steps", type=int, default=300)
    args = p.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    os.makedirs(args.out, exist_ok=True)

    import optax

    from hessian_llm_vision_tpu.curvature import HessianOperator
    from hessian_llm_vision_tpu.data import make_spirals
    from hessian_llm_vision_tpu.io import save_spectrum
    from hessian_llm_vision_tpu.krylov import (
        lanczos,
        ritz_decomposition,
        spectral_density,
        trace_estimate,
    )
    from hessian_llm_vision_tpu.models import SpiralMLP, losses
    from hessian_llm_vision_tpu.optim import make_gauss_newton_step, make_natural_gradient_step
    from hessian_llm_vision_tpu.utils.flatten import Flattener

    # L6: data
    x, y = make_spirals(600, seed=0)
    batch = (jnp.asarray(x), jnp.asarray(y))

    # model + loss
    model = SpiralMLP(width=args.width, depth=args.depth)
    params = model.init(jax.random.PRNGKey(0), x[:4])["params"]

    def loss_fn(p_, b):
        return losses.softmax_cross_entropy(model.apply({"params": p_}, b[0]), b[1])

    # L5: train with Adam
    tx = optax.adam(3e-3)
    st = tx.init(params)

    @jax.jit
    def step(p_, s, b):
        l, g = jax.value_and_grad(loss_fn)(p_, b)
        u, s = tx.update(g, s)
        return optax.apply_updates(p_, u), s, l

    for i in range(args.steps):
        params, st, l = step(params, st, batch)
    print(f"trained {args.steps} steps, final loss {float(l):.4f}")

    # L0-L3: full spectrum via HVP-Lanczos, validated against dense eigh
    fl = Flattener(params)
    op = HessianOperator(loss_fn, params, batch, flattener=fl)
    print(f"P = {op.dim}")
    res = lanczos(op.matvec, op.dim, op.dim, key=jax.random.PRNGKey(1), reorth=True)
    spec = ritz_decomposition(res, with_vectors=True)

    H = jax.hessian(lambda v: loss_fn(fl.unflatten(v), batch))(fl.flatten(params))
    exact = np.linalg.eigvalsh(np.asarray(H))
    ritz = np.sort(np.asarray(spec.eigvals))
    print(f"lambda_max: lanczos {ritz[-1]:.6f}  dense {exact[-1]:.6f}")
    print(f"max |ritz - exact| = {np.abs(ritz - exact).max():.2e}")
    print(f"trace: slq-est {float(trace_estimate(spec, dim=op.dim)):.4f}  "
          f"exact {np.trace(np.asarray(H)):.4f}")
    save_spectrum(os.path.join(args.out, "spectrum"), spec)

    # density plot (L3 visualisation)
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        grid = jnp.linspace(float(ritz[0]) - 0.5, float(ritz[-1]) + 0.5, 400)
        dens = spectral_density(spec, grid, sigma=0.02)
        fig, ax = plt.subplots(figsize=(7, 4))
        ax.plot(np.asarray(grid), np.asarray(dens))
        ax.set_yscale("log")
        ax.set_xlabel("eigenvalue")
        ax.set_ylabel("SLQ density")
        fig.tight_layout()
        fig.savefig(os.path.join(args.out, "density.png"), dpi=120)
        print(f"density plot -> {args.out}/density.png")
    except ImportError:
        pass

    # L4: second-order steps (colaexp.py:120-147 parity)
    def model_fn(p_, b):
        return model.apply({"params": p_}, b[0])

    def out_loss(logits, b):
        return losses.softmax_cross_entropy(logits, b[1])

    gn = make_gauss_newton_step(model_fn, out_loss, loss_fn, params, damping=1e-1, lr=1.0)
    ngd = make_natural_gradient_step(model_fn, out_loss, loss_fn, params, damping=1e-3, lr=0.5)
    p_gn, m_gn = gn(params, batch)
    p_ng, m_ng = ngd(params, batch)
    print(f"GN step:  loss {float(m_gn['loss']):.4f} -> {float(loss_fn(p_gn, batch)):.4f} "
          f"(cg iters {int(m_gn['cg_iters'])})")
    print(f"NGD step: loss {float(m_ng['loss']):.4f} -> {float(loss_fn(p_ng, batch)):.4f} "
          f"(cg iters {int(m_ng['cg_iters'])})")


if __name__ == "__main__":
    main()
