"""Curvature parity vs the reference's OWN torch algorithm.

Closes the north-star chain end-to-end: the reference computes HVPs by
double backprop with ``loss = model(input_ids, labels=input_ids).loss *
len(input_ids)`` (/root/reference/gpt2_hessian.py:66-98).  Here that exact
algorithm is re-run in torch (f64 baseline) on a tiny GPT-2 whose weights
are converted through ``models.convert`` into our flax GPT-2, and we require

* gradient relative-L2 agreement <= 1e-5 (validates the include_padding
  loss convention against real HF semantics),
* HVP relative-L2 agreement <= 1e-5 (forward-over-reverse == double
  backprop on the same function),
* 10-iteration Lanczos tridiagonal / Ritz agreement <= 1e-3 relative
  (the BASELINE.json "Ritz within 1e-3 of the PyTorch reference" bar),

grad-seeded, under the reference's "sum" normalization.  T is invariant to
the coordinate permutation between torch's parameters() order and our
Flattener order, so both sides run in their native layouts.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")


def _build_pair():
    from transformers import GPT2Config as HFConfig
    from transformers import GPT2LMHeadModel

    from hessian_llm_vision_tpu.models.convert import gpt2_from_torch_state_dict
    from hessian_llm_vision_tpu.models.gpt2 import GPT2Config, GPT2LMHead

    torch.manual_seed(0)
    hf_cfg = HFConfig(
        vocab_size=128, n_positions=32, n_embd=48, n_layer=2, n_head=4,
        resid_pdrop=0.0, embd_pdrop=0.0, attn_pdrop=0.0,
        # SDPA has no double-backward on CPU; the reference era used eager
        attn_implementation="eager",
    )
    hf = GPT2LMHeadModel(hf_cfg).eval().double()

    cfg = GPT2Config(vocab_size=128, n_positions=32, n_embd=48, n_layer=2, n_head=4)
    params = gpt2_from_torch_state_dict(hf.state_dict(), cfg)
    model = GPT2LMHead(cfg)
    ids = np.random.RandomState(1).randint(0, 128, size=(2, 16))
    return hf, model, cfg, params, ids


def _torch_params(hf):
    return [p for p in hf.parameters() if p.requires_grad]


def _torch_grad(hf, ids_t, create_graph=False):
    """Reference loss convention: HF mean CE over ALL shifted positions
    (labels=input_ids) scaled by the batch size ("sum",
    gpt2_hessian.py:85-88)."""
    plist = _torch_params(hf)
    loss = hf(input_ids=ids_t, labels=ids_t).loss * len(ids_t)
    return torch.autograd.grad(loss, plist, create_graph=create_graph)


def _torch_hess_vec(hf, ids_t, vec_flat):
    """The reference's double-backprop hess_vec (gpt2_hessian.py:66-98),
    flat in parameters() order."""
    plist = _torch_params(hf)
    vecs, off = [], 0
    for p in plist:
        vecs.append(vec_flat[off : off + p.numel()].view_as(p))
        off += p.numel()
    grads = _torch_grad(hf, ids_t, create_graph=True)
    dot = sum((v * g).sum() for v, g in zip(vecs, grads))
    hv = torch.autograd.grad(dot, plist)
    return torch.cat([h.reshape(-1) for h in hv])


def _grads_to_pytree(hf, grads, cfg):
    """Map torch grad tensors -> our params pytree through the (linear)
    state-dict converter, so layouts correspond exactly."""
    from hessian_llm_vision_tpu.models.convert import gpt2_from_torch_state_dict

    names = [n for n, p in hf.named_parameters() if p.requires_grad]
    return gpt2_from_torch_state_dict(
        {n: g.detach() for n, g in zip(names, grads)}, cfg
    )


def _rel_l2(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    return np.linalg.norm(a - b) / np.linalg.norm(b)


@pytest.fixture(scope="module")
def pair():
    return _build_pair()


def test_gradient_matches_reference(pair):
    import jax

    from hessian_llm_vision_tpu.models import losses
    from hessian_llm_vision_tpu.utils.flatten import Flattener

    hf, model, cfg, params, ids = pair
    ids_t = torch.tensor(ids)

    ref_grads = _torch_grad(hf, ids_t)
    ref_tree = _grads_to_pytree(hf, ref_grads, cfg)

    loss_fn = losses.lm_loss_fn(model, include_padding=True)
    with jax.default_matmul_precision("highest"):
        ours = jax.grad(
            lambda p: loss_fn(p, {"input_ids": ids}) * ids.shape[0]
        )(params)

    fl = Flattener(params)
    assert _rel_l2(fl.flatten(ours), fl.flatten(ref_tree)) <= 1e-5


def test_hvp_matches_reference_hess_vec(pair):
    from hessian_llm_vision_tpu.curvature import hvp
    from hessian_llm_vision_tpu.models import losses
    from hessian_llm_vision_tpu.utils.flatten import Flattener

    hf, model, cfg, params, ids = pair
    ids_t = torch.tensor(ids)
    plist = _torch_params(hf)

    # grad-seeded direction (the reference's init_vec, gpt2_hessian.py:113)
    g = torch.cat([t.reshape(-1) for t in _torch_grad(hf, ids_t)])
    direction = g / g.norm()

    ref_hv = _torch_hess_vec(hf, ids_t, direction)

    # same direction in our layout, through the converter
    dir_list, off = [], 0
    for p in plist:
        dir_list.append(direction[off : off + p.numel()].view_as(p))
        off += p.numel()
    dir_tree = _grads_to_pytree(hf, dir_list, cfg)
    ref_tree = _grads_to_pytree(hf, [h for h in _split(ref_hv, plist)], cfg)

    loss_fn = losses.lm_loss_fn(model, include_padding=True)
    ours = hvp(
        loss_fn, params, {"input_ids": ids}, dir_tree,
        normalization="sum", batch_size=ids.shape[0], precision="highest",
    )

    fl = Flattener(params)
    assert fl.size == sum(p.numel() for p in plist)
    assert _rel_l2(fl.flatten(ours), fl.flatten(ref_tree)) <= 1e-5


def _split(flat, plist):
    out, off = [], 0
    for p in plist:
        out.append(flat[off : off + p.numel()].view_as(p))
        off += p.numel()
    return out


def _torch_lanczos(matvec, v0, k):
    """Hand Lanczos with full reorthogonalization, f64 (the gpytorch role,
    /root/reference/diego_pythia.py:151-192 recurrence)."""
    q = v0 / v0.norm()
    q_prev = torch.zeros_like(q)
    beta = torch.tensor(0.0, dtype=q.dtype)
    Q, alphas, betas = [], [], []
    for _ in range(k):
        w = matvec(q)
        alpha = torch.dot(w, q)
        w = w - alpha * q - beta * q_prev
        for _ in range(2):  # CGS2
            for qq in Q:
                w = w - torch.dot(w, qq) * qq
            w = w - torch.dot(w, q) * q
        Q.append(q)
        beta_next = w.norm()
        q_prev, q, beta = q, w / beta_next, beta_next
        alphas.append(float(alpha))
        betas.append(float(beta_next))
    T = np.diag(alphas) + np.diag(betas[:-1], 1) + np.diag(betas[:-1], -1)
    return np.asarray(alphas), np.asarray(betas[:-1]), T


def test_lanczos_tridiag_matches_reference(pair):
    """10-iter grad-seeded Lanczos: T and Ritz values within 1e-3 relative
    of the torch double-backprop chain (BASELINE.json north star)."""
    import jax.numpy as jnp

    from hessian_llm_vision_tpu.curvature import HessianOperator
    from hessian_llm_vision_tpu.krylov import lanczos, ritz_decomposition
    from hessian_llm_vision_tpu.models import losses
    from hessian_llm_vision_tpu.utils.flatten import Flattener

    hf, model, cfg, params, ids = pair
    ids_t = torch.tensor(ids)
    k = 10

    # torch side, its own layout
    g_t = torch.cat([t.reshape(-1) for t in _torch_grad(hf, ids_t)])
    al_t, be_t, T_t = _torch_lanczos(
        lambda v: _torch_hess_vec(hf, ids_t, v), g_t, k
    )

    # our side, our layout, the same grad-seed (converted for bit-identity)
    fl = Flattener(params)
    g_tree = _grads_to_pytree(hf, _torch_grad(hf, ids_t), cfg)
    loss_fn = losses.lm_loss_fn(model, include_padding=True)
    op = HessianOperator(
        loss_fn, params, {"input_ids": ids},
        normalization="sum", batch_size=ids.shape[0], precision="highest",
    )
    res = lanczos(op.matvec, op.dim, k, v0=fl.flatten(g_tree), reorth=True)

    np.testing.assert_allclose(np.asarray(res.alphas), al_t, rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(res.betas), be_t, rtol=1e-3, atol=1e-4)

    ritz_ours = np.sort(np.asarray(ritz_decomposition(res).eigvals))
    ritz_ref = np.sort(np.linalg.eigvalsh(T_t))
    denom = np.maximum(np.abs(ritz_ref), 1e-3)
    assert np.max(np.abs(ritz_ours - ritz_ref) / denom) <= 1e-3
