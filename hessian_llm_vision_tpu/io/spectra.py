"""Spectrum artifact IO.

Reference format: ``torch.save({'eigvals','gammas'[,'V']}, ...results.ckpt)``
in dirs whose names encode subsample/iters/basis
(/root/reference/gpt2_savehessian.py:216-235, eigeninfo/*/results.ckpt), and
per-iteration T checkpoints for resumable spectra
(diego_pythia.py:127-131,192).

Native format here is ``.npz`` (portable, torch-free); a compat reader
loads the reference's torch artifacts for golden tests / migration.
"""

from __future__ import annotations

import os
import numpy as np

from hessian_llm_vision_tpu.krylov.slq import Spectrum


def save_spectrum(path: str, spectrum: Spectrum, **metadata) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(path)) or ".", exist_ok=True)
    arrays = {
        "eigvals": np.asarray(spectrum.eigvals),
        "gammas": np.asarray(spectrum.gammas),
    }
    if spectrum.ritz_vectors is not None:
        arrays["V"] = np.asarray(spectrum.ritz_vectors)
    for k, v in metadata.items():
        arrays[f"meta_{k}"] = np.asarray(v)
    np.savez(path, **arrays)


def load_spectrum(path: str) -> Spectrum:
    with np.load(path if path.endswith(".npz") else path + ".npz") as z:
        return Spectrum(
            eigvals=z["eigvals"],
            gammas=z["gammas"],
            ritz_vectors=z["V"] if "V" in z else None,
        )


def save_reference_spectrum(path: str, spectrum: Spectrum) -> None:
    """Write a spectrum in the reference's torch-ckpt format
    (``torch.save({'eigvals','gammas'[,'V']})``,
    /root/reference/gpt2_savehessian.py:216-235) so the reference's
    notebooks / load_model.py consume our artifacts directly."""
    import torch

    os.makedirs(os.path.dirname(os.path.abspath(path)) or ".", exist_ok=True)
    d = {
        "eigvals": torch.from_numpy(np.asarray(spectrum.eigvals).copy()),
        "gammas": torch.from_numpy(np.asarray(spectrum.gammas).copy()),
    }
    if spectrum.ritz_vectors is not None:
        d["V"] = torch.from_numpy(np.asarray(spectrum.ritz_vectors).copy())
    torch.save(d, path)


def load_reference_spectrum(path: str) -> Spectrum:
    """Read a reference torch ``results.ckpt`` ({'eigvals','gammas'[,'V']})."""
    import torch

    d = torch.load(path, map_location="cpu", weights_only=False)
    to_np = lambda t: t.detach().numpy() if hasattr(t, "detach") else np.asarray(t)
    ev = to_np(d["eigvals"]).reshape(-1)
    ga = to_np(d["gammas"]).reshape(-1)
    V = to_np(d["V"]) if "V" in d else None
    return Spectrum(eigvals=ev, gammas=ga, ritz_vectors=V)


def save_tridiag(path: str, alphas, betas, **metadata) -> None:
    """Per-iteration T checkpoint (resumable spectra, diego_pythia.py:192)."""
    os.makedirs(os.path.dirname(os.path.abspath(path)) or ".", exist_ok=True)
    np.savez(
        path,
        alphas=np.asarray(alphas),
        betas=np.asarray(betas),
        **{f"meta_{k}": np.asarray(v) for k, v in metadata.items()},
    )


def load_tridiag(path: str):
    with np.load(path if path.endswith(".npz") else path + ".npz") as z:
        return z["alphas"], z["betas"]


def save_lanczos_state(path: str, q_prev, q_cur, beta_prev, alphas, betas) -> None:
    """Full resumable Lanczos state for ``lanczos_checkpointed``."""
    os.makedirs(os.path.dirname(os.path.abspath(path)) or ".", exist_ok=True)
    np.savez(
        path,
        q_prev=np.asarray(q_prev),
        q_cur=np.asarray(q_cur),
        beta_prev=np.asarray(beta_prev),
        alphas=np.asarray(alphas),
        betas=np.asarray(betas),
    )


def load_lanczos_state(path: str) -> dict:
    with np.load(path if path.endswith(".npz") else path + ".npz") as z:
        return {
            "q_prev": z["q_prev"],
            "q_cur": z["q_cur"],
            "beta_prev": float(z["beta_prev"]),
            "alphas": list(z["alphas"]),
            "betas": list(z["betas"]),
        }
