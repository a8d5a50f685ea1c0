"""Model / train-state checkpointing via Orbax.

Reference: ``torch.save`` of state_dicts with DataParallel ``module.``
prefix adaptation on load (/root/reference/gpt2.py:68,87,
gpt2_savehessian.py:82-91).  Orbax gives atomic, async-capable, sharded
checkpoints — device-mesh layouts restore natively, which replaces the
reference's prefix-stripping hacks entirely.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax


def save_checkpoint(path: str, state: Any) -> None:
    """Save any pytree (params, full train state, ...) at ``path``."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, state, force=True)


def load_checkpoint(path: str, template: Optional[Any] = None) -> Any:
    """Load a pytree; ``template`` (matching structure of abstract arrays
    or concrete arrays) restores dtypes/shardings when given."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.PyTreeCheckpointer() as ckptr:
        if template is None:
            return ckptr.restore(path)
        abstract = jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype)
            if hasattr(x, "shape")
            else x,
            template,
        )
        return ckptr.restore(path, item=abstract)


def load_torch_state_dict(path: str, strip_module_prefix: bool = True) -> dict:
    """Read a reference torch checkpoint (cpu map) into numpy dict —
    the migration path for existing ``model_trained.pt`` artifacts.
    Strips the DataParallel ``module.`` prefix like
    gpt2_savehessian.py:83-91."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    out = {}
    for k, v in sd.items():
        if strip_module_prefix and k.startswith("module."):
            k = k[len("module.") :]
        out[k] = v.detach().numpy() if hasattr(v, "detach") else v
    return out
