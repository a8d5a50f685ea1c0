"""MLP models for the synthetic / concept-test workloads.

Reference: SiLU MLP with configurable width/depth for k-spiral
classification (/root/reference/spiral_exp.py:60-73, colaexp.py:8-35) and
the 784-100-10 ``SimpleNet`` MNIST net of the layer-Hessian concept test
(/root/reference/"Layer Hessian concept test.ipynb" cell 1).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class SpiralMLP(nn.Module):
    """SiLU MLP: in -> [width]*depth -> num_classes."""

    width: int = 64
    depth: int = 3
    num_classes: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = x.astype(self.dtype)
        for _ in range(self.depth):
            x = nn.silu(nn.Dense(self.width, dtype=self.dtype)(x))
        return nn.Dense(self.num_classes, dtype=self.dtype)(x)


class SimpleNet(nn.Module):
    """784 -> hidden -> 10 ReLU net (MNIST concept-test model)."""

    hidden: int = 100
    num_classes: int = 10
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = x.reshape(x.shape[0], -1).astype(self.dtype)
        x = nn.relu(nn.Dense(self.hidden, dtype=self.dtype)(x))
        return nn.Dense(self.num_classes, dtype=self.dtype)(x)
