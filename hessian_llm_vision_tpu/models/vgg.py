"""VGG-16 for CIFAR-scale inputs.

Reference: ``torchvision.models.vgg16(pretrained=False)`` with a replaced
10-class classifier head (/root/reference/train_savespec.py:172-179).
Classic VGG (no batch norm), NHWC layout (TPU-native conv layout).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

_VGG16_CFG = (64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512, 512, "M", 512, 512, 512, "M")


class VGG16(nn.Module):
    num_classes: int = 10
    classifier_width: int = 4096
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.astype(self.dtype)
        for v in _VGG16_CFG:
            if v == "M":
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            else:
                x = nn.Conv(v, (3, 3), padding="SAME", dtype=self.dtype)(x)
                x = nn.relu(x)
        x = x.reshape(x.shape[0], -1)
        x = nn.relu(nn.Dense(self.classifier_width, dtype=self.dtype)(x))
        x = nn.relu(nn.Dense(self.classifier_width, dtype=self.dtype)(x))
        return nn.Dense(self.num_classes, dtype=self.dtype)(x)
