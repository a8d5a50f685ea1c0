"""ResNet-50 with BatchNorm, NHWC.

Reference: ``torchvision.models.resnet50(pretrained=False)`` with a 10-class
head (/root/reference/train_savespec.py:181-186).  BatchNorm runs through
flax's ``batch_stats`` mutable collection; the curvature path must support
"eval model but BN in train mode" (``_bn_train_mode``,
train_savespec.py:57-59,70-72) — expose that as ``use_running_average``
on ``__call__`` so the loss closure can pick either convention
(SURVEY.md §7 hard part #5).
"""

from __future__ import annotations

from functools import partial
from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp


class Bottleneck(nn.Module):
    features: int
    strides: int = 1
    downsample: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, use_running_average: bool = True):
        norm = partial(
            nn.BatchNorm,
            use_running_average=use_running_average,
            momentum=0.9,
            dtype=self.dtype,
        )
        residual = x
        y = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype)(x)
        y = nn.relu(norm()(y))
        y = nn.Conv(
            self.features,
            (3, 3),
            strides=(self.strides, self.strides),
            padding="SAME",
            use_bias=False,
            dtype=self.dtype,
        )(y)
        y = nn.relu(norm()(y))
        y = nn.Conv(4 * self.features, (1, 1), use_bias=False, dtype=self.dtype)(y)
        y = norm()(y)
        if self.downsample:
            residual = nn.Conv(
                4 * self.features,
                (1, 1),
                strides=(self.strides, self.strides),
                use_bias=False,
                dtype=self.dtype,
            )(x)
            residual = norm()(residual)
        return nn.relu(y + residual)


class ResNet50(nn.Module):
    num_classes: int = 10
    stage_sizes: Sequence[int] = (3, 4, 6, 3)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, use_running_average: bool = True):
        x = x.astype(self.dtype)
        x = nn.Conv(
            64, (7, 7), strides=(2, 2), padding="SAME", use_bias=False, dtype=self.dtype
        )(x)
        x = nn.relu(
            nn.BatchNorm(
                use_running_average=use_running_average, momentum=0.9, dtype=self.dtype
            )(x)
        )
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="SAME")
        features = 64
        for stage, num_blocks in enumerate(self.stage_sizes):
            for block in range(num_blocks):
                strides = 2 if stage > 0 and block == 0 else 1
                x = Bottleneck(
                    features,
                    strides=strides,
                    downsample=(block == 0),
                    dtype=self.dtype,
                )(x, use_running_average)
            features *= 2
        x = jnp.mean(x, axis=(1, 2))
        return nn.Dense(self.num_classes, dtype=self.dtype)(x)
