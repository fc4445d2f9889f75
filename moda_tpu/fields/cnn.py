"""Pose CNN: image-space 16-ch CSE features -> global SE(3).

TPU-native stand-in for the reference's torchvision ResNet18 encoder +
RTHead (nerf.py:513-556, moda.py:358-373). Trained from scratch on
rasterized CSE-feature renderings (no ImageNet checkpoint dependency);
GroupNorm instead of BatchNorm removes the SyncBN requirement
(train_utils.py:98) under data parallelism.
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from moda_tpu.core import quat as Q


class ConvBlock(nn.Module):
    features: int
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(self.features, (3, 3), strides=(self.stride, self.stride))(x)
        y = nn.GroupNorm(num_groups=8)(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3))(y)
        y = nn.GroupNorm(num_groups=8)(y)
        if x.shape[-1] != self.features or self.stride != 1:
            x = nn.Conv(self.features, (1, 1), strides=(self.stride, self.stride))(x)
        return nn.relu(x + y)


class PoseEncoder(nn.Module):
    """[N, H, W, 16] feature crops -> [N, out_dim] code."""

    out_dim: int = 128
    widths: Sequence[int] = (64, 64, 128, 256, 512)

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.widths[0], (7, 7), strides=(2, 2))(x)
        x = nn.GroupNorm(num_groups=8)(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="SAME")
        for w in self.widths[1:]:
            x = ConvBlock(features=w, stride=2)(x)
        x = nn.Conv(128, (3, 3))(x)
        x = nn.GroupNorm(num_groups=8)(x)
        x = nn.leaky_relu(x, 0.2)
        x = x.mean(axis=(1, 2))  # global pool (vs 4x4 maxpool + flatten)
        return nn.Dense(self.out_dim)(x)


class PoseCNN(nn.Module):
    """Encoder + quaternion/translation head (RTHead D=1 equivalent)."""

    @nn.compact
    def __call__(self, feats):
        code = PoseEncoder(name="encoder")(feats)
        out = nn.Dense(7, name="head",
                       bias_init=nn.initializers.zeros)(nn.relu(nn.Dense(128)(code)))
        tmat = out[..., 0:3] * 0.1
        rquat = Q.q_normalize(out[..., 3:7] + jnp.asarray([1.0, 0, 0, 0]))
        rmat = Q.q_to_matrix(rquat)
        return jnp.concatenate([rmat.reshape(out.shape[:-1] + (9,)), tmat], -1)
