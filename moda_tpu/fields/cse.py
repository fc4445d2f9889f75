"""CSE surface-embedding network: image crop -> per-pixel 16-d embedding.

TPU-native counterpart of the reference's DensePose-CSE wrapper
(nnutils/cse.py:20-78 + utils/cselib.py) for the trainable ``ft_cse``
path: an encoder-decoder convnet that predicts the 16-d continuous
surface embedding at 112x112. Two ways to obtain weights:

1. distillation from precomputed CSE features (train/cse_distill.py) —
   the reference's mt_cse loss (moda.py:723-731) turned into an offline
   fit, no detectron2 dependency;
2. (when a torch DensePose checkpoint is available) conversion of its
   embedder head; the backbone here is intentionally lightweight since it
   only refines already-computed features.
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp


class DownBlock(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, (3, 3), strides=(2, 2))(x)
        x = nn.GroupNorm(num_groups=8)(x)
        x = nn.relu(x)
        x = nn.Conv(self.features, (3, 3))(x)
        x = nn.GroupNorm(num_groups=8)(x)
        return nn.relu(x)


class UpBlock(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x, skip):
        B, H, W, C = x.shape
        x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
        if skip is not None:
            x = jnp.concatenate([x, skip], -1)
        x = nn.Conv(self.features, (3, 3))(x)
        x = nn.GroupNorm(num_groups=8)(x)
        return nn.relu(x)


class CSENet(nn.Module):
    """[N, H, W, 3] image (H=W=224 nominal) -> [N, H/2, W/2, 16] unit
    embeddings (112x112 at nominal input, matching the CSE crop size)."""

    embed_dim: int = 16
    widths: Sequence[int] = (32, 64, 128, 256)

    @nn.compact
    def __call__(self, img):
        x = nn.Conv(self.widths[0], (7, 7))(img)
        x = nn.GroupNorm(num_groups=8)(x)
        x = nn.relu(x)
        skips = [x]
        for w in self.widths:
            x = DownBlock(features=w)(x)
            skips.append(x)
        skips.pop()  # deepest level has no skip
        for w in reversed(self.widths[:-1]):
            x = UpBlock(features=w)(x, skips.pop())
        feat = nn.Conv(self.embed_dim, (1, 1))(x)
        norm = jnp.sqrt(jnp.maximum(jnp.sum(feat * feat, -1, keepdims=True), 1e-12))
        return feat / norm
