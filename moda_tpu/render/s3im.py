"""S3IM: stochastic structural similarity over shuffled virtual patches.

JAX re-design of loss_utils.py:574-702 (SSIM window conv + S3IM shuffling,
from "S3IM: Stochastic Structural SIMilarity..." ICCV'23): masked ray
colors are tiled into a virtual patch, randomly permuted ``repeat_time``
times, concatenated, and compared with a strided SSIM. Convolutions map
to XLA's conv primitive; the permutation uses an explicit PRNG key.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _gaussian_kernel(size: int, sigma: float) -> np.ndarray:
    x = np.arange(size) - size // 2
    g = np.exp(-(x ** 2) / (2 * sigma ** 2))
    g = g / g.sum()
    return np.outer(g, g).astype(np.float32)


def _ssim(img1: jnp.ndarray, img2: jnp.ndarray, kernel_size: int = 4,
          stride: int = 4, sigma: float = 1.5) -> jnp.ndarray:
    """Mean SSIM of [H, W, C] images, per-channel window conv w/ stride."""
    k = jnp.asarray(_gaussian_kernel(kernel_size, sigma))[:, :, None, None]
    C = img1.shape[-1]
    kern = jnp.tile(k, (1, 1, 1, C))  # depthwise

    def conv(x):
        x = x[None]  # NHWC
        return jax.lax.conv_general_dilated(
            x, kern, window_strides=(stride, stride), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=C,
        )[0]

    mu1 = conv(img1)
    mu2 = conv(img2)
    mu1_sq, mu2_sq, mu12 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    s1 = conv(img1 * img1) - mu1_sq
    s2 = conv(img2 * img2) - mu2_sq
    s12 = conv(img1 * img2) - mu12
    C1, C2 = 0.01 ** 2, 0.03 ** 2
    ssim_map = ((2 * mu12 + C1) * (2 * s12 + C2)) / ((mu1_sq + mu2_sq + C1) * (s1 + s2 + C2))
    return ssim_map.mean()


@partial(jax.jit, static_argnames=("kernel_size", "stride", "repeat_time",
                                   "patch_height", "patch_width"))
def s3im_loss(src: jnp.ndarray, tar: jnp.ndarray, mask: jnp.ndarray,
              key: jax.Array, kernel_size: int = 4, stride: int = 4,
              repeat_time: int = 10, patch_height: int = 32,
              patch_width: int = 32) -> jnp.ndarray:
    """src/tar [R,3] ray colors, mask [R,1]. Returns 1 - SSIM."""
    src = (src * mask).reshape(-1, 3)
    tar = (tar * mask).reshape(-1, 3)
    n = src.shape[0]
    need = patch_height * patch_width
    reps = -(-need // n)
    src = jnp.tile(src, (reps, 1))[:need]
    tar = jnp.tile(tar, (reps, 1))[:need]

    perms = [jnp.arange(need)]
    keys = jax.random.split(key, repeat_time)
    for i in range(1, repeat_time):
        perms.append(jax.random.permutation(keys[i], need))
    idx = jnp.concatenate(perms)
    src_all = src[idx].T.reshape(3, patch_height, patch_width * repeat_time)
    tar_all = tar[idx].T.reshape(3, patch_height, patch_width * repeat_time)
    return 1.0 - _ssim(jnp.transpose(src_all, (1, 2, 0)),
                       jnp.transpose(tar_all, (1, 2, 0)),
                       kernel_size=kernel_size, stride=stride)
