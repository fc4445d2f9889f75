"""Positional (Fourier) embedding with coarse-to-fine windowing, pure JAX.

Functional equivalent of nerf.py:13-75 (Embedding). The window
w_j = 0.5*(1 + cos(pi + pi*clip(alpha - j, 0, 1))) anneals high
frequencies in as `alpha` ramps from ~6 to N_freqs.

Output layout matches the reference: [x, then for each freq (sin, cos) of
all input channels] i.e. out[..., :C] = x; the rest is
(N_freqs, 2, C)-shaped blocks flattened — identical ordering so converted
weights stay compatible.
"""
from __future__ import annotations

from functools import partial

import jax.numpy as jnp
import numpy as np


def embed_dim(in_channels: int, n_freqs: int) -> int:
    return in_channels * (2 * n_freqs + 1)


def positional_embed(
    x: jnp.ndarray, n_freqs: int, alpha: jnp.ndarray | float | None = None, logscale: bool = True
) -> jnp.ndarray:
    """Embed x [..., C] -> [..., C*(1+2*n_freqs)].

    alpha: coarse-to-fine window parameter (None = all frequencies on).
    """
    if n_freqs <= 0:
        return x
    C = x.shape[-1]
    if logscale:
        freqs = 2.0 ** np.arange(n_freqs, dtype=np.float32)
    else:
        freqs = np.linspace(1.0, 2.0 ** (n_freqs - 1), n_freqs, dtype=np.float32)
    freqs = jnp.asarray(freqs, dtype=x.dtype)

    # [..., F, C]
    xf = x[..., None, :] * freqs[:, None]
    sin = jnp.sin(xf)
    cos = jnp.cos(xf)
    out = jnp.stack([sin, cos], axis=-2)  # [..., F, 2, C]

    if alpha is not None:
        window = jnp.clip(alpha - jnp.arange(n_freqs, dtype=x.dtype), 0.0, 1.0)
        window = 0.5 * (1.0 + jnp.cos(jnp.pi * window + jnp.pi))
        out = out * window[:, None, None]

    out = out.reshape(x.shape[:-1] + (n_freqs * 2 * C,))
    return jnp.concatenate([x, out], axis=-1)


def make_embedder(in_channels: int, n_freqs: int, logscale: bool = True):
    """Returns (fn(x, alpha=None) -> embedded, out_dim)."""
    fn = partial(positional_embed, n_freqs=n_freqs, logscale=logscale)
    return fn, embed_dim(in_channels, n_freqs)
