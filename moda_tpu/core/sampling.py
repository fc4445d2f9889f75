"""Depth sampling along rays: stratified + importance (sample_pdf), pure JAX.

Functional equivalents of rendering.py:67-89 (stratified z with perturb)
and rendering.py:582-623 (sample_pdf inverse-CDF importance sampling).
Static shapes; randomness via explicit PRNG keys.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def stratified_zvals(
    near: jnp.ndarray,
    far: jnp.ndarray,
    n_samples: int,
    key: jax.Array | None,
    perturb: float = 0.0,
    use_disp: bool = False,
) -> jnp.ndarray:
    """near/far [N,1] -> z_vals [N, n_samples]."""
    z_steps = jnp.linspace(0.0, 1.0, n_samples, dtype=near.dtype)
    if not use_disp:
        z_vals = near * (1.0 - z_steps) + far * z_steps
    else:
        z_vals = 1.0 / (1.0 / near * (1.0 - z_steps) + 1.0 / far * z_steps)

    if perturb > 0 and key is not None:
        mid = 0.5 * (z_vals[:, :-1] + z_vals[:, 1:])
        upper = jnp.concatenate([mid, z_vals[:, -1:]], -1)
        lower = jnp.concatenate([z_vals[:, :1], mid], -1)
        u = jax.random.uniform(key, z_vals.shape, dtype=z_vals.dtype)
        z_vals = lower + (upper - lower) * (perturb * u)
    return z_vals


def sample_pdf(
    bins: jnp.ndarray,
    weights: jnp.ndarray,
    n_importance: int,
    key: jax.Array | None,
    det: bool = False,
    eps: float = 1e-5,
) -> jnp.ndarray:
    """Importance-sample n_importance depths from a piecewise-constant pdf.

    bins    [N, M+1] midpoints (as in the reference: z_vals_mid)
    weights [N, M]
    Matches rendering.py:582-623; vectorized searchsorted.
    """
    n_rays, n_bins = weights.shape
    weights = weights + eps
    pdf = weights / jnp.sum(weights, -1, keepdims=True)
    cdf = jnp.cumsum(pdf, -1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[:, :1]), cdf], -1)  # [N, M+1]

    if det or key is None:
        u = jnp.linspace(0.0, 1.0, n_importance, dtype=bins.dtype)
        u = jnp.broadcast_to(u, (n_rays, n_importance))
    else:
        u = jax.random.uniform(key, (n_rays, n_importance), dtype=bins.dtype)

    inds = jax.vmap(lambda c, uu: jnp.searchsorted(c, uu, side="right"))(cdf, u)
    below = jnp.clip(inds - 1, 0, n_bins)
    above = jnp.clip(inds, 0, n_bins)

    cdf_b = jnp.take_along_axis(cdf, below, -1)
    cdf_a = jnp.take_along_axis(cdf, above, -1)
    bins_b = jnp.take_along_axis(bins, jnp.clip(below, 0, bins.shape[1] - 1), -1)
    bins_a = jnp.take_along_axis(bins, jnp.clip(above, 0, bins.shape[1] - 1), -1)

    denom = cdf_a - cdf_b
    denom = jnp.where(denom < eps, 1.0, denom)
    return bins_b + (u - cdf_b) / denom * (bins_a - bins_b)
