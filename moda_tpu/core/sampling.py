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

    # Inverse-CDF lookup WITHOUT searchsorted/gather: on TPU, vmapped
    # searchsorted lowers to a while loop and take_along_axis to serial
    # gathers — together 18 ms/step at the ft2 recipe shape, vs <1 ms for
    # the dense masked reductions below (the CDF is sorted, so the
    # "cdf_j <= u" mask is a prefix and index lookups become prefix
    # max/min over ~64 bins — pure fusible VPU work).
    #   searchsorted(cdf, u, 'right') = #{j: cdf_j <= u}; below = cnt-1,
    #   above = cnt (clipped). Prefix mask => value-at-below = masked max,
    #   value-at-above = unmasked min (with all-masked fallback = last).
    mask = cdf[:, None, :] <= u[:, :, None]  # [N, n_imp, M+1], prefix-true
    neg = jnp.finfo(bins.dtype).max
    cdf_b = jnp.max(jnp.where(mask, cdf[:, None, :], -neg), -1)
    cdf_a = jnp.min(jnp.where(mask, neg, cdf[:, None, :]), -1)
    cdf_a = jnp.where(cdf_a == neg, cdf[:, -1:], cdf_a)
    # bins has one fewer column; below/above are additionally clipped to
    # M-1, i.e. drop the mask's last column / fall back to bins[:, -1]
    maskb = mask[..., : bins.shape[1]]
    bins_b = jnp.max(jnp.where(maskb, bins[:, None, :], -neg), -1)
    bins_b = jnp.where(bins_b == -neg, bins[:, :1], bins_b)  # below==0 edge
    bins_a = jnp.min(jnp.where(maskb, neg, bins[:, None, :]), -1)
    bins_a = jnp.where(bins_a == neg, bins[:, -1:], bins_a)

    denom = cdf_a - cdf_b
    denom = jnp.where(denom < eps, 1.0, denom)
    return bins_b + (u - cdf_b) / denom * (bins_a - bins_b)
