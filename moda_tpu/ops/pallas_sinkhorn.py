"""Pallas TPU kernel: fused low-rank Sinkhorn iterations for feat-match OT.

The OT in feat_match (render/pipeline.py) runs 20 Sinkhorn iterations of
matvecs against K = exp(-(1-F V^T)/eps), K being [N rays, M grid points]
(~2048 x 8000). Materialized, each iteration streams K from HBM twice:
40 x 65 MB — bandwidth bound. But K has rank-16 structure under the exp:
this kernel recomputes K tiles on the fly from F [N,16] and V [M,16]
(both resident in VMEM), trading a tiny MXU matmul + VPU exp for the HBM
traffic. One fused kernel performs the K^T a and K b products per
iteration; the 20-step loop runs at the JAX level.

Shapes are padded to multiples of the tile; padding columns of V are
masked by sending their cost to -inf (K=0).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kta_kernel(feats_ref, vol_ref, a_ref, mvalid_ref, b_out_ref, *, inv_eps, prob2):
    """One M-tile: b_tile = prob2 / (K_tile^T a + 1e-8).

    feats [N,16]; vol_tile [MT,16]; a [N,1]; mvalid [MT,1] (1=real col).
    """
    cost = jnp.dot(vol_ref[:], feats_ref[:].T, preferred_element_type=jnp.float32)
    K = jnp.exp((cost - 1.0) * inv_eps)  # [MT, N]
    K = K * mvalid_ref[:]
    kta = jnp.dot(K, a_ref[:], preferred_element_type=jnp.float32)  # [MT,1]
    b_out_ref[:] = prob2 / (kta + 1e-8)


def _kb_kernel(feats_ref, vol_ref, b_ref, mvalid_ref, a_out_ref, *, inv_eps, prob1):
    """Accumulate over M-tiles: a = prob1 / (K b + 1e-8).

    Sequential TPU grid revisits a_out every step; accumulate then finish.
    """
    i = pl.program_id(0)
    n_i = pl.num_programs(0)

    @pl.when(i == 0)
    def _():
        a_out_ref[:] = jnp.zeros_like(a_out_ref)

    cost = jnp.dot(feats_ref[:], vol_ref[:].T, preferred_element_type=jnp.float32)
    K = jnp.exp((cost - 1.0) * inv_eps) * mvalid_ref[:].T  # [N, MT]
    a_out_ref[:] += jnp.dot(K, b_ref[:], preferred_element_type=jnp.float32)

    @pl.when(i == n_i - 1)
    def _():
        a_out_ref[:] = prob1 / (a_out_ref[:] + 1e-8)


@partial(jax.jit, static_argnames=("eps", "iters", "tile_m", "interpret"))
def sinkhorn_lowrank(feats: jnp.ndarray, vol_feat: jnp.ndarray, eps: float = 0.03,
                     iters: int = 20, tile_m: int = 1024, interpret: bool = False):
    """Run Sinkhorn on K = exp(-(1 - feats@vol^T)/eps) without materializing K.

    feats [N,16] unit; vol_feat [M,16] unit. Returns (a [N,1], b [M,1])
    scalings such that diag(a) K diag(b) is the transport plan."""
    N = feats.shape[0]
    M = vol_feat.shape[0]
    pad_m = (-M) % tile_m
    volp = jnp.pad(vol_feat, ((0, pad_m), (0, 0)))
    mvalid = jnp.pad(jnp.ones((M, 1), jnp.float32), ((0, pad_m), (0, 0)))
    Mp = M + pad_m
    inv_eps = 1.0 / eps
    prob1 = 1.0 / N
    prob2 = 1.0 / M

    grid = (Mp // tile_m,)

    kta = pl.pallas_call(
        partial(_kta_kernel, inv_eps=inv_eps, prob2=prob2),
        grid=grid,
        in_specs=[
            pl.BlockSpec((N, 16), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_m, 16), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((N, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_m, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_m, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp, 1), jnp.float32),
        interpret=interpret,
    )

    kb = pl.pallas_call(
        partial(_kb_kernel, inv_eps=inv_eps, prob1=prob1),
        grid=grid,
        in_specs=[
            pl.BlockSpec((N, 16), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_m, 16), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_m, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_m, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((N, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, 1), jnp.float32),
        interpret=interpret,
    )

    def body(_, a):
        b = kta(feats, volp, a, mvalid)
        a = kb(feats, volp, b, mvalid)
        return a

    a0 = jnp.full((N, 1), 1.0 / N, jnp.float32)
    a = jax.lax.fori_loop(0, iters, body, a0)
    b = kta(feats, volp, a, mvalid)[:M]
    return a, b
