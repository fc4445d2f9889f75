"""Eval-time full-image rendering with host-level ray chunking.

Equivalent of the reference's eval render path (render_vid at
train_utils.py:1344-1362 + the chunked loop of nerf_render,
moda.py:874-899) — but each chunk is a fixed-size jitted call (one
compile), padded on the last chunk.
"""
from __future__ import annotations

from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from moda_tpu.fields.model import MoDAModel, ModelVars, Params
from moda_tpu.render import rays as RB
from moda_tpu.render.pipeline import render_rays


def make_frame_renderer(model: MoDAModel, render_size: int, ndepth: int,
                        chunk: int = 32768, render_vis: bool = False,
                        with_flow: bool = False, mesh=None):
    # render_vis: visibility-MLP culling is an NVS-only feature in the
    # reference (nvs.py:150); its eval grid renders uncull
    # (render_rays default, rendering.py:19)
    """Returns render_frame(params, mvars, rtk[1,4,4], kaug[1,4], frameid[1],
    dataid[1], [rtk_target, frameid_target]) -> dict of
    [render_size, render_size, C] images. with_flow renders flo_coarse
    against the paired frame (eval grid parity, train_utils.py:500-505)."""
    model = model.precise()  # eval renders stay fp32/XLA (no bf16 kernels)

    # multi-device: shard each fixed-size ray chunk over the device mesh —
    # data-parallel rendering within a frame (frame-parallel inference,
    # VERDICT r4 #9; reference analogue scripts/render_mgpu.sh)
    ray_sharding = None
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        ray_sharding = NamedSharding(mesh, P("data"))

    @jax.jit
    def _build(params, mvars, rtk, kaug, frameid, dataid):
        return RB.build_rays_image(model, params, mvars, rtk, kaug, frameid,
                                   dataid, render_size)

    @jax.jit
    def _build_pair(params, mvars, rtk, kaug, frameid, dataid, rtk_t, frameid_t):
        return RB.build_rays_image(model, params, mvars, rtk, kaug, frameid,
                                   dataid, render_size, rtk_target=rtk_t,
                                   frameid_target=frameid_t)

    @jax.jit
    def _render_chunk(params, mvars, rays_chunk, key):
        return render_rays(model, params, mvars, rays_chunk, key, ndepth,
                           fine_iter=False, render_vis=render_vis, perturb=0.0)

    @jax.jit
    def _render_chunk_flow(params, mvars, rays_chunk, key):
        return render_rays(model, params, mvars, rays_chunk, key, ndepth,
                           fine_iter=True, render_vis=render_vis, perturb=0.0)

    def render_frame(params: Params, mvars: ModelVars, rtk, kaug, frameid, dataid,
                     key: Optional[jax.Array] = None, rtk_target=None,
                     frameid_target=None) -> Dict[str, np.ndarray]:
        key = key if key is not None else jax.random.key(0)
        if with_flow and rtk_target is not None:
            rays = _build_pair(params, mvars, rtk, kaug, frameid, dataid,
                               rtk_target, frameid_target)
        else:
            rays = _build(params, mvars, rtk, kaug, frameid, dataid)
        R = rays["rays_o"].shape[0]
        outs = []
        render_fn = (_render_chunk_flow if (with_flow and rtk_target is not None)
                     else _render_chunk)
        n_chunks = (R + chunk - 1) // chunk
        for ci in range(n_chunks):
            sl = {}
            for k, v in rays.items():
                if hasattr(v, "ndim") and v.ndim >= 1 and v.shape[0] == R:
                    piece = v[ci * chunk:(ci + 1) * chunk]
                    pad = chunk - piece.shape[0]
                    if pad > 0:
                        piece = jnp.concatenate(
                            [piece, jnp.repeat(piece[-1:], pad, axis=0)], 0)
                    if ray_sharding is not None and chunk % mesh.size == 0:
                        piece = jax.device_put(piece, ray_sharding)
                    sl[k] = piece
                else:
                    sl[k] = v
            outs.append(render_fn(params, mvars, sl, key))
        merged = {}
        for k in outs[0]:
            v = jnp.concatenate([o[k] for o in outs], 0)[:R]
            merged[k] = np.asarray(v).reshape(render_size, render_size, -1)
        return merged

    return render_frame
