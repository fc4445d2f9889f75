"""Novel-view synthesis: render the learned model along new camera paths.

Re-design of scripts/visualize/nvs.py:41-199: cameras are decoupled from
frame codes, so any trajectory (turntable / input-view / bullet-time over
one frame) renders with any frame's pose+env codes. Rays reuse the
standard eval renderer.
"""
from __future__ import annotations

from typing import Iterable, List

import numpy as np

from moda_tpu.fields.model import MoDAModel, ModelVars, Params
from moda_tpu.render.evalrender import make_frame_renderer


def turntable_cams(base_rtk: np.ndarray, num_views: int, axis: str = "y") -> np.ndarray:
    """Orbit around the object keeping the base camera distance."""
    out = []
    for i in range(num_views):
        ang = 2 * np.pi * i / num_views
        c, s = np.cos(ang), np.sin(ang)
        if axis == "y":
            R = np.asarray([[c, 0, s], [0, 1, 0], [-s, 0, c]])
        else:
            R = np.asarray([[1, 0, 0], [0, c, -s], [0, s, c]])
        rtk = base_rtk.copy()
        rtk[:3, :3] = base_rtk[:3, :3] @ R
        out.append(rtk)
    return np.stack(out).astype(np.float32)


def render_nvs(model: MoDAModel, params: Params, mvars: ModelVars,
               cam_rtks: np.ndarray, embedids: Iterable[int], render_size: int,
               ndepth: int, chunk: int = 32768) -> List[dict]:
    """Render each (camera, frame-code) pair; bullet-time = constant embedid
    with varying cameras; input-view replay = matching pairs."""
    import jax.numpy as jnp

    renderer = make_frame_renderer(model, render_size, ndepth, chunk=chunk,
                                   render_vis=True)
    frames = []
    for rtk, eid in zip(cam_rtks, embedids):
        px, py = float(rtk[3, 2]), float(rtk[3, 3])
        kaug = jnp.asarray([[max(2 * px / render_size, 1e-6),
                             max(2 * py / render_size, 1e-6), 0.0, 0.0]])
        out = renderer(params, mvars, jnp.asarray(rtk)[None], kaug,
                       jnp.asarray([eid]), jnp.zeros((1,), jnp.int32))
        frames.append(out)
    return frames


def save_gif(path: str, frames: List[np.ndarray], fps: int = 10):
    import imageio

    imgs = [(np.clip(f, 0, 1) * 255).astype(np.uint8) for f in frames]
    imageio.mimsave(path, imgs, fps=fps)
