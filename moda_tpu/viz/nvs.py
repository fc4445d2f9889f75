"""Novel-view synthesis: render the learned model along new camera paths.

Re-design of scripts/visualize/nvs.py:41-199: cameras are decoupled from
frame codes, so any trajectory (turntable / input-view / bullet-time over
one frame) renders with any frame's pose+env codes. Rays reuse the
standard eval renderer.
"""
from __future__ import annotations

import dataclasses
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


# --------------------------------------------------- ctraj-file-driven NVS
def load_root(prefix: str, cap_frame: int = 0) -> np.ndarray:
    """Load saved root trajectories ``<prefix>*.txt`` -> [N,4,4]
    (utils/io.py:173-188)."""
    import glob

    paths = sorted(glob.glob(f"{prefix}*.txt"))
    if cap_frame > 0:
        paths = paths[:cap_frame]
    return np.stack([np.loadtxt(p) for p in paths]).astype(np.float32)


def load_sils(prefix: str, cap_frame: int = 0) -> List[np.ndarray]:
    """Load reference silhouettes ``<prefix>*.png`` (utils/io.py:155-170)."""
    import glob

    import cv2

    paths = sorted(glob.glob(f"{prefix}*.png"))
    if cap_frame > 0:
        paths = paths[:cap_frame]
    return [cv2.imread(p, 0) for p in paths]


def render_nvs_ctraj(model: MoDAModel, params: Params, mvars: ModelVars,
                     rtks: np.ndarray, rndsils: List[np.ndarray],
                     embedids: Iterable[int], ndepth: int, scale: float = 0.1,
                     chunk: int = 32768,
                     mesh_rest_verts: np.ndarray = None) -> List[dict]:
    """NVS along saved camera trajectories composited with reference
    silhouettes (scripts/visualize/nvs.py:41-199):

    - intrinsics scaled by ``scale``; the square render canvas is
      max(sil shape) * scale, the sil resized into it keeping aspect;
    - near/far per camera from the rest-mesh vertices;
    - rendered rgb is masked to the silhouette (white background), then
      cropped back to the silhouette's aspect.

    Returns per-frame dicts {rgb, sil, vis} (the reference writes these as
    pngs + mp4s; callers do the IO)."""
    import cv2
    import jax.numpy as jnp

    from moda_tpu.render.evalrender import make_frame_renderer
    from moda_tpu.train.trainer import get_near_far

    rtks = np.asarray(rtks, np.float32).copy()
    rtks[:, 3] = rtks[:, 3] * scale
    sil_shape = rndsils[0].shape
    img_type = "vert" if sil_shape[0] > sil_shape[1] else "hori"
    img_size = int(max(sil_shape) * scale)

    # per-camera near-far from the canonical shape (nvs.py:93-99)
    pts = (mesh_rest_verts if mesh_rest_verts is not None and len(mesh_rest_verts)
           else np.zeros((1, 3), np.float32))
    nf = get_near_far(np.zeros((len(rtks), 2), np.float32), rtks,
                      np.ones(len(rtks)), pts)

    renderer = make_frame_renderer(model, img_size, ndepth, chunk=chunk,
                                   render_vis=True)
    kaug = jnp.asarray([[1.0, 1.0, 0.0, 0.0]])
    near_far_base = np.asarray(mvars.near_far)

    out_frames = []
    for i, (rtk, eid) in enumerate(zip(rtks, embedids)):
        # resized sil placed in the square canvas (nvs.py:110-119)
        rndsil = rndsils[i]
        rndmask = np.zeros((img_size, img_size), np.float32)
        if img_type == "vert":
            short = int(rndsil.shape[1] * img_size / rndsil.shape[0])
            rndmask[:, :short] = cv2.resize(rndsil.astype(np.float32), (short, img_size))
        else:
            short = int(rndsil.shape[0] * img_size / rndsil.shape[1])
            rndmask[:short] = cv2.resize(rndsil.astype(np.float32), (img_size, short))

        nf_i = near_far_base.copy()
        nf_i[int(eid)] = nf[i]
        mv = dataclasses.replace(mvars, near_far=jnp.asarray(nf_i))
        out = renderer(params, mv, jnp.asarray(rtk)[None], kaug,
                       jnp.asarray([int(eid)]), jnp.zeros((1,), jnp.int32))
        rgb = np.clip(out["img_coarse"], 0, 1)
        sil = np.clip(out["sil_coarse"][..., 0], 0, 1)
        vis = np.clip(out.get("vis_pred", out["sil_coarse"])[..., 0], 0, 1)
        # composite: low-sil and out-of-mask pixels -> white (nvs.py:163-183)
        sil = np.where(sil < 0.5, 0.0, sil)
        rgb = np.where((sil > 0) & (rndmask > 0), rgb.transpose(2, 0, 1),
                       1.0).transpose(1, 2, 0)
        sil = np.where(rndmask > 0, sil, 1.0)
        vis = np.where(rndmask > 0, vis, 1.0)
        if img_type == "vert":
            rgb, sil, vis = rgb[:, :short], sil[:, :short], vis[:, :short]
        else:
            rgb, sil, vis = rgb[:short], sil[:short], vis[:short]
        out_frames.append({"rgb": rgb, "sil": sil, "vis": vis})
    return out_frames
