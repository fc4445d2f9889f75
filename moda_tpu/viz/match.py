"""Two-frame correspondence visualization via canonical feature matching.

Re-design of scripts/visualize/match.py:64-166: pixels of a reference
frame are soft-matched into the canonical feature volume (render.pipeline
.feat_match), forward-warped into the target frame's root pose, projected,
and drawn as motion lines.
"""
from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

from moda_tpu.fields.model import MoDAModel, ModelVars, Params
from moda_tpu.render import rays as RB
from moda_tpu.render.pipeline import feat_match, kp_reproj


def match_frames(model: MoDAModel, params: Params, mvars: ModelVars,
                 feats0: np.ndarray, xys0: np.ndarray,
                 rtk0: np.ndarray, rtk1: np.ndarray, kaug: np.ndarray,
                 frameid0: int, frameid1: int, grid_size: int = 20):
    """feats0 [N,16] sampled pixel features of frame 0 at pixels xys0 [N,2];
    returns (canonical pts [N,3], projected pixels in frame 1 [N,2])."""
    import jax
    import jax.numpy as jnp

    feats = jnp.asarray(feats0)
    feats = feats / jnp.maximum(jnp.linalg.norm(feats, axis=-1, keepdims=True), 1e-9)
    pts_pred, _ = feat_match(model, params, feats, mvars.obj_bound, grid_size,
                             None, use_ot=model.cfg.use_ot, is_training=False)

    # forward-warp into frame 1 and project with its camera
    from moda_tpu.core import camera as cam
    Rmat, Tmat, Kinv = cam.prepare_ray_cams(jnp.asarray(rtk1)[None], jnp.asarray(kaug)[None])
    N = feats.shape[0]
    rtk_vec = jnp.concatenate([
        Rmat.reshape(1, 9), Tmat.reshape(1, 3), Kinv.reshape(1, 9)], -1)
    rays = {
        "rtk_vec": jnp.broadcast_to(rtk_vec, (N, 21)),
        "rtk_vec_target": jnp.broadcast_to(rtk_vec, (N, 21)),
    }
    if model.cfg.lbs or model.cfg.neudbs:
        bones_rst, bone_rts = RB.compute_bone_rts(model, params, jnp.asarray([frameid1]))
        rays["bones_rst"] = bones_rst
        rays["bone_rts"] = jnp.broadcast_to(bone_rts[0][None], (N,) + bone_rts.shape[1:])
        rays["rest_pose_code"] = model.apply_rest_pose_code(params, jnp.zeros((1,), jnp.int32))
    proj = kp_reproj(model, params, rays, pts_pred, to_target=False)
    return np.asarray(pts_pred), np.asarray(proj)[:, 0, :2]


def draw_matches(img0: np.ndarray, img1: np.ndarray, xys0: np.ndarray,
                 xys1: np.ndarray, stride: int = 1) -> np.ndarray:
    """Side-by-side image with correspondence lines (match.py vis)."""
    import cv2

    h = max(img0.shape[0], img1.shape[0])
    w0 = img0.shape[1]
    canvas = np.zeros((h, w0 + img1.shape[1], 3), np.float32)
    canvas[: img0.shape[0], :w0] = img0
    canvas[: img1.shape[0], w0:] = img1
    canvas = (canvas * 255).astype(np.uint8).copy()
    for i in range(0, len(xys0), stride):
        p0 = tuple(np.round(xys0[i]).astype(int))
        p1 = tuple(np.round(xys1[i]).astype(int) + np.asarray([w0, 0]))
        color = tuple(int(c) for c in np.random.default_rng(i).integers(64, 255, 3))
        cv2.line(canvas, p0, p1, color, 1)
    return canvas
