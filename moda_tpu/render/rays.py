"""Ray-bundle construction: pixel sampling + per-ray codes + target gathers.

TPU-native re-design of moda.nerf_render's preamble (moda.py:1048-1327):
``sample_pxs`` + ``update_rays`` + ``update_delta_rts`` + ``obs_to_rays``.
Everything is device-side with static shapes; randomness is explicit keys.

Batch layout ("frame-pair batch", matches the reference's stacking at
moda.py:1362-1417): arrays lead with [2B] where entry b pairs with b+B
(first half = reference frames, second half = paired frames).

  imgs  [2B, 3, P]   P = H*W (batch mode) or line length (lineload)
  masks/vis2d/occ [2B, 1, P];  flow [2B, 2, P];  dp_feats [2B, 16, P]
  rtk [2B, 4, 4]; kaug [2B, 4]; frameid [2B] (absolute); dataid [2B]
  lineid [2B] or None
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from moda_tpu.core import camera as cam
from moda_tpu.core import skinning as SK
from moda_tpu.fields.model import MoDAModel, ModelVars, Params

RayDict = Dict[str, jnp.ndarray]


def sample_pixel_ids(key, bs: int, nsample: int, img_size: int,
                     lineid: Optional[jnp.ndarray]) -> jnp.ndarray:
    """Random pixel indices [bs, nsample] into the flattened pixel axis.

    Batch mode: uniform over img_size^2. Lineload: uniform over the line
    (img_size pixels), geom_utils.py:796-827.
    """
    if lineid is None:
        return jax.random.randint(key, (bs, nsample), 0, img_size * img_size)
    return jax.random.randint(key, (bs, nsample), 0, img_size)


def ids_to_xys(rand_inds: jnp.ndarray, img_size: int, lineid: Optional[jnp.ndarray]) -> jnp.ndarray:
    """Pixel ids -> (x, y) coords [bs, ns, 2]."""
    if lineid is None:
        x = (rand_inds % img_size).astype(jnp.float32)
        y = (rand_inds // img_size).astype(jnp.float32)
    else:
        x = rand_inds.astype(jnp.float32)
        y = jnp.broadcast_to(lineid[:, None].astype(jnp.float32), rand_inds.shape)
    return jnp.stack([x, y], -1)


def gather_at(img: jnp.ndarray, rand_inds: jnp.ndarray) -> jnp.ndarray:
    """img [bs, C, P], rand_inds [bs, ns] -> [bs, ns, C]."""
    g = jnp.take_along_axis(img, rand_inds[:, None, :], axis=2)  # [bs, C, ns]
    return jnp.swapaxes(g, 1, 2)


def flip_pair(x: jnp.ndarray) -> jnp.ndarray:
    """Swap reference and paired halves along axis 0 ([2B, ...])."""
    B = x.shape[0] // 2
    return jnp.concatenate([x[B:], x[:B]], axis=0)


def compute_bone_rts(model: MoDAModel, params: Params, frameid: jnp.ndarray):
    """Per-frame delta bone transforms + rest-corrected bones.

    Returns (bones_rst [B,10], bone_rts [N, B, 8|12]) — the reference's
    update_delta_rts (moda.py:1262-1279)."""
    cfg = model.cfg
    rts_fw = model.body_rts(params, frameid)  # [N,B,8|12]
    rts_rst = model.body_rts_rest(params)  # [1,B,8|12]
    if cfg.neudbs:
        bones_rst = SK.correct_bones_dq(params["bones"], rts_rst)
        bone_rts = SK.correct_rest_pose_dq(rts_fw, rts_rst[0])
    else:
        bones_rst = SK.correct_bones_rts(params["bones"], rts_rst[0])
        bone_rts = SK.correct_rest_pose_rts(rts_fw, rts_rst[0])
    return bones_rst, bone_rts


def build_rays(
    model: MoDAModel,
    params: Params,
    mvars: ModelVars,
    batch: Dict[str, jnp.ndarray],
    rtk: jnp.ndarray,
    key: jax.Array,
    nsample: int,
    embed_alpha=None,
) -> RayDict:
    """Build a flat ray bundle [R = 2B*nsample] from a frame-pair batch.

    rtk: [2B, 4, 4] current camera estimates (root pose composed with base,
    intrinsics in row 3) — computed by the caller from params (convert_root_pose).
    """
    cfg = model.cfg
    kaug = batch["kaug"]
    frameid = batch["frameid"]
    dataid = batch["dataid"]
    lineid = batch.get("lineid", None)
    bs2 = rtk.shape[0]

    k_px, k_rest = jax.random.split(key)
    rand_inds = sample_pixel_ids(k_px, bs2, nsample, cfg.img_size, lineid)
    xys = ids_to_xys(rand_inds, cfg.img_size, lineid)

    Rmat, Tmat, Kinv = cam.prepare_ray_cams(rtk, kaug)
    near_far = mvars.near_far[frameid]
    rays_nt = cam.raycast(xys, Rmat, Tmat, Kinv, near_far)

    R = bs2 * nsample

    def flat(x):
        return x.reshape((R,) + x.shape[2:])

    rays: RayDict = {
        "rays_o": flat(rays_nt.rays_o),
        "rays_d": flat(rays_nt.rays_d),
        "near": flat(rays_nt.near),
        "far": flat(rays_nt.far),
        "rtk_vec": flat(rays_nt.rtk_vec),
        "xys": flat(rays_nt.xys),
    }
    if embed_alpha is not None:
        rays["embed_alpha"] = embed_alpha

    # paired-frame attributes: flip halves then flatten
    rays["rtk_vec_target"] = flat(flip_pair(rays_nt.rtk_vec))

    # per-frame codes, broadcast per ray (moda.py:1281-1327)
    def per_ray(codes):  # [2B, D] -> [R, D]
        return flat(jnp.broadcast_to(codes[:, None, :], (bs2, nsample, codes.shape[-1])))

    time_embedded = model.apply_pose_code(params, frameid)
    rays["time_embedded"] = per_ray(time_embedded)
    if cfg.env_code:
        rays["env_code"] = per_ray(model.apply_env_code(params, frameid))
    if cfg.appearance_code:
        rays["appearance_code"] = per_ray(model.apply_appearance_code(params, frameid))

    if cfg.lbs or cfg.neudbs:
        bones_rst, bone_rts = compute_bone_rts(model, params, frameid)
        rays["bones_rst"] = bones_rst
        B = bone_rts.shape[1]
        D = bone_rts.shape[2]
        rays["bone_rts"] = flat(
            jnp.broadcast_to(bone_rts[:, None], (bs2, nsample, B, D)))
        bone_rts_t = flip_pair(bone_rts)
        rays["bone_rts_target"] = flat(
            jnp.broadcast_to(bone_rts_t[:, None], (bs2, nsample, B, D)))
        rays["rest_pose_code"] = model.apply_rest_pose_code(params, jnp.zeros((1,), jnp.int32))
    if cfg.flowbw:
        rays["time_embedded_target"] = per_ray(flip_pair(time_embedded))

    if cfg.use_unc:
        ts = batch["frameid_sub"].astype(jnp.float32) / model.max_ts * 2.0 - 1.0
        rays["ts"] = flat(jnp.broadcast_to(ts[:, None, None], (bs2, nsample, 1)))
        vid_code = model.apply_vid_code(params, dataid)
        rays["vid_code"] = per_ray(vid_code)
        xy1 = jnp.concatenate([xys, jnp.ones_like(xys[..., :1])], -1)
        xysn = (xy1 @ jnp.swapaxes(Kinv, -1, -2))[..., :2]
        rays["xysn"] = flat(xysn)

    # observation targets (obs_to_rays, moda.py:1238-1260)
    rays["img_at_samp"] = flat(gather_at(batch["imgs"], rand_inds))
    rays["sil_at_samp"] = flat(gather_at(batch["masks"], rand_inds))
    rays["vis_at_samp"] = flat(gather_at(batch["vis2d"], rand_inds))
    rays["flo_at_samp"] = flat(gather_at(batch["flow"], rand_inds))
    rays["cfd_at_samp"] = flat(gather_at(batch["occ"], rand_inds))
    if cfg.use_embed:
        feats = gather_at(batch["dp_feats"], rand_inds)
        feats = feats / jnp.maximum(jnp.linalg.norm(feats, axis=-1, keepdims=True), 1e-9)
        rays["feats_at_samp"] = flat(feats)

    # bookkeeping for loss filters (frame/err ids per ray)
    rays["frameid"] = flat(jnp.broadcast_to(frameid[:, None], (bs2, nsample)))
    if "errid" in batch:
        rays["errid"] = flat(jnp.broadcast_to(batch["errid"][:, None], (bs2, nsample)))
    return rays


def build_rays_image(
    model: MoDAModel,
    params: Params,
    mvars: ModelVars,
    rtk: jnp.ndarray,
    kaug: jnp.ndarray,
    frameid: jnp.ndarray,
    dataid: jnp.ndarray,
    render_size: int,
    embed_alpha=None,
) -> RayDict:
    """Full-image ray bundle for eval rendering: every pixel of each frame.

    Shapes: rtk [B,4,4], ... -> rays lead with [B*render_size^2].
    """
    cfg = model.cfg
    B = rtk.shape[0]
    P = render_size * render_size
    ii = jnp.arange(P)
    xys = jnp.stack([(ii % render_size).astype(jnp.float32),
                     (ii // render_size).astype(jnp.float32)], -1)
    xys = jnp.broadcast_to(xys[None], (B, P, 2))

    Rmat, Tmat, Kinv = cam.prepare_ray_cams(rtk, kaug)
    near_far = mvars.near_far[frameid]
    rays_nt = cam.raycast(xys, Rmat, Tmat, Kinv, near_far)

    R = B * P

    def flat(x):
        return x.reshape((R,) + x.shape[2:])

    rays: RayDict = {
        "rays_o": flat(rays_nt.rays_o),
        "rays_d": flat(rays_nt.rays_d),
        "near": flat(rays_nt.near),
        "far": flat(rays_nt.far),
        "rtk_vec": flat(rays_nt.rtk_vec),
        "xys": flat(rays_nt.xys),
    }
    if embed_alpha is not None:
        rays["embed_alpha"] = embed_alpha

    def per_ray(codes):
        return flat(jnp.broadcast_to(codes[:, None, :], (B, P, codes.shape[-1])))

    time_embedded = model.apply_pose_code(params, frameid)
    rays["time_embedded"] = per_ray(time_embedded)
    if cfg.env_code:
        rays["env_code"] = per_ray(model.apply_env_code(params, frameid))
    if cfg.appearance_code:
        rays["appearance_code"] = per_ray(model.apply_appearance_code(params, frameid))
    if cfg.lbs or cfg.neudbs:
        bones_rst, bone_rts = compute_bone_rts(model, params, frameid)
        rays["bones_rst"] = bones_rst
        Bb, D = bone_rts.shape[1], bone_rts.shape[2]
        rays["bone_rts"] = flat(jnp.broadcast_to(bone_rts[:, None], (B, P, Bb, D)))
        rays["rest_pose_code"] = model.apply_rest_pose_code(params, jnp.zeros((1,), jnp.int32))
    return rays
