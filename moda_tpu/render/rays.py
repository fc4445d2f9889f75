"""Ray-bundle construction: pixel sampling + per-ray codes + target gathers.

TPU-native re-design of moda.nerf_render's preamble (moda.py:1048-1327):
``sample_pxs`` + ``update_rays`` + ``update_delta_rts`` + ``obs_to_rays``,
including uncertainty-guided active sampling (moda.py:1100-1177).
Everything is device-side with static shapes; randomness is explicit keys.

Batch layout ("frame-pair batch", matches the reference's stacking at
moda.py:1362-1417): arrays lead with [2B] where entry b pairs with b+B
(first half = reference frames, second half = paired frames).

  imgs  [2B, 3, P]   P = H*W (batch mode) or line length (lineload)
  masks/vis2d/occ [2B, 1, P];  flow [2B, 2, P];  dp_feats [2B, 16, P]
  rtk [2B, 4, 4]; kaug [2B, 4]; frameid [2B] (absolute); dataid [2B]
  lineid [2B] or None

Internally rays are fully per-ray (the reference's lineload reshape to
(-1, 1) at moda.py:1180-1191): a flat [R] bundle where ray i of the first
half pairs with ray i + R/2. With active sampling, R = 2*(B*nsample +
B*nsample_s) — uniform rays first, then the uncertainty top-k.
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


def ids_to_xys(rand_inds: jnp.ndarray, img_size: int,
               lineid: Optional[jnp.ndarray]) -> jnp.ndarray:
    """Pixel ids [..., ] + entry line ids -> (x, y) coords [..., 2]."""
    if lineid is None:
        x = (rand_inds % img_size).astype(jnp.float32)
        y = (rand_inds // img_size).astype(jnp.float32)
    else:
        x = rand_inds.astype(jnp.float32)
        y = jnp.broadcast_to(lineid.astype(jnp.float32).reshape(
            lineid.shape + (1,) * (rand_inds.ndim - lineid.ndim)), rand_inds.shape)
    return jnp.stack([x, y], -1)


def flip_pair(x: jnp.ndarray) -> jnp.ndarray:
    """Swap reference and paired halves along axis 0."""
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


def _unc_scores(model, params, xys, ts, vid_code, Kinv, embed_alpha):
    """No-grad uncertainty prediction at candidate pixels
    (moda.py:1101-1116). xys [..., 2]; Kinv [..., 3, 3]."""
    xy1 = jnp.concatenate([xys, jnp.ones_like(xys[..., :1])], -1)
    xysn = (xy1[..., None, :] @ jnp.swapaxes(Kinv, -1, -2))[..., 0, :2]
    xyt = jnp.concatenate([xysn, ts], -1)
    xyt_e = model.embed_xyz(xyt, embed_alpha)
    pred = model.apply_unc(params, jnp.concatenate([xyt_e, vid_code], -1))[..., 0]
    return jax.lax.stop_gradient(pred)


def build_rays(
    model: MoDAModel,
    params: Params,
    mvars: ModelVars,
    batch: Dict[str, jnp.ndarray],
    rtk: jnp.ndarray,
    key: jax.Array,
    nsample: int,
    nsample_active: int = 0,
    embed_alpha=None,
) -> RayDict:
    """Build a flat per-ray bundle [R = 2B*(nsample + nsample_active)].

    rtk: [2B, 4, 4] current camera estimates (root pose composed with base,
    intrinsics in row 3), from convert_root_pose.
    nsample_active > 0 enables uncertainty-guided sampling: a 4x candidate
    pool is scored by nerf_unc and the global top B*nsample_active
    candidates (ranked on the reference half, as in moda.py:1146-1158)
    join the uniform rays.
    """
    cfg = model.cfg
    kaug = batch["kaug"]
    frameid = batch["frameid"]
    dataid = batch["dataid"]
    lineid = batch.get("lineid", None)
    # host-sampled sparse batches (data/dataset.py sparsify_batch): the
    # loader uploads only npix sampled pixel columns per entry instead of
    # the full row/frame — host->device bytes shrink ~P/npix (measured
    # 25 MB -> <1 MB per step through the remote-TPU tunnel). pix_ids
    # [2B, npix] holds the global pixel ids; observation arrays are
    # packed [2B, C, npix], gathered by local column.
    pix_ids = batch.get("pix_ids", None)
    bs2 = rtk.shape[0]
    B = bs2 // 2

    k_px, k_act = jax.random.split(key)
    Rmat, Tmat, Kinv = cam.prepare_ray_cams(rtk, kaug)

    # ---------------- pixel selection -> per-ray (entry, pixel) ids
    if pix_ids is not None:
        npix = pix_ids.shape[1]
        rand_inds_u = pix_ids[:, :nsample]  # uniform slots
    else:
        rand_inds_u = sample_pixel_ids(k_px, bs2, nsample, cfg.img_size, lineid)
    # per-ray entry index, first half then second half
    ent_u_first = jnp.repeat(jnp.arange(B), nsample)
    loc_u_first = jnp.tile(jnp.arange(nsample), B)
    pix_u_first = rand_inds_u[:B].reshape(-1)
    pix_u_second = rand_inds_u[B:].reshape(-1)

    if nsample_active > 0:
        ns_a = 4 * (nsample + nsample_active)  # candidate pool (moda.py:1062)
        K = B * nsample_active
        if pix_ids is not None:
            cand_loc0 = npix - ns_a  # pool occupies the last ns_a columns
            cand_inds = pix_ids[:, cand_loc0:]
        else:
            cand_loc0 = 0
            cand_inds = sample_pixel_ids(k_act, bs2, ns_a, cfg.img_size, lineid)
        cand_xys = ids_to_xys(cand_inds, cfg.img_size, lineid)
        # score candidates of the reference half
        ts_all = (batch["frameid_sub"].astype(jnp.float32) / model.max_ts * 2.0 - 1.0)
        ts_c = jnp.broadcast_to(ts_all[:B, None, None], (B, ns_a, 1))
        vid_c = model.apply_vid_code(params, dataid[:B])
        vid_c = jnp.broadcast_to(vid_c[:, None, :], (B, ns_a, vid_c.shape[-1]))
        Kinv_c = jnp.broadcast_to(Kinv[:B, None], (B, ns_a, 3, 3))
        scores = _unc_scores(model, params, cand_xys[:B], ts_c, vid_c, Kinv_c,
                             embed_alpha)  # [B, ns_a]
        flat_scores = scores.reshape(-1)
        _, top = jax.lax.top_k(flat_scores, K)
        ent_a_first = top // ns_a
        loc_a_first = cand_loc0 + top % ns_a
        pix_a_first = cand_inds[:B].reshape(-1)[top]
        # second half: same slots (reference uses first-half ranking for both)
        pix_a_second = cand_inds[B:].reshape(-1)[top]

        ent_first = jnp.concatenate([ent_u_first, ent_a_first])
        loc_first = jnp.concatenate([loc_u_first, loc_a_first])
        pix_first = jnp.concatenate([pix_u_first, pix_a_first])
        pix_second = jnp.concatenate([pix_u_second, pix_a_second])
    else:
        ent_first = ent_u_first
        loc_first = loc_u_first
        pix_first = pix_u_first
        pix_second = pix_u_second

    M = ent_first.shape[0]
    ray_entry = jnp.concatenate([ent_first, ent_first + B])  # [R]
    ray_pix = jnp.concatenate([pix_first, pix_second])  # [R]
    # local column into the packed observation arrays (== global pixel id
    # for dense batches; both halves share slot positions)
    ray_loc = (jnp.concatenate([loc_first, loc_first]) if pix_ids is not None
               else ray_pix)
    R = 2 * M

    ray_lineid = None if lineid is None else lineid[ray_entry]
    xys = ids_to_xys(ray_pix, cfg.img_size, ray_lineid)  # [R, 2]

    # ---------------- raycast per ray
    near_far = mvars.near_far[frameid][ray_entry]
    rays_nt = cam.raycast(xys[:, None, :], Rmat[ray_entry], Tmat[ray_entry],
                          Kinv[ray_entry], near_far)

    rays: RayDict = {
        "rays_o": rays_nt.rays_o[:, 0],
        "rays_d": rays_nt.rays_d[:, 0],
        "near": rays_nt.near[:, 0],
        "far": rays_nt.far[:, 0],
        "rtk_vec": rays_nt.rtk_vec[:, 0],
        "xys": xys,
    }
    if embed_alpha is not None:
        rays["embed_alpha"] = embed_alpha

    rays["rtk_vec_target"] = flip_pair(rays["rtk_vec"])

    # ---------------- per-frame codes gathered per ray (moda.py:1281-1327)
    rf = frameid[ray_entry]
    time_embedded = model.apply_pose_code(params, frameid)
    rays["time_embedded"] = time_embedded[ray_entry]
    if cfg.env_code:
        rays["env_code"] = model.apply_env_code(params, frameid)[ray_entry]
    if cfg.appearance_code:
        rays["appearance_code"] = model.apply_appearance_code(params, frameid)[ray_entry]

    if cfg.lbs or cfg.neudbs:
        bones_rst, bone_rts = compute_bone_rts(model, params, frameid)
        rays["bones_rst"] = bones_rst
        rays["bone_rts"] = bone_rts[ray_entry]
        rays["bone_rts_target"] = flip_pair(rays["bone_rts"])
        rays["rest_pose_code"] = model.apply_rest_pose_code(params, jnp.zeros((1,), jnp.int32))
    if cfg.flowbw:
        rays["time_embedded_target"] = flip_pair(rays["time_embedded"])

    if cfg.use_unc:
        ts_all = batch["frameid_sub"].astype(jnp.float32) / model.max_ts * 2.0 - 1.0
        rays["ts"] = ts_all[ray_entry][:, None]
        rays["vid_code"] = model.apply_vid_code(params, dataid)[ray_entry]
        xy1 = jnp.concatenate([xys, jnp.ones_like(xys[..., :1])], -1)
        rays["xysn"] = (xy1[:, None, :] @ jnp.swapaxes(Kinv[ray_entry], -1, -2))[:, 0, :2]

    # ---------------- observation targets (obs_to_rays, moda.py:1215-1260)
    def gather(img):  # [2B, C, P|npix] -> [R, C]
        return img[ray_entry, :, ray_loc]

    rays["img_at_samp"] = gather(batch["imgs"])
    rays["sil_at_samp"] = gather(batch["masks"])
    rays["vis_at_samp"] = gather(batch["vis2d"])
    rays["flo_at_samp"] = gather(batch["flow"])
    rays["cfd_at_samp"] = gather(batch["occ"])
    if cfg.use_embed:
        feats = gather(batch["dp_feats"])
        feats = feats / jnp.maximum(jnp.linalg.norm(feats, axis=-1, keepdims=True), 1e-9)
        rays["feats_at_samp"] = feats

    # bookkeeping for loss filters: lineload errid indexes the per-line
    # error buffer (frame*img_size + row, moda.py:1355); batch mode falls
    # back to per-frame ids (moda.py:1408)
    rays["frameid"] = rf
    if ray_lineid is not None:
        rays["errid"] = rf * cfg.img_size + ray_lineid.astype(rf.dtype)
    elif "errid" in batch:
        rays["errid"] = batch["errid"][ray_entry]
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
    rtk_target: jnp.ndarray = None,
    frameid_target: jnp.ndarray = None,
) -> RayDict:
    """Full-image ray bundle for eval rendering: every pixel of each frame.

    Shapes: rtk [B,4,4], ... -> rays lead with [B*render_size^2].
    rtk_target/frameid_target (optional): paired-frame camera + codes so
    eval renders include flow (flo_coarse), matching the reference's eval
    grid (train_utils.py:500-505).
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

    if cfg.use_unc:
        # unc-MLP inputs for the eval grid's uncertainty channel
        # (rendering.py:501-516): normalized pixel coords + frame time
        off = jnp.asarray(model.offset, jnp.float32)[dataid]
        ts = ((frameid.astype(jnp.float32) - off) / model.max_ts * 2.0 - 1.0)
        rays["ts"] = flat(jnp.broadcast_to(ts[:, None, None], (B, P, 1)))
        rays["vid_code"] = per_ray(model.apply_vid_code(params, dataid))
        xy1 = jnp.concatenate([xys, jnp.ones_like(xys[..., :1])], -1)
        rays["xysn"] = flat(
            (xy1[..., None, :] @ jnp.swapaxes(Kinv, -1, -2)[:, None])[..., 0, :2])

    if rtk_target is not None and frameid_target is not None:
        Rt, Tt, Kit = cam.prepare_ray_cams(rtk_target, kaug)
        rtk_vec_t = jnp.concatenate(
            [Rt.reshape(B, 1, 9), Tt.reshape(B, 1, 3), Kit.reshape(B, 1, 9)], -1)
        rays["rtk_vec_target"] = flat(jnp.broadcast_to(rtk_vec_t, (B, P, 21)))
        if cfg.lbs or cfg.neudbs:
            _, bone_rts_t = compute_bone_rts(model, params, frameid_target)
            rays["bone_rts_target"] = flat(
                jnp.broadcast_to(bone_rts_t[:, None], (B, P, Bb, D)))
        if cfg.flowbw:
            rays["time_embedded_target"] = per_ray(
                model.apply_pose_code(params, frameid_target))
    return rays
