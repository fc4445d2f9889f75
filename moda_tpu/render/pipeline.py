"""The fused ray-rendering pipeline (single jitted function, static shapes).

TPU-first re-design of nnutils/rendering.py:19-623 plus the feat-match /
reprojection losses of nnutils/loss_utils.py:165-405. The reference chunks
rays and MLP points on the host (rendering.py:156, moda.py:876); here the
entire ray batch flows through one XLA program — batched einsums land on
the MXU and elementwise work fuses on the VPU.

Ray bundles are plain dicts of arrays, all leading with [R] (total rays):
  required:  rays_o, rays_d, near, far, xys [R,2], rtk_vec [R,21]
  codes:     time_embedded [R,D], env_code [R,64], bone_rts [R,B,8|12]
  pair corr: rtk_vec_target, bone_rts_target (optional)
  unc:       ts [R,1], vid_code [R,32], xysn [R,2] (optional)
  targets:   img_at_samp [R,3], sil_at_samp [R,1], vis_at_samp [R,1],
             flo_at_samp [R,2], cfd_at_samp [R,1], feats_at_samp [R,16]
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from moda_tpu.config import MoDAConfig
from moda_tpu.core import camera as cam
from moda_tpu.core import density as DN
from moda_tpu.core import sampling as SP
from moda_tpu.core import quat as Q
from moda_tpu.core import skinning as SK
from moda_tpu.fields.model import MoDAModel, ModelVars, Params
from moda_tpu.render.s3im import s3im_loss

RayDict = Dict[str, jnp.ndarray]


def compute_pts_exp(pts_prob: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Expected 3D point under ray weights (loss_utils.py:165-175).

    pts [R,S,3], pts_prob [R,S] -> [R,3].
    """
    p = pts_prob / (1e-9 + pts_prob.sum(-1, keepdims=True))
    return (pts * p[..., None]).sum(-2)


def vrender_flo(weights: jnp.ndarray, xyz_target: jnp.ndarray, xys: jnp.ndarray, img_size: int):
    """Render 2D flow from per-sample target projections (geom_utils.py:1704-1743).

    weights [R,S]; xyz_target [R,S,3] (projected px coords + depth);
    xys [R,2] -> (flo [R,2], valid [R,1]).
    """
    xy_target = xyz_target[..., :2]
    invalid = jnp.logical_or(
        xyz_target[..., 2] < 1e-5,
        jnp.linalg.norm(xy_target, axis=-1) > 2.0 * img_size,
    )
    w = jnp.where(invalid, 0.0, weights)
    xy_t = jnp.where(invalid[..., None], 0.0, xy_target)
    w = w / (1e-9 + w.sum(-1, keepdims=True))
    flo = ((xy_t - xys[:, None, :]) * w[..., None]).sum(-2)
    flo = flo / img_size * 2.0
    valid = (invalid.sum(-1) == 0).astype(flo.dtype)[..., None]
    return flo, valid


def _backward_warp(model, params, rays, xyz, time_embedded, alpha, use_dskin=False):
    """Camera/root-space points -> canonical, via NeuDBS or LBS backward
    skinning (rendering.py:289-326). Returns (xyz_canonical, skin_bw, aux)."""
    cfg = model.cfg
    bones_rst = rays["bones_rst"]  # [B,10] rest-corrected bones
    bone_rts_fw = rays["bone_rts"]  # [R,B,8|12] delta fw
    skin_aux = params["skin_aux"]

    if cfg.neudbs:
        bones_dfm = SK.bone_transform_dq(bones_rst, bone_rts_fw)
    else:
        bones_dfm = SK.bone_transform_rts(bones_rst, bone_rts_fw)

    # skinning weights in deformed space. embed_raw: the NUM_FREQS
    # positional embed runs inside the fused kernel (the XLA embed chain
    # is minor-dim-3 layout-bound — DESIGN.md §6c)
    dskin = None
    if cfg.nerf_skin and use_dskin:
        dskin = model.apply_skin(params, xyz, code_trunk=time_embedded,
                                 embed_raw=True, embed_alpha=alpha)
    skin_bw = SK.skinning_weights(bones_dfm, xyz, dskin, skin_aux[0])

    dis = None
    if cfg.nerf_dis:
        dis = model.apply_dis(params, xyz, code_trunk=time_embedded,
                              embed_raw=True, embed_alpha=alpha)

    if cfg.neudbs:
        xyz_c, _ = SK.neu_dbs(bones_rst, bone_rts_fw, skin_bw, xyz, dis=dis, backward=True)
    else:
        xyz_c, _ = SK.lbs(bones_rst, bone_rts_fw, skin_bw, xyz, backward=True)
    return xyz_c, skin_bw, dis


def _forward_warp(model, params, rays, xyz_c, bone_rts, rest_code, alpha,
                  use_dskin=False, use_dis=True):
    """Canonical -> frame with forward skinning (skin at rest pose).

    use_dis: apply the displacement field before the forward blend
    (geom_utils.py:424-429). The reprojection path must NOT: the
    reference's kp_reproj calls neu_dbs without nerf_dis
    (loss_utils.py:253-259). Returns (xyz_frame, skin_fw, dis)."""
    cfg = model.cfg
    bones_rst = rays["bones_rst"]
    skin_aux = params["skin_aux"]
    dskin = None
    if cfg.nerf_skin and use_dskin:
        dskin = model.apply_skin(params, xyz_c, code_trunk=rest_code,
                                 embed_raw=True, embed_alpha=alpha)

    dis = None
    if cfg.nerf_dis and use_dis:
        dis = model.apply_dis(params, xyz_c, code_trunk=rest_code,
                              embed_raw=True, embed_alpha=alpha)
    skin_fw = SK.skinning_weights(bones_rst, xyz_c, dskin, skin_aux[0])

    if cfg.neudbs:
        xyz_f, _ = SK.neu_dbs(bones_rst, bone_rts, skin_fw, xyz_c, dis=dis, backward=False)
    else:
        xyz_f, _ = SK.lbs(bones_rst, bone_rts, skin_fw, xyz_c, backward=False)
    return xyz_f, skin_fw, dis


def _project_with_rtk_vec(xyz: jnp.ndarray, rtk_vec: jnp.ndarray):
    """Project [R,S,3] (or [R,1,3]) points with per-ray rtk_vec [R,21]."""
    R = xyz.shape[0]
    Rmat = rtk_vec[:, 0:9].reshape(R, 3, 3)
    Tmat = rtk_vec[:, 9:12]
    Kinv = rtk_vec[:, 12:21].reshape(R, 3, 3)
    K = cam.mat2K(cam.Kmatinv(Kinv))
    pts = cam.obj_to_cam(xyz, Rmat, Tmat)
    return cam.pinhole_cam(pts, K)


def _inference(model, params, rays, xyz, dir_, dir_embedded, z_vals, key, noise_std, cfg,
               clip_bound=None, vis_pred=None):
    """Evaluate the coarse/feat MLPs and composite (rendering.py:124-237)."""
    R, S = xyz.shape[0], xyz.shape[1]
    alpha = rays.get("embed_alpha", None)
    # per-ray dir-branch codes stay [R, cd]; broadcast over samples happens
    # inside the fused kernel (or in the flax fallback) — HBM never holds
    # the widened [R, S, 63+cd] trunk input. embed_raw: the positional
    # embed also runs in-kernel from the raw [R, S, 3] points
    code_dir_parts = [dir_embedded]
    if "env_code" in rays:
        code_dir_parts.append(rays["env_code"])
    if "appearance_code" in rays:
        code_dir_parts.append(rays["appearance_code"])
    code_dir = jnp.concatenate(code_dir_parts, -1)
    if cfg.use_embed:
        # one fused launch for trunk + CSE-feature head (same points)
        out, feat = model.apply_coarse_feat(params, xyz, code_dir=code_dir,
                                            embed_raw=True, embed_alpha=alpha)
    else:
        out = model.apply_coarse(params, xyz, code_dir=code_dir,
                                 embed_raw=True, embed_alpha=alpha)
    rgbs = out[..., :3]
    sigmas_raw = out[..., 3]

    if not cfg.use_embed:
        feat = jnp.zeros_like(rgbs)

    deltas = DN.ray_deltas(z_vals, dir_)
    if noise_std > 0 and key is not None:
        sigmas_raw = sigmas_raw + jax.random.normal(key, sigmas_raw.shape) * noise_std

    # texture-filtering semantic weight (rendering.py:172)
    semantic = cfg.scale_rgb * jax.nn.sigmoid(-10.0 * sigmas_raw)

    # floor the learned sharpness at 2x the actual sample spacing of this
    # bundle — below ~1 spacing the density transition falls between
    # samples, every ray renders empty and shape gradients die permanently
    beta_min = 2.0 * jnp.mean(rays["far"] - rays["near"]) / S
    sigmas = DN.sdf_to_sigma(sigmas_raw, params["nerf_beta"][0],
                             beta_min=beta_min)
    alphas, weights, alpha_prod = DN.compositing_weights(sigmas, deltas)

    if clip_bound is not None:
        oob = (jnp.abs(xyz) > clip_bound[None, None, :]).sum(-1) > 0
        weights = jnp.where(oob, 0.0, weights)
    if vis_pred is not None:
        weights = jnp.where(vis_pred < 0.5, 0.0, weights)

    visibility = jax.lax.stop_gradient(alpha_prod)
    sem_weights = weights[:, :-1] * semantic[:, :-1]
    if cfg.rgb_filter:
        rgb_final = (sem_weights[..., None] * rgbs[:, :-1, :]).sum(-2)
    else:
        rgb_final = (weights[..., None] * rgbs).sum(-2)
    feat_final = (weights[..., None] * feat).sum(-2)
    depth_final = (weights * z_vals).sum(-1)
    sil_final = weights[:, :-1].sum(-1)
    return rgb_final, feat_final, depth_final, weights, visibility, sil_final


def feat_match(model, params, feats, bound, grid_size, key, use_ot, is_training, embed_alpha=None):
    """Soft-argmax 3D location of 2D features in the canonical feature volume
    (loss_utils.py:273-405). feats [R,16] normalized.

    Returns (pts_pred [R,3], prob_vol [R,G^3]).
    """
    g = grid_size
    lin = [jnp.linspace(-bound[i], bound[i], g) for i in range(3)]
    grid = jnp.stack(jnp.meshgrid(lin[0], lin[1], lin[2], indexing="ij"), -1).reshape(-1, 3)

    if is_training and key is not None:
        grid = grid + jax.random.normal(key, grid.shape) * bound[None, :] * 0.05

    # grid is parameter-free (linspace + noise): need_dx=False skips the
    # input-grad matmul chain in the kernel backward
    vol_feat = model.apply_feat(params, grid, need_dx=False,
                                embed_raw=True, embed_alpha=embed_alpha)  # [G^3,16]
    vol_feat = vol_feat / jnp.maximum(jnp.linalg.norm(vol_feat, axis=-1, keepdims=True), 1e-9)

    cost = feats @ vol_feat.T  # [R, G^3] — MXU matmul
    if use_ot:
        # entropic OT with uniform marginals, 20 sinkhorn iterations
        # (loss_utils.py:344-381). The loop is HBM-bound on re-reading the
        # [R, G^3] kernel matrix 2x/iteration; under cfg.use_pallas
        # (training) K is cast to bf16 ONCE outside the loop so every
        # matvec reads half the bytes (measured 9.2 -> 6.7 ms fwd+bwd,
        # 4e-6 max diff on the transport plan). Casting inside the loop
        # instead was 50x slower in round 2 (conversion/layout churn).
        # The precise (eval) path stays fp32.
        K = jnp.exp(-(1.0 - cost) / 0.03)
        n, m = K.shape
        prob1 = 1.0 / n
        prob2 = 1.0 / m
        a = jnp.full((n, 1), 1.0 / n, jnp.float32)
        if model.cfg.use_pallas:
            Km = K.astype(jnp.bfloat16)
            KmT = Km.T

            def mv(M, v):
                return jax.lax.dot_general(
                    M, v.astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
        else:
            Km, KmT = K, K.T

            def mv(M, v):
                return M @ v

        # unrolled: 20 fixed iterations of two tiny matvecs each — as a
        # lax loop the per-iteration bookkeeping (carry copies, loop
        # condition) costs more device time than the matvecs themselves
        for _ in range(20):
            b = prob2 / (mv(KmT, a) + 1e-8)
            a = prob1 / (mv(Km, b) + 1e-8)
        b = prob2 / (mv(KmT, a) + 1e-8)
        T_m = a * K * b.T
        prob_vol = T_m / jnp.sum(T_m, axis=1, keepdims=True)
    else:
        beta = jnp.abs(params["nerf_beta_feat"][0]) + 1e-9
        prob_vol = jax.nn.softmax(cost * beta, axis=-1)

    pts_pred = prob_vol @ grid
    return pts_pred, prob_vol


def kp_reproj(model, params, rays, pts_pred, to_target: bool, embed_alpha=None,
              use_dskin: bool = False):
    """Forward-warp predicted canonical points into the (target) frame and
    project (loss_utils.py:224-270). pts_pred [R,3] -> [R,1,3] projected."""
    cfg = model.cfg
    xyz = pts_pred[:, None, :]
    if (cfg.lbs or cfg.neudbs) and "bone_rts" in rays:
        bone_rts = rays["bone_rts_target"] if to_target else rays["bone_rts"]
        rest_code = rays["rest_pose_code"]
        rest_code_b = jnp.broadcast_to(rest_code, (xyz.shape[0], rest_code.shape[-1]))
        # use_dis=False: the reference's kp_reproj forward-warps WITHOUT the
        # displacement field (loss_utils.py:253-259)
        xyz, _, _ = _forward_warp(model, params, rays, xyz, bone_rts, rest_code_b, embed_alpha,
                                  use_dskin=use_dskin, use_dis=False)
    rtk_vec = rays["rtk_vec_target"] if to_target else rays["rtk_vec"]
    return _project_with_rtk_vec(xyz, rtk_vec)


def inference_deform(model, params, mvars, rays, xyz_sampled, z_vals, key, cfg,
                     fine_iter=True, render_vis=False, use_dskin=False):
    """Deform + render + per-sample losses (rendering.py:239-579)."""
    result: Dict[str, jnp.ndarray] = {}
    R, S = xyz_sampled.shape[0], xyz_sampled.shape[1]
    alpha = rays.get("embed_alpha", None)
    xyz_coarse_frame = xyz_sampled
    keys = jax.random.split(key, 6) if key is not None else [None] * 6
    time_embedded = rays.get("time_embedded")

    has_flow_field = cfg.flowbw
    has_bones = (cfg.lbs or cfg.neudbs) and "bone_rts" in rays

    skin_bw = None
    xyz_coarse_target = xyz_sampled
    if has_flow_field:
        # free-form 3D flow deformation (rendering.py:258-287)
        code = jnp.broadcast_to(time_embedded[:, None, :], (R, S, time_embedded.shape[-1]))
        xyz_e = model.embed_xyz(xyz_sampled, alpha)
        flow_bw = model.nerf_flowbw.apply(
            {"params": params["nerf_flowbw"]}, jnp.concatenate([xyz_e, code], -1))
        xyz_canonical = xyz_sampled + flow_bw
        if fine_iter:
            xyz_ce = model.embed_xyz(xyz_canonical, alpha)
            flow_fw = model.nerf_flowfw.apply(
                {"params": params["nerf_flowfw"]}, jnp.concatenate([xyz_ce, code], -1))
            result["frame_cyc_dis_raw"] = Q.safe_norm(flow_bw + flow_fw)
            if "time_embedded_target" in rays:
                code_t = jnp.broadcast_to(
                    rays["time_embedded_target"][:, None, :], (R, S, time_embedded.shape[-1]))
                flow_fw_t = model.nerf_flowfw.apply(
                    {"params": params["nerf_flowfw"]}, jnp.concatenate([xyz_ce, code_t], -1))
                xyz_coarse_target = xyz_canonical + flow_fw_t
    elif has_bones:
        xyz_canonical, skin_bw, dis_bw = _backward_warp(
            model, params, rays, xyz_sampled, time_embedded, alpha, use_dskin=use_dskin)
        if cfg.nerf_dis and dis_bw is not None:
            result["dis_reg"] = Q.safe_norm(dis_bw)
        if fine_iter:
            rest_code = jnp.broadcast_to(
                rays["rest_pose_code"], (R, rays["rest_pose_code"].shape[-1]))
            xyz_cyc, skin_fw, dis_fw = _forward_warp(
                model, params, rays, xyz_canonical, rays["bone_rts"], rest_code, alpha, use_dskin=use_dskin)
            result["frame_cyc_dis_raw"] = Q.safe_norm(xyz_coarse_frame - xyz_cyc)
            if cfg.nerf_dis and dis_fw is not None:
                # forward-displacement regularizer (rendering.py:341-342;
                # weighted into the total loss at moda.py:662-664)
                result["dis_reg_forward"] = Q.safe_norm(dis_fw)
            if cfg.dist_corresp and "bone_rts_target" in rays:
                if cfg.neudbs:
                    # the target warp re-applies the rest-code displacement
                    # before the blend (rendering.py:344-351 passes nerf_dis;
                    # the reference recomputes xyz_dis at the same canonical
                    # points with the same rest code — identical to dis_fw)
                    xyz_coarse_target, _ = SK.neu_dbs(
                        rays["bones_rst"], rays["bone_rts_target"], skin_fw,
                        xyz_canonical, dis=dis_fw, backward=False)
                else:
                    xyz_coarse_target, _ = SK.lbs(
                        rays["bones_rst"], rays["bone_rts_target"], skin_fw,
                        xyz_canonical, backward=False)
    else:
        xyz_canonical = xyz_sampled

    # rigid-shape symmetrization (rendering.py:385-393)
    if cfg.symm_shape and keys[0] is not None:
        x = xyz_canonical[..., :1]
        symm_mask = jax.random.uniform(keys[0], x.shape) < 0.5
        x = jnp.where(symm_mask, -x, x)
        xyz_input = jnp.concatenate([x, xyz_canonical[..., 1:3]], -1)
    else:
        xyz_input = xyz_canonical

    clip_bound = None
    vis_pred = None
    if render_vis:
        clip_bound = mvars.obj_bound
        vis_pred = jax.nn.sigmoid(model.apply_vis(
            params, xyz_canonical,
            embed_raw=True, embed_alpha=alpha)[..., 0])

    rgb, feat_rnd, depth_rnd, weights, vis_coarse, sil = _inference(
        model, params, rays, xyz_input, rays["rays_d"], rays["dir_embedded"], z_vals,
        keys[1], cfg.noise_std, cfg, clip_bound=clip_bound, vis_pred=vis_pred)
    sil = weights[:, :-1].sum(-1)

    result["img_coarse"] = rgb
    result["depth_rnd"] = depth_rnd[..., None]
    result["sil_coarse"] = sil[..., None]
    if cfg.use_embed:
        # rendered CSE feature (unit-norm), for the eval grid's feat-err
        # channel (train_utils.py:1482-1514) and match vis
        result["feat_rnd"] = feat_rnd / jnp.maximum(
            Q.safe_norm(feat_rnd, keepdims=True), 1e-9)
    if render_vis:
        result["vis_pred"] = (vis_pred * weights).sum(-1)[..., None]

    if fine_iter:
        result["xyz_canonical_vis"] = xyz_canonical
        if cfg.use_corresp and not cfg.dist_corresp:
            pts_exp_t = compute_pts_exp(weights, xyz_canonical)
            pts_target = kp_reproj(model, params, rays, pts_exp_t, to_target=True,
                                   embed_alpha=alpha, use_dskin=use_dskin)

        if cfg.use_embed and "feats_at_samp" in rays:
            feats_at_samp = rays["feats_at_samp"]
            pts_exp = compute_pts_exp(weights, xyz_canonical)
            pts_pred, prob_vol = feat_match(
                model, params, feats_at_samp, mvars.obj_bound, cfg.feat_ndepth_grid,
                keys[2], cfg.use_ot, is_training=fine_iter, embed_alpha=alpha)
            feat_err = Q.safe_norm(pts_pred - pts_exp)
            result["pts_pred"] = pts_pred
            result["pts_exp"] = pts_exp
            result["feat_err"] = feat_err[..., None]
            if cfg.use_corr:
                # backward correspondence loss (loss_utils.py:387-391)
                TT = prob_vol @ prob_vol.T
                I = jnp.eye(prob_vol.shape[0], dtype=TT.dtype)
                result["corr_err"] = jnp.linalg.norm(TT - I, axis=-1)[..., None]
            if cfg.use_proj:
                xy_reproj = kp_reproj(model, params, rays, pts_pred, to_target=False,
                                      embed_alpha=alpha, use_dskin=use_dskin)
                proj_err = Q.safe_norm(rays["xys"][:, None, :] - xy_reproj[..., :2])
                result["proj_err"] = proj_err / cfg.img_size * 2.0

        # root-space correspondence in the paired frame (rendering.py:439-449)
        if cfg.dist_corresp and "rtk_vec_target" in rays:
            xyz_coarse_target = _project_with_rtk_vec(xyz_coarse_target, rays["rtk_vec_target"])

        if has_flow_field or has_bones:
            result["frame_cyc_dis"] = (
                result.pop("frame_cyc_dis_raw") * jax.lax.stop_gradient(weights)
            ).sum(-1)[..., None]

        # visibility loss (rendering.py:475-477; loss_utils.py:125-149)
        if cfg.nerf_vis and keys[3] is not None:
            result["vis_loss"] = visibility_loss(
                model, params, xyz_canonical, vis_coarse, mvars.obj_bound, keys[3], alpha
            )[..., None]

        # flow rendering (rendering.py:479-499)
        if "rtk_vec_target" in rays:
            if cfg.dist_corresp:
                flo, flo_valid = vrender_flo(weights, xyz_coarse_target, rays["xys"], cfg.img_size)
            else:
                flo = (pts_target[..., 0, :2] - rays["xys"]) / cfg.img_size * 2.0
                flo_valid = jnp.ones_like(flo[..., :1])
            result["flo_coarse"] = flo
            result["flo_valid"] = flo_valid

        # uncertainty prediction (rendering.py:501-516)
        if cfg.use_unc and "xysn" in rays:
            xyt = jnp.concatenate([rays["xysn"], rays["ts"]], -1)
            unc_pred = model.apply_unc(params, xyt, code_dir=rays["vid_code"],
                                       embed_raw=True, embed_alpha=alpha)
            result["unc_pred"] = unc_pred

        # per-sample losses (rendering.py:518-578)
        if "img_at_samp" in rays:
            img_at_samp = rays["img_at_samp"]
            sil_at_samp = rays["sil_at_samp"]
            vis_at_samp = rays["vis_at_samp"]
            flo_at_samp = rays["flo_at_samp"]
            cfd_at_samp = rays["cfd_at_samp"]

            img_loss_samp = jnp.mean((rgb - img_at_samp) ** 2, -1, keepdims=True)

            pos_count = (sil_at_samp * vis_at_samp).sum()
            neg_count = ((1 - sil_at_samp) * vis_at_samp).sum()
            vis_count = vis_at_samp.sum()
            balanced = (pos_count > 0) & (neg_count > 0)
            pos_wt = jnp.where(balanced, vis_count / jnp.maximum(pos_count, 1.0), 1.0)
            neg_wt = jnp.where(balanced, vis_count / jnp.maximum(neg_count, 1.0), 1.0)
            sil_balance_wt = 0.5 * pos_wt * sil_at_samp + 0.5 * neg_wt * (1 - sil_at_samp)
            sil_loss_samp = (sil[..., None] - sil_at_samp) ** 2 * sil_balance_wt * vis_at_samp

            flo_loss_samp = ((flo - flo_at_samp) ** 2).sum(-1, keepdims=True)
            sil_at_samp_flo = (sil_at_samp > 0) & (flo_valid == 1) & (cfd_at_samp != 0)
            cfd_norm = cfd_at_samp / jnp.maximum(
                (cfd_at_samp * sil_at_samp_flo).sum() / jnp.maximum(sil_at_samp_flo.sum(), 1.0),
                1e-9,
            )
            flo_loss_samp = flo_loss_samp * cfd_norm

            result["img_loss_samp"] = img_loss_samp * sil_at_samp
            result["sil_loss_samp"] = sil_loss_samp
            result["flo_loss_samp"] = flo_loss_samp * sil_at_samp
            result["sil_at_samp_flo"] = sil_at_samp_flo.astype(rgb.dtype)

            # stochastic structural similarity (rendering.py:528-532)
            if cfg.s3im_loss and keys[4] is not None:
                result["s3im_loss"] = s3im_loss(rgb, img_at_samp, sil_at_samp,
                                                keys[4])[None, None]

            if cfg.use_embed and "feats_at_samp" in rays:
                f = feat_rnd / jnp.maximum(Q.safe_norm(feat_rnd, keepdims=True), 1e-9)
                frnd = jnp.mean((f - rays["feats_at_samp"]) ** 2, -1)
                result["frnd_loss_samp"] = (frnd * sil_at_samp[..., 0])[..., None]

    return result, weights


def visibility_loss(model, params, xyz_pos, w_pos, bound, key, alpha=None):
    """Positive/negative visibility supervision (loss_utils.py:125-149).

    Returns a per-ray scalar [R] (mean handled by caller)."""
    xyz_pos = jax.lax.stop_gradient(xyz_pos)
    w_pos = jax.lax.stop_gradient(w_pos)
    R, S = w_pos.shape
    # per-ray normalization is by S only: the caller means over rays, which
    # reproduces the reference's sum/(R*S) chunk scalar (loss_utils.py:136,
    # 146). Dividing by R*S here double-counted R and trained the vis MLP
    # ~2000x too weakly — eval/extraction culling then removed real geometry.
    xyz_neg = jax.random.uniform(key, (R, S, 3), minval=-1.0, maxval=1.0) * bound[None, None, :]
    # need_dx=False: both inputs are stop-gradiented — only nerf_vis params
    # receive gradients, so the kernel skips the input-grad pass. The neg
    # and pos point sets go through ONE batched MLP call: two separate
    # W=64 kernel launches are sequencing-bound (the per-matmul issue tax
    # dominates at this width), so halving the launch count is ~free time.
    vis_both = model.apply_vis(
        params, jnp.concatenate([xyz_neg, xyz_pos], 0),
        need_dx=False, embed_raw=True, embed_alpha=alpha)[..., 0]
    vis_neg, vis_pos = vis_both[:R], vis_both[R:]
    vis_loss_neg = -jax.nn.log_sigmoid(-vis_neg).sum(-1) * 0.1 / S
    vis_loss_pos = -(jax.nn.log_sigmoid(vis_pos) * w_pos).sum(-1) / S
    return vis_loss_pos + vis_loss_neg


def render_rays(model: MoDAModel, params: Params, mvars: ModelVars, rays: RayDict,
                key: Optional[jax.Array], n_samples: int, use_fine: bool = False,
                fine_iter: bool = True, render_vis: bool = False,
                perturb: Optional[float] = None, use_dskin: bool = False) -> Dict[str, jnp.ndarray]:
    """Top-level: sample depths, (optionally) importance-resample, render.

    Equivalent of rendering.py:19-122. All rays in one shot; R static.
    """
    cfg = model.cfg
    perturb = cfg.perturb if perturb is None else perturb
    keys = jax.random.split(key, 4) if key is not None else [None] * 4

    rays = dict(rays)
    d = rays["rays_d"]
    d_norm = d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-9)
    rays["dir_embedded"] = model.embed_dir(d_norm, rays.get("embed_alpha"))

    if use_fine:
        n_coarse = n_samples // 2
    else:
        n_coarse = n_samples
    z_vals = SP.stratified_zvals(rays["near"], rays["far"], n_coarse, keys[0], perturb=perturb)
    xyz = rays["rays_o"][:, None, :] + rays["rays_d"][:, None, :] * z_vals[..., None]

    if use_fine:
        # no-grad coarse pass for importance sampling (rendering.py:91-114)
        _, w_coarse = inference_deform(
            model, params, mvars, rays,
            jax.lax.stop_gradient(xyz), jax.lax.stop_gradient(z_vals),
            keys[1], cfg, fine_iter=False, use_dskin=use_dskin)
        w_coarse = jax.lax.stop_gradient(w_coarse)
        z_mid = 0.5 * (z_vals[:, :-1] + z_vals[:, 1:])
        z_fine = SP.sample_pdf(z_mid, w_coarse[:, 1:-1], n_coarse, keys[2], det=(perturb == 0))
        z_vals = jnp.sort(jnp.concatenate([z_vals, z_fine], -1), -1)
        xyz = rays["rays_o"][:, None, :] + rays["rays_d"][:, None, :] * z_vals[..., None]

    result, _ = inference_deform(
        model, params, mvars, rays, xyz, z_vals, keys[3], cfg,
        fine_iter=fine_iter, render_vis=render_vis, use_dskin=use_dskin)
    return result
