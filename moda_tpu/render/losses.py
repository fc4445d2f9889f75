"""Loss assembly: per-ray render outputs -> scalar training loss.

Functional re-design of moda.forward_default's loss section
(moda.py:517-768) plus eikonal (loss_utils.py:15-104), root smoothness
(loss_utils.py:486-517) and the Sinkhorn bone-location regularizer
(moda.py:681-698). Host-dependent pieces (outlier loss filter medians,
mesh sampling for the bone regularizer) enter as precomputed arrays in
``extras`` so the whole function jits:

  extras = {
    "loss_select":  scalar (0: flow-only warmup, 1: all losses),
    "invalid_mask": [R, 1] multiplier (1 keep, 0 reject) from loss_flt,
    "shape_samp":   [1000, 3] canonical surface samples (or zeros),
    "shape_samp_valid": scalar {0,1},
    "progress":     scalar in [0,1],
  }
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from moda_tpu.core import quat as Q
from moda_tpu.fields.model import MoDAModel, ModelVars, Params
from moda_tpu.ops.sinkhorn import sinkhorn_divergence


def masked_mean(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    m = mask.astype(x.dtype)
    return (x * m).sum() / jnp.maximum(m.sum(), 1.0)


def eikonal_loss(model, params, pts: jnp.ndarray, bound: jnp.ndarray,
                 key: jax.Array, ppr: bool, n_sample: int = 1000,
                 embed_alpha=None) -> jnp.ndarray:
    """|grad sdf| == 1 regularizer on canonical points (loss_utils.py:73-104).

    pts: [..., 3] backward-warped canonical samples."""
    pts = jax.lax.stop_gradient(pts.reshape(-1, 3))
    idx = jax.random.randint(key, (n_sample,), 0, pts.shape[0])
    pts = pts[idx]
    inb = ((bound[None, :] - jnp.abs(pts)) > 0).all(-1).astype(pts.dtype)

    def sdf_fn(p):
        e = model.embed_xyz(p, embed_alpha)
        return model.apply_coarse(params, e, sigma_only=True)[..., 0]

    if ppr:
        # numerical 4-tap gradient (Neuralangelo, loss_utils.py:46-71)
        eps = 1e-3
        k1 = jnp.asarray([1.0, -1.0, -1.0])
        k2 = jnp.asarray([-1.0, -1.0, 1.0])
        k3 = jnp.asarray([-1.0, 1.0, -1.0])
        k4 = jnp.asarray([1.0, 1.0, 1.0])
        g = (
            k1[None] * sdf_fn(pts + k1 * eps)[:, None]
            + k2[None] * sdf_fn(pts + k2 * eps)[:, None]
            + k3[None] * sdf_fn(pts + k3 * eps)[:, None]
            + k4[None] * sdf_fn(pts + k4 * eps)[:, None]
        ) / (4.0 * eps)
    else:
        g = jax.vmap(jax.grad(lambda p: sdf_fn(p[None])[0]))(pts)

    grad_norm = Q.safe_norm(g)
    return masked_mean((grad_norm - 1.0) ** 2, inb)


def compute_root_sm_2nd_loss(rtk_all: jnp.ndarray, data_offset) -> jnp.ndarray:
    """2nd-order camera smoothness (loss_utils.py:486-517).

    rtk_all [num_fr, 3+, 4]; data_offset: static tuple of ints."""
    rot_terms = []
    trn_terms = []
    for i in range(len(data_offset) - 1):
        s, e = int(data_offset[i]), int(data_offset[i + 1])
        if e - s < 3:
            continue
        stt, mid, end = rtk_all[s:e - 2], rtk_all[s + 1:e - 1], rtk_all[s + 2:e]
        rot1 = stt[:, :3, :3] @ jnp.swapaxes(mid[:, :3, :3], -1, -2)
        rot2 = mid[:, :3, :3] @ jnp.swapaxes(end[:, :3, :3], -1, -2)
        rot_sm = rot1 @ jnp.swapaxes(rot2, -1, -2)
        trn_sm = (stt[:, :3, 3] - mid[:, :3, 3]) - (mid[:, :3, 3] - end[:, :3, 3])
        rot_terms.append(Q.rot_angle(rot_sm))
        trn_terms.append(Q.safe_norm(trn_sm))
    if not rot_terms:
        return jnp.asarray(0.0)
    rot_loss = jnp.concatenate(rot_terms).mean() * 1e-1
    trn_loss = jnp.concatenate(trn_terms).mean()
    return (rot_loss + trn_loss) * 0.1


def compute_root_sm_loss(rtk_all: jnp.ndarray, data_offset) -> jnp.ndarray:
    """1st-order camera smoothness (loss_utils.py:520-537)."""
    rot_terms, trn_terms = [], []
    for i in range(len(data_offset) - 1):
        s, e = int(data_offset[i]), int(data_offset[i + 1])
        if e - s < 2:
            continue
        a, b = rtk_all[s:e - 1], rtk_all[s + 1:e]
        rot_terms.append(Q.rot_angle(a[:, :3, :3] @ jnp.swapaxes(b[:, :3, :3], -1, -2)))
        trn_terms.append(Q.safe_norm(a[:, :3, 3] - b[:, :3, 3]))
    if not rot_terms:
        return jnp.asarray(0.0)
    return jnp.concatenate(rot_terms).mean() * 1e-3 + jnp.concatenate(trn_terms).mean() * 0.1


def elastic_loss(model, params, xyz: jnp.ndarray, time_embedded: jnp.ndarray,
                 embed_alpha=None) -> jnp.ndarray:
    """Jacobian log-singular-value penalty for the SE3/translation flow
    field (loss_utils.py:106-116). xyz [N,3] detached sample points."""
    xyz = jax.lax.stop_gradient(xyz.reshape(-1, 3))
    code = jax.lax.stop_gradient(time_embedded.reshape(-1, time_embedded.shape[-1]))

    def flow_fn(p, c):
        e = model.embed_xyz(p[None], embed_alpha)
        x = jnp.concatenate([e, c[None]], -1)
        return model.nerf_flowbw.apply({"params": params["nerf_flowbw"]}, x)[0]

    J = jax.vmap(jax.jacfwd(flow_fn))(xyz, code)  # [N,3,3]
    jac = J + jnp.eye(3)[None]
    sign, logdet = jnp.linalg.slogdet(jac)
    logdet = jnp.where(sign <= 0, 0.0, logdet)
    return (logdet ** 2).mean()


def rtk_loss(rtk: jnp.ndarray, rtk_gt: jnp.ndarray) -> Tuple[jnp.ndarray, Dict]:
    """Camera supervision for pose warmup (loss_utils.py:151-163)."""
    rot_loss = Q.rot_angle(rtk[:, :3, :3] @ jnp.swapaxes(rtk_gt[:, :3, :3], -1, -2)).mean()
    rot_loss = 0.01 * rot_loss
    trn_loss = ((rtk[:, :3, 3] - rtk_gt[:, :3, 3]) ** 2).sum(-1).mean()
    return rot_loss + trn_loss, {"rot_loss": rot_loss, "trn_loss": trn_loss}


def shape_init_loss(model, params, pts_samp: jnp.ndarray, obj_bound: jnp.ndarray,
                    use_ellips: bool, embed_alpha=None) -> jnp.ndarray:
    """Fit the SDF to an ellipsoid/sphere prior (loss_utils.py:540-572).

    pts_samp: [N,3] random query points in the loose bound; obj_bound [3]
    is the tight mesh bound (abs-max of prior mesh vertices)."""
    if use_ellips:
        dis = jnp.sqrt(jnp.sum((pts_samp / obj_bound[None]) ** 2, -1)) - 1.0
        dis = dis * obj_bound.mean()
    else:
        dis = jnp.sqrt(jnp.sum(pts_samp ** 2, -1)) - obj_bound.min()
    y = model.apply_coarse(params, model.embed_xyz(pts_samp, embed_alpha), sigma_only=True)
    sdf = -y[..., 0]
    return ((sdf - dis) ** 2).mean()


def total_loss(
    model: MoDAModel,
    params: Params,
    mvars: ModelVars,
    rendered: Dict[str, jnp.ndarray],
    rays: Dict[str, jnp.ndarray],
    rtk_all: jnp.ndarray,
    extras: Dict[str, jnp.ndarray],
    key: jax.Array,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """forward_default's loss assembly (moda.py:517-768), fully jitted."""
    cfg = model.cfg
    aux: Dict[str, jnp.ndarray] = {}

    sil_at_samp = rays["sil_at_samp"]
    vis_at_samp = rays["vis_at_samp"]
    sil_at_samp_flo = rendered["sil_at_samp_flo"]
    invalid_mask = extras.get("invalid_mask")
    keep = 1.0 if invalid_mask is None else invalid_mask

    # image / silhouette
    img_loss_samp = cfg.img_wt * rendered["img_loss_samp"] * keep
    img_loss = img_loss_samp
    if cfg.rm_novp:
        img_loss = img_loss * jax.lax.stop_gradient(rendered["sil_coarse"])
    img_loss = masked_mean(img_loss, sil_at_samp > 0)
    sil_loss_samp = cfg.sil_wt * rendered["sil_loss_samp"] * keep
    sil_loss = masked_mean(sil_loss_samp, vis_at_samp > 0)
    aux["sil_loss"] = sil_loss
    aux["img_loss"] = img_loss
    total = img_loss + sil_loss

    # S3IM structural loss (moda.py:560-563)
    if cfg.s3im_loss and "s3im_loss" in rendered:
        s3im = cfg.s3im_wt * rendered["s3im_loss"].mean()
        total = total + s3im
        aux["s3im_loss"] = s3im

    # feature rendering loss
    if cfg.use_embed:
        frnd = cfg.frnd_wt * rendered["frnd_loss_samp"] * keep
        if cfg.rm_novp:
            frnd = frnd * jax.lax.stop_gradient(rendered["sil_coarse"])
        feat_rnd_loss = masked_mean(frnd, sil_at_samp > 0)
        aux["feat_rnd_loss"] = feat_rnd_loss
        total = total + feat_rnd_loss

    # flow loss (with warmup alternation via loss_select)
    if cfg.use_corresp:
        flo = rendered["flo_loss_samp"] * keep
        if cfg.rm_novp:
            flo = flo * jax.lax.stop_gradient(rendered["sil_coarse"])
        flo_loss = masked_mean(flo, sil_at_samp_flo > 0) * 2.0 * cfg.flow_wt
        total = jnp.where(extras["loss_select"] == 0, flo_loss, total + flo_loss)
        aux["flo_loss"] = flo_loss

    # feature matching / correspondence / projection
    feat_err_samp = None
    proj_err_samp = None
    if cfg.use_embed:
        feat_err_samp = cfg.feat_wt * rendered["feat_err"] * keep
        feat_loss = feat_err_samp
        if cfg.rm_novp:
            feat_loss = feat_loss * jax.lax.stop_gradient(rendered["sil_coarse"])
        feat_loss = masked_mean(feat_loss, sil_at_samp > 0)
        total = total + feat_loss
        aux["feat_loss"] = feat_loss
        aux["beta_feat"] = jax.lax.stop_gradient(params["nerf_beta_feat"][0])
        if cfg.use_corr:
            corr = cfg.corr_wt * rendered["corr_err"] * keep
            if cfg.rm_novp:
                corr = corr * jax.lax.stop_gradient(rendered["sil_coarse"])
            corr_loss = masked_mean(corr, sil_at_samp > 0)
            total = total + corr_loss
            aux["corr_loss"] = corr_loss
    if cfg.use_proj and "proj_err" in rendered:
        proj_err_samp = cfg.proj_wt * rendered["proj_err"] * keep
        proj_loss = masked_mean(proj_err_samp, sil_at_samp > 0)
        aux["proj_loss"] = proj_loss
        if cfg.freeze_proj:
            # pose-correction stage: ramp from 10x proj-only to full loss
            # (moda.py:630-639)
            progress = extras["progress"]
            warmup_weight = (progress - cfg.proj_start) / max(cfg.proj_end - cfg.proj_start, 1e-9)
            warmup_weight = jnp.clip((warmup_weight - 0.8) * 5.0, 0.0, 1.0)
            in_window = (progress > cfg.proj_start) & (progress < cfg.proj_end)
            total = total + proj_loss
            total = jnp.where(
                in_window,
                total * warmup_weight + 10.0 * proj_loss * (1.0 - warmup_weight),
                total,
            )
        else:
            total = total + proj_loss

    # cycle consistency
    if "frame_cyc_dis" in rendered:
        cyc_loss = rendered["frame_cyc_dis"].mean()
        total = total + cyc_loss * cfg.cyc_wt
        aux["cyc_loss"] = cyc_loss

    # displacement-field regularization
    if "dis_reg" in rendered:
        total = total + rendered["dis_reg"].mean()
    if "dis_reg_forward" in rendered:
        # forward-displacement regularizer (moda.py:662-664)
        total = total + rendered["dis_reg_forward"].mean()

    # root pose smoothness
    if cfg.root_sm:
        root_sm_loss = compute_root_sm_2nd_loss(rtk_all, model.offset)
        aux["root_sm_loss"] = root_sm_loss
        total = total + root_sm_loss

    # eikonal
    if cfg.eikonal_wt > 0 and "xyz_canonical_vis" in rendered:
        ekl = cfg.eikonal_wt * eikonal_loss(
            model, params, rendered["xyz_canonical_vis"], mvars.obj_bound,
            key, cfg.ppr_eikonal, embed_alpha=rays.get("embed_alpha"))
        aux["ekl_loss"] = ekl
        total = total + ekl

    # bone location regularization (sinkhorn to surface samples)
    if (cfg.lbs or cfg.neudbs) and cfg.bone_loc_reg > 0 and "shape_samp" in extras \
            and "bones_rst" in rays:
        bones_rst = rays["bones_rst"]
        bone_loc_loss = sinkhorn_divergence(
            bones_rst[:, :3] * 10.0, extras["shape_samp"] * 10.0)
        bone_loc_loss = cfg.bone_loc_reg * bone_loc_loss * extras["shape_samp_valid"]
        total = total + bone_loc_loss
        aux["bone_loc_loss"] = bone_loc_loss

    # visibility
    if "vis_loss" in rendered:
        vis_loss = 0.01 * rendered["vis_loss"].mean()
        total = total + vis_loss
        aux["visibility_loss"] = vis_loss

    # uncertainty head supervision
    if cfg.use_unc and "unc_pred" in rendered:
        unc_pred = rendered["unc_pred"]
        unc_rgb = sil_at_samp[..., 0] * img_loss_samp.mean(-1)
        unc_loss = ((jax.lax.stop_gradient(unc_rgb) - unc_pred[..., 0]) ** 2).mean()
        aux["unc_loss"] = unc_loss
        total = total + unc_loss

    # freeze_coarse distillation: pin trunk input-layer kernels to their
    # loaded values (moda.py:733-755, compute_xyz_wt_loss)
    if cfg.freeze_coarse and "xyz_wt_snapshot" in extras:
        snap = extras["xyz_wt_snapshot"]
        for comp, label in (("nerf_coarse", "shape"), ("nerf_skin", "skin"),
                            ("nerf_feat", "feat")):
            if comp not in snap or comp not in params:
                continue
            terms = []
            for layer, kern0 in snap[comp].items():
                kern = params[comp][layer]["kernel"]
                terms.append(((jax.lax.stop_gradient(kern0) - kern) ** 2).mean())
            wt_loss = 100.0 * jnp.stack(terms).mean()
            aux[f"{label}_xyz_wt_loss"] = wt_loss
            total = total + wt_loss

    if cfg.lbs or cfg.neudbs:
        aux["skin_scale"] = jax.lax.stop_gradient(params["skin_aux"][0])
        aux["skin_const"] = jax.lax.stop_gradient(params["skin_aux"][1])

    total = total * cfg.total_wt
    aux["total_loss"] = total
    aux["beta"] = jax.lax.stop_gradient(params["nerf_beta"][0])
    return total, aux
