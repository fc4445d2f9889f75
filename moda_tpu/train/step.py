"""The jitted training step: forward render -> losses -> grads -> update.

One XLA program per (static-config) phase; equivalent to the reference's
train_one_epoch inner loop (train_utils.py:923-992) with clip_grad
(1154-1311), the silhouette outlier filter (moda.py:522-538 +
loss_utils.py:432-476, re-expressed as an in-graph segment reduction), and
root-pose composition (moda.py:1419-1495).

Static switches that change the traced program (use_fine, use_dskin,
use_bones, config flags) recompile at stage boundaries only — a handful of
compilations per training run.
"""
from __future__ import annotations

from functools import partial
from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from moda_tpu.fields.model import MoDAModel, ModelVars, create_base_se3
from moda_tpu.render import losses as L
from moda_tpu.render import rays as RB
from moda_tpu.render.pipeline import render_rays
from moda_tpu.train.optim import (MoDAOptimizer, OptState, apply_freeze_masks,
                                  clip_by_group, reject_nonfinite)


def batch_rtk(model: MoDAModel, params, rtk_all3: jnp.ndarray, batch) -> jnp.ndarray:
    """Compose per-batch rtk [2B,4,4] from all-frame root poses + intrinsics
    (convert_root_pose, moda.py:1419-1447)."""
    rt = rtk_all3[batch["frameid"]]
    ks = params["ks_param"][batch["dataid"]]
    rtk = jnp.zeros((rt.shape[0], 4, 4), rt.dtype)
    rtk = rtk.at[:, :3, :4].set(rt)
    rtk = rtk.at[:, 3, :].set(ks)
    return rtk


def sil_loss_filter(sil_loss_samp, frameid, num_fr, sil_err_median, progress, warmup_steps,
                    scale_factor=10.0):
    """Frame-level outlier rejection (loss_utils.py:432-476) in-graph.

    Per-frame mean sil error this step vs. host-provided running median.
    Returns (keep_mask [R,1], frame_err [num_fr], frame_cnt [num_fr])."""
    err = sil_loss_samp[..., 0]
    sums = jax.ops.segment_sum(err, frameid, num_segments=num_fr)
    cnts = jax.ops.segment_sum((err > 0).astype(err.dtype), frameid, num_segments=num_fr)
    frame_err = sums / jnp.maximum(cnts, 1e-9)
    bad_frame = frame_err > sil_err_median * scale_factor
    ray_bad = bad_frame[frameid]
    active = progress > warmup_steps
    keep = jnp.where(active & ray_bad, 0.0, 1.0)[..., None]
    return keep, frame_err, cnts


def masked_median(x, mask):
    """np.median over the masked subset, in-graph (sort + mid gather).
    Empty subset -> +inf (nothing can exceed scale_factor * median)."""
    n = mask.sum()
    s = jnp.sort(jnp.where(mask, x, jnp.inf))
    lo = s[jnp.maximum((n - 1) // 2, 0)]
    hi = s[jnp.maximum(n // 2, 0)]
    return jnp.where(n > 0, 0.5 * (lo + hi), jnp.inf)


def sil_loss_filter_line(sil_loss_samp, errid, frameid, num_fr, img_size,
                         progress, warmup_steps, scale_factor=10.0):
    """Line-level outlier rejection for lineload training
    (loss_utils.py:432-445 + moda.py:522-529) fully in-graph.

    The reference scatters this step's per-sample sil errors into a
    [num_fr*img_size] per-line buffer (one representative value per sampled
    line), means the nonzero lines per frame, medians the nonzero frames
    *of this step* (the buffer is zeroed each call), and rejects frames
    above 10x that median. Here the per-line representative is the segment
    mean of the line's samples (deterministic; the reference's last-write
    scatter order is arbitrary) and the masked median is exact np.median
    semantics. Returns (keep [R,1], frame_err [num_fr], frame_cnt [num_fr])."""
    err = sil_loss_samp[..., 0]
    nlines = num_fr * img_size
    line_sum = jax.ops.segment_sum(err, errid, num_segments=nlines)
    line_cnt = jax.ops.segment_sum((err > 0).astype(err.dtype), errid,
                                   num_segments=nlines)
    line_err = (line_sum / jnp.maximum(line_cnt, 1e-9)).reshape(num_fr, img_size)
    fr_cnt = (line_err > 0).sum(-1).astype(err.dtype)
    frame_err = line_err.sum(-1) / (1e-9 + fr_cnt)
    med = masked_median(frame_err, frame_err > 0)
    bad_frame = frame_err > med * scale_factor
    ray_bad = bad_frame[frameid]
    active = progress > warmup_steps
    keep = jnp.where(active & ray_bad, 0.0, 1.0)[..., None]
    return keep, frame_err, fr_cnt


class StepExtras(NamedTuple):
    """Per-step dynamic scalars/arrays prepared by the trainer (host)."""

    progress: jnp.ndarray          # scalar [0,1]
    loss_select: jnp.ndarray       # 0/1
    root_update: jnp.ndarray       # 1=update
    body_update: jnp.ndarray
    shape_update: jnp.ndarray      # 1=freeze
    cvf_update: jnp.ndarray
    sil_err_median: jnp.ndarray    # running median of frame sil errs
    shape_samp: jnp.ndarray        # [S,3] canonical surface samples
    shape_samp_valid: jnp.ndarray  # {0,1}
    embed_alpha: jnp.ndarray       # scalar frequency window
    base_rt: jnp.ndarray = None    # [num_fr,3,4] prior cameras (use_cam) or None


# StepExtras fields that vary per step inside a dispatch chunk; the rest
# (shape_samp, base_rt, ...) are step-invariant within an epoch and would
# waste host->device bytes if stacked chunk_steps times
CHUNK_STEP_FIELDS = ("progress", "loss_select", "root_update", "body_update",
                     "shape_update", "cvf_update", "sil_err_median",
                     "embed_alpha")


def make_train_step(model: MoDAModel, optimizer: MoDAOptimizer, *,
                    nsample: int, ndepth: int, use_fine: bool, use_dskin: bool,
                    use_bones: bool, nsample_active: int = 0, donate: bool = True,
                    xyz_wt_snapshot=None, accu_steps: int = 1,
                    chunk_steps: int = 1):
    """accu_steps > 1 scans over microbatch slices of the [2B] axis,
    averaging grads before one optimizer update (the reference's
    accumulation at train_utils.py:951-969 done in-graph).

    chunk_steps > 1 returns a CHUNKED step that lax.scans chunk_steps full
    optimizer steps in one XLA dispatch over stacked batches — on the
    remote-TPU (axon) transport each dispatch and each output fetch costs
    a round trip, which at chunk_steps=1 dominates the wall-clock step
    (VERDICT r2 #4). Signature of the chunked step:
        (params, opt_state, mvars, batches, extras0, per_step, keys)
    where batches/keys have a leading [chunk_steps] axis, per_step is a
    dict of CHUNK_STEP_FIELDS each stacked [chunk_steps], and extras0
    carries the step-invariant StepExtras fields."""
    cfg = model.cfg

    def loss_fn(params, mvars: ModelVars, batch, extras: StepExtras, key):
        k_rays, k_render, k_loss = jax.random.split(key, 3)
        base_rt = extras.base_rt if cfg.use_cam else None
        rtk_all3 = model.compute_rts(params, base_rt=base_rt)
        rtk = batch_rtk(model, params, rtk_all3, batch)

        # in-training CSE fine-tune (ft_cse, moda.py:1388-1398 + 723-731):
        # run the trainable CSE on the batch crops, distill against the
        # precomputed features, and feed the live features to the renderer.
        # Batch mode only — EXACTLY as the reference: its lineload input
        # path (convert_line_input, moda.py:1330-1363) never calls csenet,
        # only convert_batch_input does (moda.py:1388), and no recipe in
        # scripts/template.sh passes --ft_cse. Lineload rows carry no
        # crops for the CNN to consume in either codebase.
        csenet_loss = None
        if cfg.ft_cse and cfg.use_embed and not cfg.lineload:
            S = cfg.img_size
            imgs2d = batch["imgs"].reshape(-1, 3, S, S).transpose(0, 2, 3, 1)
            live = model.apply_csenet(params, imgs2d)       # [2B,S/2,S/2,16]
            live = jax.image.resize(
                live, (live.shape[0], S, S, live.shape[-1]), "linear")
            live_flat = live.transpose(0, 3, 1, 2).reshape(live.shape[0], 16, -1)
            pre = batch["dp_feats"]
            valid_px = (jnp.abs(pre).sum(1, keepdims=True) > 0).astype(live_flat.dtype)
            csenet_loss = 1e-5 * (
                ((live_flat - pre) ** 2).sum(1, keepdims=True) * valid_px
            ).sum() / jnp.maximum(valid_px.sum(), 1.0)
            # grads flow from the main losses into the CSE net only after
            # ftcse_steps (moda.py:1395-1398)
            live_used = jnp.where(extras.progress > cfg.ftcse_steps, live_flat,
                                  jax.lax.stop_gradient(live_flat))
            batch = dict(batch)
            batch["dp_feats"] = live_used
        rays = RB.build_rays(model, params, mvars, batch, rtk, k_rays, nsample,
                             nsample_active=nsample_active,
                             embed_alpha=extras.embed_alpha)
        if not use_bones:
            # warmup epochs train without the deformation model
            # (train_utils.py:637-641)
            for k in ("bone_rts", "bone_rts_target", "bones_rst", "rest_pose_code"):
                rays.pop(k, None)
        rendered = render_rays(model, params, mvars, rays, k_render, ndepth,
                               use_fine=use_fine, use_dskin=use_dskin)

        keep = jnp.ones_like(rendered["sil_loss_samp"])
        frame_err = jnp.zeros((model.num_fr,))
        frame_cnt = jnp.zeros((model.num_fr,))
        if cfg.loss_flt:
            if cfg.lineload and "errid" in rays:
                keep, frame_err, frame_cnt = sil_loss_filter_line(
                    rendered["sil_loss_samp"] * cfg.sil_wt, rays["errid"],
                    rays["frameid"], model.num_fr, cfg.img_size,
                    extras.progress, cfg.warmup_steps)
            else:
                keep, frame_err, frame_cnt = sil_loss_filter(
                    rendered["sil_loss_samp"] * cfg.sil_wt, rays["frameid"],
                    model.num_fr, extras.sil_err_median, extras.progress,
                    cfg.warmup_steps)

        loss_extras = {
            "loss_select": extras.loss_select,
            "invalid_mask": keep,
            "shape_samp": extras.shape_samp,
            "shape_samp_valid": extras.shape_samp_valid,
            "progress": extras.progress,
        }
        if cfg.freeze_coarse and xyz_wt_snapshot is not None:
            loss_extras["xyz_wt_snapshot"] = xyz_wt_snapshot
        rtk_all = jnp.zeros((model.num_fr, 4, 4)).at[:, :3].set(rtk_all3)
        total, aux = L.total_loss(model, params, mvars, rendered, rays, rtk_all,
                                  loss_extras, k_loss)
        if csenet_loss is not None and cfg.mt_cse:
            # distill-only before mtcse_steps, additive after (moda.py:727-731)
            total = jnp.where(extras.progress < cfg.mtcse_steps,
                              csenet_loss, total + csenet_loss)
            aux["csenet_loss"] = csenet_loss
        host_out = {
            "rtk": rtk,
            "frame_err": frame_err,
            "frame_cnt": frame_cnt,
        }
        return total, (aux, host_out)

    def step_core(params, opt_state: OptState, mvars: ModelVars, batch,
                  extras: StepExtras, key):
        if accu_steps <= 1:
            (total, (aux, host_out)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, mvars, batch, extras, key)
        else:
            bs2 = batch["frameid"].shape[0]
            B = bs2 // 2
            mb = B // accu_steps

            def micro(carry, inp):
                grads_acc, _ = carry
                sl, k = inp

                def slice_batch(x):
                    first = jax.lax.dynamic_slice_in_dim(x, sl, mb, 0)
                    second = jax.lax.dynamic_slice_in_dim(x, B + sl, mb, 0)
                    return jnp.concatenate([first, second], 0)

                b = {kk: slice_batch(v) for kk, v in batch.items()}
                (tot, (aux_i, host_i)), g = jax.value_and_grad(
                    loss_fn, has_aux=True)(params, mvars, b, extras, k)
                grads_acc = jax.tree_util.tree_map(lambda a, x: a + x / accu_steps,
                                                   grads_acc, g)
                return (grads_acc, tot), (aux_i, host_i)

            zero = jax.tree_util.tree_map(jnp.zeros_like, params)
            keys = jax.random.split(key, accu_steps)
            slices = jnp.arange(accu_steps) * mb
            (grads, total), (auxs, hosts) = jax.lax.scan(
                micro, (zero, jnp.asarray(0.0)), (slices, keys))
            aux = jax.tree_util.tree_map(lambda x: x.mean(0), auxs)
            rtk_full = batch_rtk(model, params, model.compute_rts(
                params, base_rt=extras.base_rt if cfg.use_cam else None), batch)
            host_out = {
                "rtk": rtk_full,
                "frame_err": hosts["frame_err"].max(0),
                "frame_cnt": hosts["frame_cnt"].sum(0),
            }

        grads, finite = reject_nonfinite(grads)
        indicators = {
            "root_update": extras.root_update,
            "body_update": extras.body_update,
            "shape_update": extras.shape_update,
            "cvf_update": extras.cvf_update,
        }
        grads = apply_freeze_masks(grads, indicators, cfg)
        grads, norms = clip_by_group(grads, cfg.clip_scale)

        # in-graph root-step rejection (root_stab_reject): when the root
        # grad norm exceeds clip_scale after the 200-step grace period,
        # drop this step's root update. The reference's response to the
        # same signal is reloading params_latest.pth — reverting the WHOLE
        # epoch's progress across all groups (train_utils.py:971-974);
        # rejecting just the hot root step preserves the intent (exploding
        # root grads must not move the pose) without discarding shape/skin
        # progress, and it is what makes registration reproducible across
        # seeds (round-4 drift forensics: rollback cooldown let hot root
        # steps through).
        root_rejected = jnp.asarray(0.0)
        if cfg.root_stab_reject:
            root_hot = (norms.get("nerf_root_rts_g", jnp.asarray(0.0))
                        > cfg.clip_scale) & (opt_state.count >= 200)
            keep_root = 1.0 - root_hot.astype(jnp.float32)
            for k in ("nerf_root_rts", "root_code"):
                if k in grads:
                    grads[k] = jax.tree_util.tree_map(
                        lambda x: x * keep_root, grads[k])
            root_rejected = root_hot.astype(jnp.float32)

        new_params, new_opt_state = optimizer.update(grads, opt_state, params)
        # reject the whole update on non-finite grads (reference zeroes grads;
        # we keep old params to also protect adam moments)
        f = finite
        new_params = jax.tree_util.tree_map(
            lambda n, o: jnp.where(f, n, o), new_params, params)
        aux.update(norms)
        aux["grad_finite"] = finite.astype(jnp.float32)
        aux["root_step_rejected"] = root_rejected
        aux["lr"] = optimizer.sched(opt_state.count)
        # the dead-density tripwire must ignore intentional freezes
        aux["shape_frozen"] = jnp.asarray(extras.shape_update, jnp.float32)
        return new_params, new_opt_state, aux, host_out

    if chunk_steps <= 1:
        return jax.jit(step_core, donate_argnums=(0, 1) if donate else ())

    @partial(jax.jit, donate_argnums=(0, 1) if donate else ())
    def chunked_step(params, opt_state: OptState, mvars: ModelVars, batches,
                     extras0: StepExtras, per_step, keys):
        def body(carry, xs):
            p, o = carry
            b, ps, k = xs
            ex = extras0._replace(**ps)
            p, o, aux, host = step_core(p, o, mvars, b, ex, k)
            return (p, o), (aux, host)

        (p, o), (auxs, hosts) = jax.lax.scan(
            body, (params, opt_state), (batches, per_step, keys))
        return p, o, auxs, hosts

    return chunked_step
