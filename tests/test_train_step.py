import pytest
import numpy as np
import jax
import jax.numpy as jnp

from moda_tpu.config import DataInfo, MoDAConfig
from moda_tpu.fields.model import MoDAModel
from moda_tpu.train.optim import (MoDAOptimizer, clip_by_group, onecycle_lr,
                                  reject_nonfinite, apply_freeze_masks)
from moda_tpu.train.schedule import compute_indicators
from moda_tpu.train.step import StepExtras, make_train_step

from tests.test_render_pipeline import tiny_batch, tiny_setup


def test_onecycle_schedule():
    sched = onecycle_lr(1.0, 1000, 10)
    lr0 = float(sched(0))
    np.testing.assert_allclose(lr0, 1.0 / 25.0, rtol=1e-5)
    warmup = 200  # pct_start = 2/10
    np.testing.assert_allclose(float(sched(warmup)), 1.0, rtol=1e-3)
    np.testing.assert_allclose(float(sched(1000)), 0.2, rtol=1e-3)


def test_clip_by_group():
    grads = {"nerf_coarse": {"w": jnp.full((10,), 100.0)}, "bones": jnp.full((3,), 0.1)}
    clipped, norms = clip_by_group(grads, clip_scale=1.0)
    # nerf_coarse max norm = 1.0 -> clipped to unit norm
    n = float(jnp.linalg.norm(clipped["nerf_coarse"]["w"]))
    np.testing.assert_allclose(n, 1.0, rtol=1e-4)
    assert float(norms["nerf_coarse_g"]) > 100.0
    # bones norm 0.17 < max norm 1.0 -> untouched
    np.testing.assert_allclose(np.asarray(clipped["bones"]), 0.1, rtol=1e-6)


def test_reject_nonfinite():
    grads = {"a": jnp.asarray([1.0, jnp.nan])}
    out, finite = reject_nonfinite(grads)
    assert not bool(finite)
    np.testing.assert_array_equal(np.asarray(out["a"]), [0.0, 0.0])


def test_freeze_masks():
    cfg = MoDAConfig()
    grads = {"nerf_root_rts": jnp.ones((2,)), "nerf_coarse": jnp.ones((2,)),
             "nerf_feat": jnp.ones((2,))}
    ind = {"root_update": jnp.asarray(0.0), "body_update": jnp.asarray(1.0),
           "shape_update": jnp.asarray(1.0), "cvf_update": jnp.asarray(0.0)}
    out = apply_freeze_masks(grads, ind, cfg)
    assert float(jnp.abs(out["nerf_root_rts"]).sum()) == 0.0
    assert float(jnp.abs(out["nerf_coarse"]).sum()) == 0.0
    assert float(jnp.abs(out["nerf_feat"]).sum()) == 2.0


def test_indicators_reference_semantics():
    cfg = MoDAConfig(freeze_proj=True, proj_start=0.0, proj_end=0.2, frzbody_end=0.8)
    ind = compute_indicators(cfg, progress=0.1, step_in_epoch=1,
                             counter_frz_rebone=0.0, is_fine_tune=True)
    assert ind.shape_update == 1.0 and ind.cvf_update == 1.0
    assert ind.root_update == 0.0 and ind.body_update == 0.0
    ind2 = compute_indicators(cfg, progress=0.9, step_in_epoch=0,
                              counter_frz_rebone=0.0, is_fine_tune=True)
    assert ind2.shape_update == 0.0 and ind2.root_update == 1.0 and ind2.body_update == 1.0
    # flow-only alternation during warmup
    cfg3 = MoDAConfig()
    i3 = compute_indicators(cfg3, 0.1, step_in_epoch=0, counter_frz_rebone=0, is_fine_tune=False)
    assert i3.loss_select == 0
    i4 = compute_indicators(cfg3, 0.1, step_in_epoch=1, counter_frz_rebone=0, is_fine_tune=False)
    assert i4.loss_select == 1


def default_extras(model, key):
    return StepExtras(
        progress=jnp.asarray(0.5),
        loss_select=jnp.asarray(1),
        root_update=jnp.asarray(1.0),
        body_update=jnp.asarray(1.0),
        shape_update=jnp.asarray(0.0),
        cvf_update=jnp.asarray(0.0),
        sil_err_median=jnp.asarray(1e9),
        shape_samp=jax.random.normal(key, (32, 3)) * 0.1,
        shape_samp_valid=jnp.asarray(1.0),
        embed_alpha=jnp.asarray(10.0),
    )


def test_train_step_updates_and_decreases_loss(rng):
    cfg, model, params, mvars = tiny_setup()
    batch = tiny_batch(rng, cfg)
    opt = MoDAOptimizer(cfg, total_steps=100)
    opt_state = opt.init(params)
    step = make_train_step(model, opt, nsample=cfg.nsample, ndepth=cfg.ndepth,
                           use_fine=False, use_dskin=False, use_bones=True,
                           donate=False)
    extras = default_extras(model, jax.random.key(9))

    losses = []
    p, s = params, opt_state
    for i in range(5):
        p, s, aux, host_out = step(p, s, mvars, batch, extras, jax.random.key(i))
        losses.append(float(aux["total_loss"]))
        assert np.isfinite(losses[-1])
        assert float(aux["grad_finite"]) == 1.0
    # params actually changed
    d = jax.tree_util.tree_map(lambda a, b: float(jnp.abs(a - b).max()),
                               p["nerf_coarse"], params["nerf_coarse"])
    assert max(jax.tree_util.tree_leaves(d)) > 0
    # per-group grad norms logged
    assert "nerf_coarse_g" in aux and "nerf_root_rts_g" in aux
    assert host_out["rtk"].shape == (4, 4, 4)
    # loss on a fixed batch should trend down over a few steps
    assert losses[-1] < losses[0] * 1.5


def test_train_step_without_bones(rng):
    cfg, model, params, mvars = tiny_setup()
    batch = tiny_batch(rng, cfg)
    opt = MoDAOptimizer(cfg, total_steps=100)
    step = make_train_step(model, opt, nsample=cfg.nsample, ndepth=cfg.ndepth,
                           use_fine=False, use_dskin=False, use_bones=False,
                           donate=False)
    extras = default_extras(model, jax.random.key(9))
    p, s, aux, _ = step(params, opt.init(params), mvars, batch, extras, jax.random.key(0))
    assert np.isfinite(float(aux["total_loss"]))


def test_freeze_coarse_surgery(rng):
    """freeze_coarse: only positional input-kernel rows keep gradients."""
    from moda_tpu.train.optim import _freeze_coarse_component, POS_DIM
    g = {"xyz_1": {"kernel": jnp.ones((191, 64)), "bias": jnp.ones(64)},
         "xyz_2": {"kernel": jnp.ones((64, 64)), "bias": jnp.ones(64)}}
    out = _freeze_coarse_component(g)
    k = np.asarray(out["xyz_1"]["kernel"])
    assert (k[:POS_DIM] == 1).all() and (k[POS_DIM:] == 0).all()
    assert (np.asarray(out["xyz_1"]["bias"]) == 0).all()
    assert (np.asarray(out["xyz_2"]["kernel"]) == 0).all()


def test_use_cam_grads_finite(rng):
    """Regression: use_cam=True (so3 delta table at exact zeros) must not
    produce NaN gradients (safe_norm in axis_angle_to_q)."""
    cfg, model, params, mvars = tiny_setup(use_cam=True)
    batch = tiny_batch(rng, cfg)
    opt = MoDAOptimizer(cfg, total_steps=10)
    step = make_train_step(model, opt, nsample=cfg.nsample, ndepth=cfg.ndepth,
                           use_fine=False, use_dskin=False, use_bones=True,
                           donate=False)
    ex = default_extras(model, jax.random.key(9))
    ex = ex._replace(base_rt=jnp.tile(
        jnp.concatenate([jnp.eye(3), jnp.asarray([[0.0], [0.0], [0.3]])], 1)[None],
        (model.num_fr, 1, 1)))
    p, s, aux, _ = step(params, opt.init(params), mvars, batch, ex, jax.random.key(0))
    assert float(aux["grad_finite"]) == 1.0, "NaN gradients with use_cam"


def test_grad_accumulation_matches_full_batch(rng):
    """accu_steps=2 equals a full-batch step up to numerical noise
    (same pixels are not sampled, so compare that both update finitely
    and produce comparable loss scale)."""
    cfg, model, params, mvars = tiny_setup()
    batch = tiny_batch(rng, cfg)
    opt = MoDAOptimizer(cfg, total_steps=10)
    extras = default_extras(model, jax.random.key(9))
    step1 = make_train_step(model, opt, nsample=cfg.nsample, ndepth=cfg.ndepth,
                            use_fine=False, use_dskin=False, use_bones=True,
                            donate=False, accu_steps=1)
    step2 = make_train_step(model, opt, nsample=cfg.nsample, ndepth=cfg.ndepth,
                            use_fine=False, use_dskin=False, use_bones=True,
                            donate=False, accu_steps=2)
    p1, _, a1, _ = step1(params, opt.init(params), mvars, batch, extras, jax.random.key(0))
    p2, _, a2, h2 = step2(params, opt.init(params), mvars, batch, extras, jax.random.key(0))
    assert float(a1["grad_finite"]) == 1.0 and float(a2["grad_finite"]) == 1.0
    assert np.isfinite(float(a2["total_loss"]))
    assert h2["rtk"].shape == (4, 4, 4)
    # both actually moved the params
    for p_new in (p1, p2):
        d = jax.tree_util.tree_map(lambda a, b: float(jnp.abs(a - b).max()),
                                   p_new["nerf_coarse"], params["nerf_coarse"])
        assert max(jax.tree_util.tree_leaves(d)) > 0


def test_step_determinism(rng):
    """Same seed + same batch -> bitwise-identical updates (explicit PRNG,
    no data races — the determinism claim of DESIGN.md/SURVEY §5)."""
    cfg, model, params, mvars = tiny_setup()
    batch = tiny_batch(rng, cfg)
    opt = MoDAOptimizer(cfg, total_steps=10)
    step = make_train_step(model, opt, nsample=cfg.nsample, ndepth=cfg.ndepth,
                           use_fine=False, use_dskin=False, use_bones=True,
                           donate=False)
    ex = default_extras(model, jax.random.key(9))
    p1, _, a1, _ = step(params, opt.init(params), mvars, batch, ex, jax.random.key(7))
    p2, _, a2, _ = step(params, opt.init(params), mvars, batch, ex, jax.random.key(7))
    assert float(a1["total_loss"]) == float(a2["total_loss"])
    d = jax.tree_util.tree_map(lambda a, b: float(jnp.abs(a - b).max()), p1, p2)
    assert max(jax.tree_util.tree_leaves(d)) == 0.0


def test_train_step_lineload_filter(rng):
    """lineload batch (lineid present) routes the loss filter through the
    in-graph per-line rejection (sil_loss_filter_line)."""
    cfg, model, params, mvars = tiny_setup(lineload=True, loss_flt=True)
    batch = tiny_batch(rng, cfg)
    # lineload: observations are one row of img_size pixels per entry
    S = cfg.img_size
    for k, c in (("imgs", 3), ("masks", 1), ("vis2d", 1), ("flow", 2),
                 ("occ", 1), ("dp_feats", 16)):
        batch[k] = batch[k][:, :, :S]
    batch["lineid"] = jnp.asarray([3, 5, 3, 5])
    opt = MoDAOptimizer(cfg, total_steps=10)
    step = make_train_step(model, opt, nsample=cfg.nsample, ndepth=cfg.ndepth,
                           use_fine=False, use_dskin=False, use_bones=True,
                           donate=False)
    ex = default_extras(model, jax.random.key(9))
    p, s, aux, host = step(params, opt.init(params), mvars, batch, ex,
                           jax.random.key(0))
    assert float(aux["grad_finite"]) == 1.0
    assert np.isfinite(float(aux["total_loss"]))
    # the per-frame error stats only touch this batch's frames
    fe = np.asarray(host["frame_err"])
    touched = np.unique(np.asarray(batch["frameid"]))
    untouched = np.setdiff1d(np.arange(model.num_fr), touched)
    assert (fe[untouched] == 0).all()


def test_train_step_ft_cse(rng):
    """ft_cse: trainable CSE runs in the step, distill loss is logged and
    its params receive updates (moda.py:1388-1398 + 723-731)."""
    cfg, model, params, mvars = tiny_setup(ft_cse=True)
    assert "csenet" in params
    batch = tiny_batch(rng, cfg)
    opt = MoDAOptimizer(cfg, total_steps=10)
    step = make_train_step(model, opt, nsample=cfg.nsample, ndepth=cfg.ndepth,
                           use_fine=False, use_dskin=False, use_bones=True,
                           donate=False)
    ex = default_extras(model, jax.random.key(9))
    p, s, aux, _ = step(params, opt.init(params), mvars, batch, ex, jax.random.key(0))
    assert float(aux["grad_finite"]) == 1.0
    assert np.isfinite(float(aux["csenet_loss"]))
    d = jax.tree_util.tree_map(lambda a, b: float(jnp.abs(a - b).max()),
                               p["csenet"], params["csenet"])
    assert max(jax.tree_util.tree_leaves(d)) > 0


def test_train_step_ft_cse_distill_only_phase(rng):
    """progress < mtcse_steps: total = csenet_loss alone, so the shape MLP
    receives zero gradient (moda.py:727-729)."""
    cfg, model, params, mvars = tiny_setup(ft_cse=True, mtcse_steps=0.9)
    batch = tiny_batch(rng, cfg)
    opt = MoDAOptimizer(cfg, total_steps=10)
    step = make_train_step(model, opt, nsample=cfg.nsample, ndepth=cfg.ndepth,
                           use_fine=False, use_dskin=False, use_bones=True,
                           donate=False)
    ex = default_extras(model, jax.random.key(9))  # progress 0.5 < 0.9
    p, s, aux, _ = step(params, opt.init(params), mvars, batch, ex, jax.random.key(0))
    assert float(aux["nerf_coarse_g"]) == 0.0
    assert float(aux["csenet_g"]) > 0.0


@pytest.mark.slow
def test_sparse_batch_matches_dense_observations(rng):
    """Host-subsampled batches (sparsify_batch) must produce rays whose
    observations equal a manual gather of the dense batch at pix_ids."""
    from moda_tpu.data.dataset import sparsify_batch
    from moda_tpu.render import rays as RB
    from tests.test_render_pipeline import make_rtk

    cfg, model, params, mvars = tiny_setup()
    batch = tiny_batch(rng, cfg)
    host = {k: np.asarray(v) for k, v in batch.items()}
    sp = sparsify_batch(host, npix=5 * cfg.nsample, rng=np.random.default_rng(3))
    assert sp["pix_ids"].shape == (4, 5 * cfg.nsample)
    assert sp["imgs"].shape == (4, 3, 5 * cfg.nsample)

    sp_dev = {k: jnp.asarray(v) for k, v in sp.items()}
    rtk = make_rtk(model, params, sp_dev)
    rays = RB.build_rays(model, params, mvars, sp_dev, rtk, jax.random.key(0),
                         cfg.nsample)
    R = rays["img_at_samp"].shape[0]
    assert R == 4 * cfg.nsample
    # first half rays use uniform slots [:nsample] of entries 0..B-1
    B = 2
    for j in range(cfg.nsample):
        ent, slot = 0, j
        gid = sp["pix_ids"][ent, slot]
        np.testing.assert_allclose(np.asarray(rays["img_at_samp"])[j],
                                   host["imgs"][ent, :, gid], atol=1e-6)
        np.testing.assert_allclose(np.asarray(rays["xys"])[j, 0], gid % cfg.img_size)


def test_train_step_sparse_batch_with_active(rng):
    """Full step on a sparse batch with active sampling enabled: the pool
    comes from the last 4*nsample uploaded columns."""
    from moda_tpu.data.dataset import sparsify_batch

    cfg, model, params, mvars = tiny_setup()
    batch = tiny_batch(rng, cfg)
    host = {k: np.asarray(v) for k, v in batch.items()}
    sp = sparsify_batch(host, npix=5 * cfg.nsample, rng=np.random.default_rng(3))
    sp_dev = {k: jnp.asarray(v) for k, v in sp.items()}
    opt = MoDAOptimizer(cfg, total_steps=10)
    ns_a = cfg.nsample // 2
    step = make_train_step(model, opt, nsample=cfg.nsample - ns_a,
                           ndepth=cfg.ndepth, use_fine=False, use_dskin=False,
                           use_bones=True, nsample_active=ns_a, donate=False)
    ex = default_extras(model, jax.random.key(9))
    p, s, aux, _ = step(params, opt.init(params), mvars, sp_dev, ex, jax.random.key(0))
    assert float(aux["grad_finite"]) == 1.0
    assert np.isfinite(float(aux["total_loss"]))


def test_root_step_rejection(rng):
    """root_stab_reject: a root grad norm above clip_scale after the
    200-step grace period drops that step's root update in-graph (the
    reference's reload-on-explosion, train_utils.py:971-974, at step
    granularity)."""
    cfg, model, params, mvars = tiny_setup(clip_scale=1e-9)
    batch = tiny_batch(rng, cfg)
    opt = MoDAOptimizer(cfg, total_steps=100)
    step = make_train_step(model, opt, nsample=cfg.nsample, ndepth=cfg.ndepth,
                           use_fine=False, use_dskin=False, use_bones=True,
                           donate=False)
    extras = default_extras(model, jax.random.key(3))
    opt_state = opt.init(params)

    # inside the grace period: update goes through, flag off
    p1, _, aux1, _ = step(params, opt_state, mvars, batch, extras,
                          jax.random.key(0))
    assert float(aux1["root_step_rejected"]) == 0.0
    d1 = max(float(jnp.abs(a - b).max()) for a, b in zip(
        jax.tree_util.tree_leaves(p1["nerf_root_rts"]),
        jax.tree_util.tree_leaves(params["nerf_root_rts"])))
    assert d1 > 1e-6

    # past the grace period: hot root step rejected, root params frozen
    # (up to AdamW weight decay, ~1e-8)
    hot_state = opt_state._replace(count=jnp.asarray(500, jnp.int32))
    p2, _, aux2, _ = step(params, hot_state, mvars, batch, extras,
                          jax.random.key(0))
    assert float(aux2["root_step_rejected"]) == 1.0
    d2 = max(float(jnp.abs(a - b).max()) for a, b in zip(
        jax.tree_util.tree_leaves(p2["nerf_root_rts"]),
        jax.tree_util.tree_leaves(params["nerf_root_rts"])))
    assert d2 < 1e-6
    # non-root groups still trained on the rejected step
    d_shape = max(float(jnp.abs(a - b).max()) for a, b in zip(
        jax.tree_util.tree_leaves(p2["nerf_coarse"]),
        jax.tree_util.tree_leaves(params["nerf_coarse"])))
    assert d_shape > 1e-6
