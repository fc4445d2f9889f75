import numpy as np
import jax
import jax.numpy as jnp

from moda_tpu.config import DataInfo, MoDAConfig
from moda_tpu.fields import nets
from moda_tpu.fields.model import MoDAModel, create_base_se3


def small_model(**kw):
    cfg = MoDAConfig(num_bones=4, use_unc=True, **kw)
    info = DataInfo(offset=(0, 12, 30), intrinsics=((500.0, 500.0, 64.0, 64.0),) * 2)
    model = MoDAModel(cfg, info)
    params, mvars = model.init(jax.random.key(0))
    return cfg, model, params, mvars


def test_init_param_groups():
    cfg, model, params, mvars = small_model()
    for k in [
        "nerf_coarse", "nerf_beta", "nerf_feat", "nerf_beta_feat", "nerf_vis",
        "nerf_unc", "vid_code", "bones", "skin_aux", "pose_code", "nerf_body_rts",
        "nerf_skin", "rest_pose_code", "env_code", "nerf_root_rts", "ks_param",
    ]:
        assert k in params, k
    assert params["bones"].shape == (4, 10)
    assert params["ks_param"].shape == (2, 4)
    assert mvars.near_far.shape == (30, 2)
    # scene scale: obj_scale=10, near_far init [0, 0.6]
    np.testing.assert_allclose(float(mvars.near_far[0, 1]), 0.6, atol=1e-6)


def test_body_rts_dq_shape_and_near_identity():
    cfg, model, params, _ = small_model()
    fid = jnp.asarray([0, 5, 20])
    dqs = model.body_rts(params, fid)
    assert dqs.shape == (3, 4, 8)
    # near identity at init (zero-bias heads): real part ~ unit quaternion
    norms = np.linalg.norm(np.asarray(dqs)[..., :4], axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-4)


def test_root_rts_and_compute_rts():
    cfg, model, params, _ = small_model()
    rts = model.root_rts(params, jnp.asarray([0, 1, 2]))
    assert rts.shape == (3, 1, 12)
    all_rt = model.compute_rts(params)
    assert all_rt.shape == (30, 3, 4)
    # rotation stays orthonormal
    r = np.asarray(all_rt[:, :3, :3])
    rtr = np.einsum("nij,nkj->nik", r, r)
    np.testing.assert_allclose(rtr, np.tile(np.eye(3), (30, 1, 1)), atol=1e-4)


def test_frame_code_batch_consistency():
    cfg, model, params, _ = small_model()
    f = jnp.asarray([0, 11, 12, 29])
    codes = model.apply_pose_code(params, f)
    assert codes.shape == (4, cfg.t_embed_dim)
    # same fid -> same code
    c2 = model.apply_pose_code(params, jnp.asarray([11, 11]))
    np.testing.assert_allclose(np.asarray(c2[0]), np.asarray(c2[1]), atol=0)


def test_fid_reindex_videos():
    offset = jnp.asarray([0, 12, 30])
    vid, tid = nets.fid_reindex(jnp.asarray([0, 5, 11, 12, 29]), offset)
    np.testing.assert_array_equal(np.asarray(vid), [0, 0, 0, 1, 1])
    # normalized to [-1, 1] within the longest video (max_ts=18)
    assert (np.abs(np.asarray(tid)) <= 1.0 + 1e-6).all()


def test_nerf_mlp_shapes():
    mlp = nets.NeRFMLP(D=2, W=32, in_channels_xyz=63, in_channels_dir=27)
    p = mlp.init(jax.random.key(0), jnp.zeros((5, 90)))["params"]
    out = mlp.apply({"params": p}, jnp.ones((5, 90)))
    assert out.shape == (5, 4)
    sig = mlp.apply({"params": p}, jnp.ones((5, 90)), sigma_only=True)
    assert sig.shape == (5, 1)
    # rgb in (0, 1)
    assert (np.asarray(out[:, :3]) > 0).all() and (np.asarray(out[:, :3]) < 1).all()


def test_base_se3():
    rt = np.asarray(create_base_se3(2))
    np.testing.assert_allclose(rt[:, :3, :3], np.tile(np.eye(3), (2, 1, 1)))
    np.testing.assert_allclose(rt[:, 2, 3], 0.3)
