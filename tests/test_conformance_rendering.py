"""Reference-oracle conformance for the RENDERING pipeline (one level above
test_conformance_nets.py's per-module oracles).

Drives the reference's actual nnutils/rendering.py functions — inference()
(volume rendering: SDF->density, compositing, rgb/feat/depth/sil,
rendering.py:124-237) and inference_deform() (NeuDBS backward/forward warp,
cycle loss, displacement field, target-frame flow rendering,
rendering.py:239-579 + geom_utils.py:372-517) — with randomized torch
weights, converts those weights into our param pytree, and demands
numerical parity of our pipeline on the same inputs. Hardens the
bit-compat claim on the full hot path, not just its leaves
(VERDICT r4 next-step #8).

Stub policy identical to test_conformance_nets: heavy third-party deps are
stubbed; the rotation stubs are self-checked there against core.quat.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from test_conformance_nets import (  # noqa: E402
    REF, _q_raw_mul, _randomize, convert_nerf_trunk, load_ref_nerf)

import os  # noqa: E402

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "nnutils")),
    reason="reference checkout not mounted")


def load_ref_rendering():
    """Import nnutils.rendering on top of the nets-test stubs, adding the
    quaternion ops geom_utils.py needs beyond what nerf.py uses."""
    load_ref_nerf()  # installs stubs + sys.path
    import pytorch3d.transforms as tr

    def _standardize(q):
        return torch.where(q[..., 0:1] < 0, -q, q)

    tr.quaternion_invert = lambda q: q * torch.tensor([1.0, -1.0, -1.0, -1.0])
    tr.standardize_quaternion = _standardize
    tr.quaternion_multiply = lambda a, b: _standardize(_q_raw_mul(a, b))
    import nnutils.rendering as ref_rendering
    return ref_rendering


# ---------------------------------------------------------------- fixtures

B_BONES = 4
T_DIM = 128
R_RAYS = 6
BETA = 0.4


def _np_q_raw_mul(a, b):
    aw, ax, ay, az = np.moveaxis(a, -1, 0)
    bw, bx, by, bz = np.moveaxis(b, -1, 0)
    return np.stack(
        [aw * bw - ax * bx - ay * by - az * bz,
         aw * bx + ax * bw + ay * bz - az * by,
         aw * by - ax * bz + ay * bw + az * bx,
         aw * bz + ax * by - ay * bx + az * bw], -1)


def _rand_dq(rng, prefix):
    """Random rigid dual quaternions [..., 8] (real-first, q_d = 0.5 t⊗q_r)."""
    q = rng.normal(size=prefix + (4,)).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    t = (rng.normal(size=prefix + (3,)) * 0.2).astype(np.float32)
    tq = np.concatenate([np.zeros(prefix + (1,), np.float32), t], -1)
    qd = 0.5 * _np_q_raw_mul(tq, q)
    return np.concatenate([q, qd], -1)


def _rand_rtk_vec(rng, n):
    """Per-ray camera vector [n, 21]: Rmat(9) Tmat(3) Kinv(9)."""
    from moda_tpu.core import quat as Q
    q = rng.normal(size=(n, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    Rm = np.asarray(Q.q_to_matrix(jnp.asarray(q)))
    Tm = np.concatenate(
        [rng.normal(size=(n, 2)).astype(np.float32) * 0.1,
         2.0 + 0.2 * rng.uniform(size=(n, 1)).astype(np.float32)], -1)
    Kinv = np.zeros((n, 3, 3), np.float32)
    Kinv[:, 0, 0] = 1.0 / 20.0
    Kinv[:, 1, 1] = 1.0 / 20.0
    Kinv[:, 0, 2] = -8.0 / 20.0
    Kinv[:, 1, 2] = -8.0 / 20.0
    Kinv[:, 2, 2] = 1.0
    return np.concatenate([Rm.reshape(n, 9), Tm, Kinv.reshape(n, 9)], -1)


def _setup(rng, nerf_dis=True):
    """Our tiny model with params overwritten by converted random reference
    weights, plus the matching reference modules."""
    from moda_tpu.config import DataInfo, MoDAConfig
    from moda_tpu.fields.model import MoDAModel

    ref_nerf = load_ref_nerf()
    cfg = MoDAConfig(num_bones=B_BONES, img_size=16, nsample=4, ndepth=8,
                     nerf_vis=False, nerf_dis=nerf_dis, use_unc=False,
                     use_corr=False, feat_ndepth_grid=4, init_beta=BETA)
    info = DataInfo(offset=(0, 6), intrinsics=((20.0, 20.0, 8.0, 8.0),))
    model = MoDAModel(cfg, info)
    params, mvars = model.init(jax.random.key(0))

    # reference nets, randomized, with matching architecture to ours
    # (model.py:74-97: coarse D8/W256 dir=27+64, feat D5/W128, skin D5/W64,
    # dis D5/W128)
    ref_coarse = _randomize(ref_nerf.NeRF(
        D=8, W=256, in_channels_xyz=63, in_channels_dir=27 + 64,
        out_channels=3, raw_feat=False), 10, scale=0.05)
    with torch.no_grad():
        ref_coarse.beta.copy_(torch.tensor([BETA]))
    ref_feat = _randomize(ref_nerf.NeRF(
        D=5, W=128, in_channels_xyz=63, in_channels_dir=0,
        out_channels=16, raw_feat=True), 11, scale=0.1)
    ref_skin = _randomize(ref_nerf.NeRF(
        D=5, W=64, in_channels_xyz=63 + T_DIM, in_channels_dir=0,
        out_channels=B_BONES, raw_feat=True), 12, scale=0.1)
    ref_dis = _randomize(ref_nerf.NeRF(
        D=5, W=128, in_channels_xyz=63 + T_DIM, in_channels_dir=0,
        out_channels=3, raw_feat=True), 13, scale=0.05)
    for m in (ref_coarse, ref_feat, ref_skin, ref_dis):
        m.eval()

    params["nerf_coarse"] = convert_nerf_trunk(ref_coarse.state_dict(), 8)
    params["nerf_feat"] = convert_nerf_trunk(ref_feat.state_dict(), 5)
    params["nerf_skin"] = convert_nerf_trunk(ref_skin.state_dict(), 5)
    if nerf_dis:
        params["nerf_dis"] = convert_nerf_trunk(ref_dis.state_dict(), 5)
    params["nerf_beta"] = jnp.asarray([BETA], jnp.float32)
    params["skin_aux"] = jnp.asarray([0.3, 1.0], jnp.float32)

    refs = dict(coarse=ref_coarse, feat=ref_feat, skin=ref_skin, dis=ref_dis)
    return cfg, model, params, mvars, refs


def _allclose(got, want, atol, msg):
    got = np.squeeze(np.asarray(got))
    want = np.squeeze(np.asarray(
        want.detach().numpy() if torch.is_tensor(want) else want))
    np.testing.assert_allclose(got, want, atol=atol, rtol=1e-4, err_msg=msg)


# ------------------------------------------------------------------ tests


def test_inference_coarse_matches_reference(rng):
    """Volume rendering oracle: reference inference() vs our _inference()
    on identical sampled points / depths / codes (rendering.py:124-237).
    Covers the SDF->density transform, compositing weights, and the
    rgb/feat/depth/sil/visibility heads in one pass."""
    ref_rendering = load_ref_rendering()
    from moda_tpu.render.pipeline import _inference

    cfg, model, params, mvars, refs = _setup(rng, nerf_dis=False)
    R, S = R_RAYS, 16
    near = np.full((R, 1), 0.8, np.float32)
    far = np.full((R, 1), 1.6, np.float32)
    z_steps = np.linspace(0, 1, S, dtype=np.float32)
    z_vals = near * (1 - z_steps) + far * z_steps  # [R,S]
    rays_o = rng.normal(size=(R, 3)).astype(np.float32) * 0.1
    rays_d = rng.normal(size=(R, 3)).astype(np.float32)
    xyz = rays_o[:, None] + rays_d[:, None] * z_vals[..., None] * 0.2
    env_code = rng.normal(size=(R, 64)).astype(np.float32) * 0.5

    # each side embeds directions with its own embedder (parity of the
    # embedders themselves is test_embedding_matches_reference)
    d_norm = rays_d / np.linalg.norm(rays_d, axis=-1, keepdims=True)
    dir_emb_ours = model.embed_dir(jnp.asarray(d_norm))
    ref_embed_dir = ref_rendering.Embedding(3, 4) \
        if hasattr(ref_rendering, "Embedding") else None
    import nnutils.nerf as ref_nerf
    ref_embed_xyz = ref_nerf.Embedding(3, 10)
    ref_embed_dir = ref_nerf.Embedding(3, 4)
    with torch.no_grad():
        dir_emb_ref = ref_embed_dir(torch.tensor(d_norm))

    rays = {"near": jnp.asarray(near), "far": jnp.asarray(far),
            "env_code": jnp.asarray(env_code)}
    got = _inference(model, params, rays, jnp.asarray(xyz),
                     jnp.asarray(rays_d), dir_emb_ours, jnp.asarray(z_vals),
                     None, 0.0, cfg)

    models = {"coarse": refs["coarse"], "nerf_feat": refs["feat"]}
    with torch.no_grad():
        want = ref_rendering.inference(
            models, ref_embed_xyz, torch.tensor(xyz), torch.tensor(rays_d),
            dir_emb_ref, torch.tensor(z_vals), R, S, 32 * 1024, 0.0,
            env_code=torch.tensor(env_code), scale_rgb=cfg.scale_rgb,
            rgb_filter=False)

    names = ["rgb", "feat", "depth", "weights", "visibility", "sil"]
    for g, w, n in zip(got, want, names):
        _allclose(g, w, 3e-5, n)


def test_inference_deform_cycle_matches_reference(rng):
    """Deform-path oracle: reference inference_deform() vs ours on the
    NeuDBS bones route with delta-skinning and the displacement field
    (rendering.py:239-579, geom_utils.py:372-517): backward warp, forward
    cycle, dis_reg/dis_reg_forward, target-frame warp + rendered flow."""
    ref_rendering = load_ref_rendering()
    import nnutils.nerf as ref_nerf
    from moda_tpu.render import pipeline as P

    cfg, model, params, mvars, refs = _setup(rng, nerf_dis=True)
    R, S = R_RAYS, 8
    near = np.full((R, 1), 0.8, np.float32)
    far = np.full((R, 1), 1.6, np.float32)
    z_steps = np.linspace(0, 1, S, dtype=np.float32)
    z_vals = near * (1 - z_steps) + far * z_steps
    rays_o = rng.normal(size=(R, 3)).astype(np.float32) * 0.1
    rays_d = rng.normal(size=(R, 3)).astype(np.float32)
    xyz = rays_o[:, None] + rays_d[:, None] * z_vals[..., None] * 0.2

    bones = np.concatenate(
        [rng.normal(size=(B_BONES, 3)).astype(np.float32) * 0.2,
         _rand_dq(rng, (B_BONES,))[:, :4],
         rng.normal(size=(B_BONES, 3)).astype(np.float32) * 0.3 - 1.0], -1)
    bone_rts = _rand_dq(rng, (R, B_BONES))
    bone_rts_t = _rand_dq(rng, (R, B_BONES))
    time_embedded = rng.normal(size=(R, T_DIM)).astype(np.float32) * 0.1
    rest_code = rng.normal(size=(1, T_DIM)).astype(np.float32) * 0.1
    env_code = rng.normal(size=(R, 64)).astype(np.float32) * 0.5
    rtk_vec_t = _rand_rtk_vec(rng, R)
    xys = (rng.uniform(size=(R, 2)) * 16).astype(np.float32)

    d_norm = rays_d / np.linalg.norm(rays_d, axis=-1, keepdims=True)
    rays_j = {
        "near": jnp.asarray(near), "far": jnp.asarray(far),
        "rays_d": jnp.asarray(rays_d),
        "dir_embedded": model.embed_dir(jnp.asarray(d_norm)),
        "env_code": jnp.asarray(env_code),
        "time_embedded": jnp.asarray(time_embedded),
        "bones_rst": jnp.asarray(bones),
        "bone_rts": jnp.asarray(bone_rts),
        "bone_rts_target": jnp.asarray(bone_rts_t),
        "rest_pose_code": jnp.asarray(rest_code),
        "rtk_vec_target": jnp.asarray(rtk_vec_t),
        "xys": jnp.asarray(xys),
    }
    got, got_w = P.inference_deform(
        model, params, mvars, rays_j, jnp.asarray(xyz), jnp.asarray(z_vals),
        None, cfg, fine_iter=True, use_dskin=True)

    # reference side
    ref_embed_xyz = ref_nerf.Embedding(3, 10)
    ref_embed_dir = ref_nerf.Embedding(3, 4)
    rest_mod = torch.nn.Embedding(1, T_DIM)
    with torch.no_grad():
        rest_mod.weight.copy_(torch.tensor(rest_code))
        dir_emb_ref = ref_embed_dir(torch.tensor(d_norm))
    models = {
        "coarse": refs["coarse"], "nerf_feat": refs["feat"],
        "bones": torch.tensor(bones), "bones_rst": torch.tensor(bones),
        "skin_aux": torch.tensor([0.3, 1.0]),
        "rest_pose_code": rest_mod,
        "nerf_skin": refs["skin"], "nerf_dis": refs["dis"],
    }
    rays_t = {
        "xys": torch.tensor(xys),
        "time_embedded": torch.tensor(time_embedded),
        "bone_rts": torch.tensor(bone_rts),
        "bone_rts_target": torch.tensor(bone_rts_t),
        "rtk_vec_target": torch.tensor(rtk_vec_t),
        "env_code": torch.tensor(env_code),
    }

    class Opts:
        neudbs, lbs, dist_corresp = True, False, True
        symm_shape, use_corresp, s3im_loss = False, False, False
        scale_rgb, rgb_filter = cfg.scale_rgb, False

    with torch.no_grad():
        want, want_w = ref_rendering.inference_deform(
            torch.tensor(xyz), rays_t, models, 32 * 1024, S, R,
            ref_embed_xyz, torch.tensor(rays_d), 0.0,
            torch.ones(3), dir_emb_ref, torch.tensor(z_vals),
            cfg.img_size, None, Opts, fine_iter=True)

    _allclose(got_w, want_w, 3e-5, "weights")
    for k in ("img_coarse", "depth_rnd", "sil_coarse", "frame_cyc_dis",
              "dis_reg", "dis_reg_forward", "flo_coarse", "flo_valid",
              "xyz_canonical_vis"):
        assert k in got, f"ours missing {k}"
        assert k in want, f"reference missing {k}"
        _allclose(got[k], want[k], 5e-5, k)
