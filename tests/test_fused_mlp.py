"""Conformance of the fused Pallas MLP kernel vs the flax NeRFMLP.

Runs in pallas interpret mode on the CPU test backend; on TPU the same
code compiles to a Mosaic kernel. Forward values and every gradient
(input + all weights) must match the autodiff'd flax module. The kernel
computes matmuls in bf16 with fp32 accumulation, so tolerances are bf16-
scale; a strict fp32 check uses a float32-compute instance of the kernel
path via high-precision interpret execution.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from moda_tpu.fields.nets import NeRFMLP
from moda_tpu.ops import fused_mlp as FM


def _setup(D=8, W=64, in_xyz=63, in_dir=27, out_ch=3, n=96, seed=0):
    mod = NeRFMLP(D=D, W=W, in_channels_xyz=in_xyz, in_channels_dir=in_dir,
                  out_channels=out_ch, raw_feat=False)
    key = jax.random.key(seed)
    x = jax.random.normal(jax.random.key(seed + 1), (n, in_xyz + in_dir))
    params = mod.init(key, x)["params"]
    return mod, params, x


@pytest.mark.parametrize("D,W,in_xyz,in_dir,out_ch", [
    (8, 64, 63, 27, 3),    # trunk shape (narrow W for test speed)
    (5, 64, 63, 0, 16),    # feat/vis-style head, no dir input
])
def test_fused_forward_matches_flax(D, W, in_xyz, in_dir, out_ch):
    mod, params, x = _setup(D, W, in_xyz, in_dir, out_ch)
    ref = mod.apply({"params": params}, x)
    got = FM.nerf_mlp_pallas(params, x, D=D, in_xyz=in_xyz, in_dir=in_dir,
                             raw_feat=False, block_points=32, block_points_bwd=32)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=3e-2, rtol=3e-2)


def test_fused_forward_leading_dims():
    D, W, in_xyz, in_dir, out_ch = 5, 64, 63, 0, 8
    mod, params, x = _setup(D, W, in_xyz, in_dir, out_ch, n=60)
    x3 = x.reshape(5, 12, -1)
    ref = mod.apply({"params": params}, x3)
    got = FM.nerf_mlp_pallas(params, x3, D=D, in_xyz=in_xyz, in_dir=in_dir,
                             raw_feat=False, block_points=16, block_points_bwd=16)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=3e-2, rtol=3e-2)


def test_fused_gradients_match_flax():
    """fp32 compute dtype: the custom VJP must match autodiff exactly
    (~1e-6). bf16 (the training configuration) only loosely — its error
    is MXU accumulation noise, not a VJP bug (verified by the fp32 run)."""
    D, W, in_xyz, in_dir, out_ch = 8, 64, 63, 27, 3
    mod, params, x = _setup(D, W, in_xyz, in_dir, out_ch, n=64)

    def loss_ref(params, x):
        out = mod.apply({"params": params}, x)
        return (out ** 2).sum()

    def loss_fused(params, x, cdt):
        out = FM.nerf_mlp_pallas(params, x, D=D, in_xyz=in_xyz, in_dir=in_dir,
                                 raw_feat=False, block_points=32, block_points_bwd=32, compute_dtype=cdt)
        return (out ** 2).sum()

    gr_p, gr_x = jax.grad(loss_ref, argnums=(0, 1))(params, x)
    gf_p, gf_x = jax.grad(loss_fused, argnums=(0, 1))(params, x, jnp.float32)

    np.testing.assert_allclose(np.asarray(gf_x), np.asarray(gr_x), atol=1e-5)
    flat_r = jax.tree_util.tree_leaves_with_path(gr_p)
    gf_p_flat = {jax.tree_util.keystr(k): v
                 for k, v in jax.tree_util.tree_leaves_with_path(gf_p)}
    for k, vr in flat_r:
        vf = gf_p_flat[jax.tree_util.keystr(k)]
        np.testing.assert_allclose(np.asarray(vf), np.asarray(vr), atol=1e-4,
                                   err_msg=jax.tree_util.keystr(k))

    # bf16 run: same direction, bf16-scale deviation
    gb_p, gb_x = jax.grad(loss_fused, argnums=(0, 1))(params, x, jnp.bfloat16)
    denom = float(np.abs(np.asarray(gr_x)).max())
    assert float(np.abs(np.asarray(gb_x) - np.asarray(gr_x)).max()) / denom < 0.3


def test_fused_sigma_only_and_raw_feat():
    D, W, in_xyz, in_dir, out_ch = 5, 64, 63, 0, 16
    mod_raw = NeRFMLP(D=D, W=W, in_channels_xyz=in_xyz, in_channels_dir=in_dir,
                      out_channels=out_ch, raw_feat=True)
    key = jax.random.key(3)
    x = jax.random.normal(jax.random.key(4), (40, in_xyz))
    params = mod_raw.init(key, x)["params"]
    ref_raw = mod_raw.apply({"params": params}, x)
    got_raw = FM.nerf_mlp_pallas(params, x, D=D, in_xyz=in_xyz, in_dir=in_dir,
                                 raw_feat=True, block_points=8, block_points_bwd=8)
    np.testing.assert_allclose(np.asarray(got_raw), np.asarray(ref_raw),
                               atol=3e-2, rtol=3e-2)
    ref_sig = mod_raw.apply({"params": params}, x, sigma_only=True)
    got_sig = FM.nerf_mlp_pallas(params, x, D=D, in_xyz=in_xyz, in_dir=in_dir,
                                 raw_feat=True, sigma_only=True, block_points=8, block_points_bwd=8)
    np.testing.assert_allclose(np.asarray(got_sig), np.asarray(ref_sig),
                               atol=3e-2, rtol=3e-2)


def test_fused_per_ray_codes_match_flax():
    """code_trunk/code_dir per-ray inputs must equal the flax module on the
    pre-concatenated layout (the kernel broadcasts codes in-register)."""
    D, W, out_ch = 5, 64, 4
    R, S, ct, cd = 6, 8, 16, 8
    in_xyz, in_dir = 63 + ct, cd
    mod = NeRFMLP(D=D, W=W, in_channels_xyz=in_xyz, in_channels_dir=in_dir,
                  out_channels=out_ch, raw_feat=True)
    key = jax.random.key(11)
    xe = jax.random.normal(jax.random.key(12), (R, S, 63))
    ctc = jax.random.normal(jax.random.key(13), (R, ct))
    cdc = jax.random.normal(jax.random.key(14), (R, cd))
    x_full = jnp.concatenate(
        [xe, jnp.broadcast_to(ctc[:, None], (R, S, ct)),
         jnp.broadcast_to(cdc[:, None], (R, S, cd))], -1)
    params = mod.init(key, x_full.reshape(-1, x_full.shape[-1]))["params"]

    def loss_ref(params):
        return (mod.apply({"params": params}, x_full) ** 2).sum()

    def loss_fused(params):
        out = FM.nerf_mlp_pallas(
            params, xe, D=D, in_xyz=in_xyz, in_dir=in_dir, raw_feat=True,
            code_trunk=ctc, code_dir=cdc, samples_per_ray=S,
            block_points=16, block_points_bwd=16,
            compute_dtype=jnp.float32)
        return (out ** 2).sum()

    np.testing.assert_allclose(float(loss_fused(params)),
                               float(loss_ref(params)), rtol=1e-5)
    gr = jax.grad(loss_ref)(params)
    gf = jax.grad(loss_fused)(params)
    for k, vr in jax.tree_util.tree_leaves_with_path(gr):
        vf = {jax.tree_util.keystr(kk): vv for kk, vv in
              jax.tree_util.tree_leaves_with_path(gf)}[jax.tree_util.keystr(k)]
        np.testing.assert_allclose(np.asarray(vf), np.asarray(vr), atol=2e-4,
                                   err_msg=jax.tree_util.keystr(k))

    # code gradients flow
    def loss_codes(ctc, cdc):
        out = FM.nerf_mlp_pallas(
            params, xe, D=D, in_xyz=in_xyz, in_dir=in_dir, raw_feat=True,
            code_trunk=ctc, code_dir=cdc, samples_per_ray=S,
            block_points=16, block_points_bwd=16,
            compute_dtype=jnp.float32)
        return (out ** 2).sum()

    def loss_codes_ref(ctc, cdc):
        xf = jnp.concatenate(
            [xe, jnp.broadcast_to(ctc[:, None], (R, S, ct)),
             jnp.broadcast_to(cdc[:, None], (R, S, cd))], -1)
        return (mod.apply({"params": params}, xf) ** 2).sum()

    g1 = jax.grad(loss_codes, argnums=(0, 1))(ctc, cdc)
    g2 = jax.grad(loss_codes_ref, argnums=(0, 1))(ctc, cdc)
    np.testing.assert_allclose(np.asarray(g1[0]), np.asarray(g2[0]), atol=2e-4)
    np.testing.assert_allclose(np.asarray(g1[1]), np.asarray(g2[1]), atol=2e-4)


def test_fused_in_kernel_embed_matches_flax():
    """embed_raw path: raw [R,S,3] points + in-kernel positional embed
    (with coarse-to-fine window) must equal positional_embed + flax, in
    value and in gradients wrt the RAW points, codes, and weights."""
    from moda_tpu.core.embedding import positional_embed, window_vec

    D, W, out_ch = 5, 64, 4
    R, S, ct, F = 4, 8, 16, 10
    in_xyz, in_dir = 63 + ct, 0
    mod = NeRFMLP(D=D, W=W, in_channels_xyz=in_xyz, in_channels_dir=in_dir,
                  out_channels=out_ch, raw_feat=True)
    key = jax.random.key(21)
    xyz = jax.random.normal(jax.random.key(22), (R, S, 3))
    ctc = jax.random.normal(jax.random.key(23), (R, ct))
    alpha = jnp.asarray(4.3)

    def full_input(xyz, alpha):
        xe = positional_embed(xyz, F, alpha=alpha)
        return jnp.concatenate(
            [xe, jnp.broadcast_to(ctc[:, None], (R, S, ct))], -1)

    params = mod.init(key, full_input(xyz, alpha).reshape(-1, in_xyz))["params"]

    def loss_ref(params, xyz, alpha):
        return (mod.apply({"params": params}, full_input(xyz, alpha)) ** 2).sum()

    def loss_fused(params, xyz, alpha):
        out = FM.nerf_mlp_pallas(
            params, xyz, D=D, in_xyz=in_xyz, in_dir=in_dir, raw_feat=True,
            code_trunk=ctc, samples_per_ray=S,
            embed_freqs=F, embed_window=window_vec(F, 3, alpha),
            block_points=16, block_points_bwd=16,
            compute_dtype=jnp.float32)
        return (out ** 2).sum()

    np.testing.assert_allclose(float(loss_fused(params, xyz, alpha)),
                               float(loss_ref(params, xyz, alpha)), rtol=1e-5)
    gr_p, gr_x, gr_a = jax.grad(loss_ref, argnums=(0, 1, 2))(params, xyz, alpha)
    gf_p, gf_x, gf_a = jax.grad(loss_fused, argnums=(0, 1, 2))(params, xyz, alpha)
    np.testing.assert_allclose(np.asarray(gf_x), np.asarray(gr_x),
                               atol=1e-4, rtol=1e-4)
    # alpha grad flows through the window vector (d_win accumulated in-kernel)
    np.testing.assert_allclose(float(gf_a), float(gr_a), rtol=1e-4)
    gf_flat = {jax.tree_util.keystr(k): v for k, v in
               jax.tree_util.tree_leaves_with_path(gf_p)}
    for k, vr in jax.tree_util.tree_leaves_with_path(gr_p):
        np.testing.assert_allclose(
            np.asarray(gf_flat[jax.tree_util.keystr(k)]), np.asarray(vr),
            atol=1e-4, err_msg=jax.tree_util.keystr(k))


def test_fused_in_kernel_embed_no_window():
    """embed_raw without a window (alpha=None -> ones) matches flax."""
    D, W, out_ch, F = 5, 64, 8, 10
    from moda_tpu.core.embedding import positional_embed
    mod = NeRFMLP(D=D, W=W, in_channels_xyz=63, in_channels_dir=0,
                  out_channels=out_ch, raw_feat=True)
    xyz = jax.random.normal(jax.random.key(31), (40, 3))
    params = mod.init(jax.random.key(30), positional_embed(xyz, F))["params"]
    ref = mod.apply({"params": params}, positional_embed(xyz, F))
    got = FM.nerf_mlp_pallas(params, xyz, D=D, in_xyz=63, in_dir=0,
                             raw_feat=True, embed_freqs=F,
                             block_points=8, block_points_bwd=8,
                             compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_fused_unc_configuration():
    """The nerf_unc call shape: RAW 2-D x [R, 3] (xysn+t), in-kernel embed,
    and a per-ray 32-wide vid code routed to the DIR branch (code_dir,
    S=1). Regression for the round-3 apply_unc layout bug: this exact
    configuration asserted on TPU while every CPU test passed via the
    flax fallback (reference semantics: nerf.py:502-511 NeRFUnc with
    in_channels_dir=vid_code_dim)."""
    from moda_tpu.core.embedding import positional_embed, window_vec

    D, W, F, cd = 8, 64, 10, 32
    R = 48
    in_xyz, in_dir = 63, cd
    mod = NeRFMLP(D=D, W=W, in_channels_xyz=in_xyz, in_channels_dir=in_dir,
                  out_channels=1, raw_feat=True)
    xyt = jax.random.normal(jax.random.key(41), (R, 3))
    vid = jax.random.normal(jax.random.key(42), (R, cd))
    alpha = jnp.asarray(6.0)

    def full_input(xyt):
        return jnp.concatenate([positional_embed(xyt, F, alpha=alpha), vid], -1)

    params = mod.init(jax.random.key(40), full_input(xyt))["params"]

    def loss_ref(params, xyt, vid):
        xe = positional_embed(xyt, F, alpha=alpha)
        return (mod.apply({"params": params},
                          jnp.concatenate([xe, vid], -1)) ** 2).sum()

    def loss_fused(params, xyt, vid):
        out = FM.nerf_mlp_pallas(
            params, xyt, D=D, in_xyz=in_xyz, in_dir=in_dir, raw_feat=True,
            code_dir=vid, samples_per_ray=1,
            embed_freqs=F, embed_window=window_vec(F, 3, alpha),
            block_points=16, block_points_bwd=16,
            compute_dtype=jnp.float32)
        return (out ** 2).sum()

    np.testing.assert_allclose(float(loss_fused(params, xyt, vid)),
                               float(loss_ref(params, xyt, vid)), rtol=1e-5)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(params, xyt, vid)
    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(params, xyt, vid)
    np.testing.assert_allclose(np.asarray(gf[1]), np.asarray(gr[1]), atol=1e-4)
    np.testing.assert_allclose(np.asarray(gf[2]), np.asarray(gr[2]), atol=1e-4)
    gf_flat = {jax.tree_util.keystr(k): v for k, v in
               jax.tree_util.tree_leaves_with_path(gf[0])}
    for k, vr in jax.tree_util.tree_leaves_with_path(gr[0]):
        np.testing.assert_allclose(
            np.asarray(gf_flat[jax.tree_util.keystr(k)]), np.asarray(vr),
            atol=1e-4, err_msg=jax.tree_util.keystr(k))


def test_fused_multi_net_matches_flax():
    """Two nets fused in one launch (trunk + feat rider, pipeline's
    apply_coarse_feat shape): values and ALL gradients (weights of both
    nets, shared x, dir code) must match two separate flax applies, with
    the in-kernel embed active (the production configuration)."""
    from moda_tpu.core.embedding import positional_embed

    D1, W1, cd = 4, 64, 12
    D2, W2, out2 = 3, 32, 16
    R, S, F = 4, 8, 10
    in_x = 3 * (2 * F + 1)  # 63
    mc = NeRFMLP(D=D1, W=W1, in_channels_xyz=in_x, in_channels_dir=cd,
                 out_channels=3, raw_feat=False, skips=(2,))
    mf = NeRFMLP(D=D2, W=W2, in_channels_xyz=in_x, in_channels_dir=0,
                 out_channels=out2, raw_feat=True, skips=(2,))
    xr = jax.random.normal(jax.random.key(30), (R, S, 3))
    cdc = jax.random.normal(jax.random.key(31), (R, cd))
    xe = positional_embed(xr, F)
    xc = jnp.concatenate([xe, jnp.broadcast_to(cdc[:, None], (R, S, cd))], -1)
    pc = mc.init(jax.random.key(32), xc.reshape(-1, xc.shape[-1]))["params"]
    pf = mf.init(jax.random.key(33), xe.reshape(-1, in_x))["params"]

    def loss_ref(pc, pf, xr, cdc):
        xe = positional_embed(xr, F)
        xc = jnp.concatenate(
            [xe, jnp.broadcast_to(cdc[:, None], (R, S, cd))], -1)
        o1 = mc.apply({"params": pc}, xc)
        o2 = mf.apply({"params": pf}, xe)
        return (o1 ** 2).sum() + (jnp.sin(o2) ** 2).sum()

    def loss_fused(pc, pf, xr, cdc):
        o1, o2 = FM.nerf_mlp_pallas_multi(
            [dict(params=pc, D=D1, in_xyz=in_x, in_dir=cd, skips=(2,),
                  raw_feat=False, use_cd=True),
             dict(params=pf, D=D2, in_xyz=in_x, in_dir=0, skips=(2,),
                  raw_feat=True)],
            xr, code_dir=cdc, samples_per_ray=S, embed_freqs=F,
            block_points=16, block_points_bwd=16,
            compute_dtype=jnp.float32)
        return (o1 ** 2).sum() + (jnp.sin(o2) ** 2).sum()

    np.testing.assert_allclose(float(loss_fused(pc, pf, xr, cdc)),
                               float(loss_ref(pc, pf, xr, cdc)), rtol=1e-5)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(pc, pf, xr, cdc)
    gf = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(pc, pf, xr, cdc)
    for r, f in zip(jax.tree_util.tree_leaves(gr), jax.tree_util.tree_leaves(gf)):
        np.testing.assert_allclose(np.asarray(f), np.asarray(r), atol=3e-4)
