import numpy as np
import pytest

from moda_tpu.viz.render_vis import unit_sphere, render_turntable, bones_to_mesh
from moda_tpu.extract.mesh import Mesh


def make_prior():
    sv, sf = unit_sphere(2)
    # 16-d embedding from vertex position (unique per direction)
    freqs = np.arange(1, 4)[:, None]
    enc = np.concatenate([np.sin(freqs * np.pi * sv[:, None, :]),
                          np.cos(freqs * np.pi * sv[:, None, :])], 1).reshape(len(sv), 18)[:, :16]
    enc = enc / np.linalg.norm(enc, axis=-1, keepdims=True)
    return sv.astype(np.float32), sf, enc.astype(np.float32)


def test_render_pose_batch_shapes():
    from moda_tpu.train.warmup_pose import render_pose_batch
    sv, sf, emb = make_prior()
    rng = np.random.default_rng(0)
    feats, rtk = render_pose_batch(sv, sf, emb, d_mean=3.0, bs=2, rng=rng,
                                   img_size=64)
    assert feats.shape == (2, 112, 112, 16)
    assert rtk.shape == (2, 4, 4)
    # features normalized where nonzero
    n = np.linalg.norm(feats[0], axis=-1)
    nz = n > 0.5
    assert nz.mean() > 0.05
    np.testing.assert_allclose(n[nz], 1.0, atol=1e-4)


@pytest.mark.slow
def test_pose_warmup_learns_rotation():
    from moda_tpu.train.warmup_pose import PoseWarmup
    sv, sf, emb = make_prior()
    w = PoseWarmup(sv, sf, emb, d_mean=3.0, lr=3e-4, seed=0)
    losses = w.train(steps=30, bs=8)
    # rotation loss (radians) should drop from ~pi/2-ish random level
    assert np.mean(losses[-5:]) < np.mean(losses[:5])


def test_ood_check_and_substitution():
    from moda_tpu.train.warmup_pose import (nearest_valid_substitution,
                                            ood_check_features)
    rng = np.random.default_rng(0)
    h, w = 16, 16
    # one vertex per 4x4 pixel block (spatially coherent surface map)
    ys, xs = np.meshgrid(range(h), range(w), indexing="ij")
    block = (ys // 4) * 4 + xs // 4 + 1
    N = block.max() + 1
    dp_embed = rng.normal(size=(N, 16)).astype(np.float32)
    dp_embed /= np.linalg.norm(dp_embed, axis=-1, keepdims=True)
    dp_idx = np.stack([block, block])
    # frame 0: consistent (each pixel's feature = its assigned vertex embed)
    feats0 = dp_embed[dp_idx[0]].transpose(2, 0, 1)
    # frame 1: random garbage
    feats1 = rng.normal(size=(16, h, w)).astype(np.float32)
    valid, err = ood_check_features(np.stack([feats0, feats1]), dp_embed, dp_idx,
                                    err_threshold=6.0)
    assert bool(valid[0]) and err[0] < err[1]

    rtks = np.tile(np.eye(4, dtype=np.float32)[None], (3, 1, 1))
    rtks[1, :3, :3] = 2.0  # junk rotation, invalid
    out = nearest_valid_substitution(rtks, np.asarray([True, False, True]))
    np.testing.assert_allclose(out[1, :3, :3], np.eye(3))


def test_bones_to_mesh_and_turntable():
    bones = np.zeros((2, 10), np.float32)
    bones[:, 3] = 1
    bones[1, 0] = 0.3
    mesh = bones_to_mesh(bones)
    frames = render_turntable(mesh, num_views=2, size=48)
    assert len(frames) == 2 and frames[0].shape == (48, 48, 3)
    assert (frames[0] < 0.99).any()


@pytest.mark.slow
def test_cse_distillation_learns():
    """CSENet distills toward target features on a fixed batch."""
    import jax.numpy as jnp
    from moda_tpu.train.cse_distill import CSEDistiller

    rng = np.random.default_rng(0)
    S = 32
    imgs = rng.uniform(size=(2, S, S, 3)).astype(np.float32)
    feats = rng.normal(size=(2, S // 2, S // 2, 16)).astype(np.float32)
    feats /= np.linalg.norm(feats, axis=-1, keepdims=True)
    masks = np.ones((2, S // 2, S // 2, 1), np.float32)

    d = CSEDistiller(lr=3e-3, input_size=S)
    losses = d.train(iter(lambda: (imgs, feats, masks), None), steps=25)
    assert losses[-1] < losses[0]
    out = d.predict(imgs)
    assert out.shape == (2, S // 2, S // 2, 16)
    np.testing.assert_allclose(np.linalg.norm(out, axis=-1), 1.0, atol=1e-4)
