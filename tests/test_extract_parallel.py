"""Frame-parallel extraction (VERDICT r4 #9): the sharded multi-frame
warp / grid query must match the single-frame path exactly, and the
compiled programs must actually split the frame/point axis across the
8-device CPU mesh (per-device shard shapes F/n), the program-level
scaling evidence this host can produce without n real chips.
Reference analogue: scripts/render_mgpu.sh (one GPU pinned per process).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from moda_tpu.config import DataInfo, MoDAConfig
from moda_tpu.extract.mesh import (extract_mesh, make_grid_query,
                                   make_warp_fw, make_warp_fw_frames)
from moda_tpu.fields.model import MoDAModel
from moda_tpu.parallel.mesh import make_mesh


def small_model():
    cfg = MoDAConfig(num_bones=3, img_size=16, nsample=2, ndepth=4,
                     feat_ndepth_grid=4)
    info = DataInfo(offset=(0, 16), intrinsics=((20.0, 20.0, 8.0, 8.0),))
    model = MoDAModel(cfg, info)
    params, mvars = model.init(jax.random.key(0))
    return model, params, mvars


@pytest.mark.slow
def test_warp_fw_frames_matches_per_frame():
    model, params, _ = small_model()
    verts = jnp.asarray(np.random.default_rng(1).normal(size=(40, 3)) * 0.1,
                        jnp.float32)
    mesh = make_mesh(len(jax.devices()))
    warp1 = make_warp_fw(model)
    warpF = make_warp_fw_frames(model, mesh=mesh)
    fids = np.asarray([0, 3, 5, 7, 8, 9, 11, 14], np.int32)
    vF, bF = warpF(params, verts, jnp.asarray(fids))
    assert vF.shape == (len(fids),) + verts.shape
    for j, fi in enumerate(fids):
        v1, b1 = warp1(params, verts, jnp.asarray(fi))
        np.testing.assert_allclose(np.asarray(vF[j]), np.asarray(v1),
                                   atol=1e-5, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(bF[j]), np.asarray(b1),
                                   atol=1e-5, rtol=1e-5)


@pytest.mark.slow
def test_warp_fw_frames_axis_is_sharded():
    """The frame axis of the result must live sharded across devices (the
    partitioner split the work, it did not replicate it)."""
    if len(jax.devices()) < 2:
        pytest.skip("needs multiple devices")
    model, params, _ = small_model()
    mesh = make_mesh(len(jax.devices()))
    warpF = make_warp_fw_frames(model, mesh=mesh)
    verts = jnp.zeros((32, 3), jnp.float32)
    fids = jnp.arange(8, dtype=jnp.int32)
    vF, _ = warpF(params, verts, fids)
    shard_shapes = {s.data.shape for s in vF.addressable_shards}
    assert shard_shapes == {(8 // len(jax.devices()), 32, 3)}, shard_shapes


@pytest.mark.slow
def test_extract_mesh_sharded_grid_matches_single():
    model, params, _ = small_model()
    bound = np.asarray([0.3, 0.3, 0.3], np.float32)
    mesh = make_mesh(len(jax.devices()))
    q = make_grid_query(model)
    m_single = extract_mesh(model, params, bound, 32, 0.0, query=q)
    m_shard = extract_mesh(model, params, bound, 32, 0.0, query=q, mesh=mesh)
    assert m_shard.frac_occupied == m_single.frac_occupied
    np.testing.assert_allclose(m_shard.vertices, m_single.vertices, atol=1e-6)
