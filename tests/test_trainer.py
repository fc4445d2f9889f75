import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from moda_tpu.config import DataInfo, MoDAConfig
from moda_tpu.data.synthetic import SynthScene
from moda_tpu.train import ckpt as CK
from moda_tpu.train.trainer import Trainer, get_near_far, sample_mesh_points
from moda_tpu.extract.mesh import Mesh


class SynthLoader:
    """Loader over the analytic synthetic scene."""

    def __init__(self, scene: SynthScene, n_pairs: int, seed=0):
        self.scene = scene
        self.n_pairs = n_pairs
        self.rng = np.random.default_rng(seed)
        self._cache = {}

    def __next__(self):
        ids = []
        for _ in range(self.n_pairs):
            a = int(self.rng.integers(0, self.scene.num_frames - 1))
            ids.append((a, a + 1))
        key = tuple(ids)
        if key not in self._cache:
            if len(self._cache) > 8:
                self._cache.clear()
            self._cache[key] = self.scene.make_batch(list(ids))
        return self._cache[key]


def make_trainer(tmp_path, num_epochs=2, img_size=32, num_frames=8, **cfg_kw):
    scene = SynthScene(img_size=img_size, num_frames=num_frames)
    cfg_kw.setdefault("use_cam", True)
    cfg = MoDAConfig(
        num_bones=4, img_size=img_size, nsample=4, ndepth=16, num_epochs=num_epochs,
        feat_ndepth_grid=6, logname="synth", checkpoint_dir=str(tmp_path),
        eikonal_wt=0.0, **cfg_kw)
    f = scene.focal * img_size / 2
    info = DataInfo(offset=(0, num_frames),
                    intrinsics=((f, f, img_size / 2, img_size / 2),))
    loader = SynthLoader(scene, n_pairs=2)
    tr = Trainer(cfg, info, loader=loader, save_dir=str(tmp_path / "synth"))
    # install GT cameras (use_rtk_file route)
    rtk = np.stack([scene.render_frame(i)["rtk"] for i in range(num_frames)])
    rtk4 = np.tile(np.eye(4, dtype=np.float32)[None], (num_frames, 1, 1))
    rtk4[:, :3] = rtk[:, :3]
    rtk4[:, 3] = rtk[:, 3]
    # scale translations into normalized units (obj_scale division,
    # moda.py:1429-1431)
    rtk4[:, :3, 3] /= tr.model.obj_scale
    tr.set_cameras_from_rtk_files(rtk4)
    return scene, tr


def test_near_far_update():
    nf = np.tile(np.asarray([[0.0, 6.0]], np.float32), (3, 1))
    rtk = np.tile(np.eye(4, dtype=np.float32)[None], (3, 1, 1))
    rtk[:, 2, 3] = 5.0  # camera 5 units back
    idk = np.asarray([1.0, 1.0, 0.0])
    pts = np.asarray([[0, 0, -0.5], [0, 0, 0.5]], np.float32)
    out = get_near_far(nf, rtk, idk, pts)
    assert 4.0 < out[0, 0] < 4.6 and 5.4 < out[0, 1] < 6.0
    np.testing.assert_allclose(out[2], [0.0, 6.0])  # invalid frame untouched


def test_sample_mesh_points():
    # unit right triangle in z=0 plane
    mesh = Mesh(vertices=np.asarray([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32),
                faces=np.asarray([[0, 1, 2]], np.int32))
    pts = sample_mesh_points(mesh, 500, np.random.default_rng(0))
    assert pts.shape == (500, 3)
    assert (pts[:, 2] == 0).all()
    assert (pts[:, 0] + pts[:, 1] <= 1.0 + 1e-6).all()
    assert (pts >= -1e-6).all()


def test_ckpt_roundtrip_and_surgery(tmp_path, rng):
    params = {"nerf_coarse": {"a": jnp.ones((3, 4)), "b": {"c": jnp.zeros(2)}},
              "bones": jnp.ones((4, 10)), "ks_param": jnp.ones((1, 4))}
    lv = {"rtk": np.zeros((5, 4, 4)), "idk": np.ones(5)}
    mv = {"near_far": np.ones((5, 2))}
    path = str(tmp_path / "ck")
    CK.save_checkpoint(path, params, lv, mv, meta={"num_fr": 5, "num_bones": 4})
    p2, lv2, mv2, meta = CK.load_checkpoint(path)
    np.testing.assert_allclose(np.asarray(p2["nerf_coarse"]["a"]), 1.0)
    assert meta["num_fr"] == 5

    # surgery: frame-count mismatch drops video-specific keys
    init = {"nerf_coarse": {"a": jnp.zeros((3, 4)), "b": {"c": jnp.ones(2)}},
            "bones": jnp.zeros((4, 10)), "ks_param": jnp.zeros((2, 4))}
    merged = CK.merge_params(init, p2, num_fr_match=False, num_bones_match=True)
    np.testing.assert_allclose(np.asarray(merged["nerf_coarse"]["a"]), 1.0)  # kept
    np.testing.assert_allclose(np.asarray(merged["ks_param"]), 0.0)  # dropped
    np.testing.assert_allclose(np.asarray(merged["bones"]), 1.0)  # kept
    merged2 = CK.merge_params(init, p2, num_fr_match=True, num_bones_match=False)
    np.testing.assert_allclose(np.asarray(merged2["bones"]), 0.0)  # dropped


@pytest.mark.slow
def test_trainer_synthetic_end_to_end(tmp_path):
    """Minimum end-to-end slice: 2 epochs on the analytic scene; losses
    finite, checkpoints written, mesh extraction runs."""
    scene, tr = make_trainer(tmp_path, num_epochs=2)
    tr.train()
    assert os.path.exists(os.path.join(tr.save_dir, "latest.params.npz"))
    # logged losses are finite and present
    import json
    rows = [json.loads(l) for l in open(tr.log_path)]
    losses = [r["total_loss"] for r in rows if "total_loss" in r]
    assert len(losses) >= 2 and np.isfinite(losses).all()
    # at 16 rays/step the per-log losses are too noisy for a strict decrease
    # check; require non-divergence here (convergence is validated by the
    # longer TPU smoke run, see tools/synth_convergence.py)
    img = [r["img_loss"] for r in rows if "img_loss" in r]
    n = len(img) // 2
    assert np.mean(img[n:]) < 2.0 * np.mean(img[:n]) + 1e-3


@pytest.mark.slow
def test_eval_renders_uses_dataset_kaug(tmp_path):
    """eval_renders must take kaug from the render_size eval dataset (real
    crop params, off-center principal point) — not the centered heuristic
    (VERDICT weak #7). The GT column is prepended when obs are available."""
    scene, tr = make_trainer(tmp_path, num_epochs=1, img_size=32, num_frames=4,
                             render_size=8)
    calls = []
    rs = tr.cfg.render_size

    class FakeReader:
        def read_raw(self, sub, flowfw, dframe):
            calls.append(sub)
            return {"kaug": np.asarray([4.0, 4.0, 3.0, 5.0], np.float32),
                    "img": np.full((rs, rs, 3), 0.5, np.float32)}

    class FakeDS:
        reader = FakeReader()

    tr.eval_datasets = [FakeDS()]
    obs = tr._eval_frame_obs(3)
    assert calls == [3] and obs["kaug"][2] == 3.0  # off-center px honored

    path = tr.eval_renders(0, num_frames=2)
    assert os.path.exists(path)
    assert len(calls) > 1  # the render loop consulted the dataset
    import cv2
    grid = cv2.imread(path)
    # each frame tile = [gt | rgb | sil | flow] -> width 4*rs per tile
    assert grid.shape[1] % (4 * rs) == 0


@pytest.mark.slow
def test_preset_rootmlp_writes_base_quats(tmp_path):
    """warmup_rootmlp preset (train_utils.py:662-666): base quats come from
    the installed cameras. Regression: np.asarray of a jax array is a
    read-only view — preset must copy before writing."""
    scene, tr = make_trainer(tmp_path, num_epochs=1, img_size=32, num_frames=4,
                             use_cam=False)
    tr.preset_rootmlp()
    se3 = np.asarray(tr.params["nerf_root_rts"]["base_rt"]["se3"])
    import jax.numpy as jnp
    from moda_tpu.core import quat as Q
    expect = np.asarray(Q.matrix_to_q(jnp.asarray(tr.latest_vars["rtk"][:, :3, :3])))
    np.testing.assert_allclose(se3[:, 3:7], expect, atol=1e-6)
    # use_cam: base is an so3 delta on the prior cams -> preset is a no-op
    scene2, tr2 = make_trainer(tmp_path, num_epochs=1, img_size=32, num_frames=4)
    tr2.preset_rootmlp()


def test_fetch_outputs_packed_roundtrip():
    """_fetch_outputs packs every aux/host_out leaf into one device->host
    transfer and restores shapes/values exactly."""
    import jax.numpy as jnp
    t = Trainer.__new__(Trainer)
    aux = {"a": jnp.asarray(1.5), "b": jnp.asarray(2.0)}
    host = {"rtk": jnp.arange(32, dtype=jnp.float32).reshape(2, 4, 4),
            "fe": jnp.asarray([0.1, 0.2, 0.0])}
    a2, h2 = t._fetch_outputs(aux, host)
    assert float(a2["a"]) == 1.5 and float(a2["b"]) == 2.0
    np.testing.assert_allclose(h2["rtk"], np.arange(32).reshape(2, 4, 4))
    np.testing.assert_allclose(h2["fe"], [0.1, 0.2, 0.0], atol=1e-7)


@pytest.mark.slow
def test_rt_raw_keeps_prior_cameras(tmp_path):
    """Regression: the composed (prior ∘ delta) pose must go to rtk only;
    rt_raw is the raw prior that use_cam feeds back as base_rt — writing
    the composed pose there compounds the delta every epoch."""
    import jax.numpy as jnp
    scene, tr = make_trainer(tmp_path, num_epochs=1, img_size=32, num_frames=4)
    raw0 = tr.latest_vars["rt_raw"].copy()
    fake = np.tile(np.eye(4, dtype=np.float32)[None], (2, 1, 1))
    fake[:, 2, 3] = 9.9
    host_out = {"rtk": jnp.asarray(fake),
                "frame_err": jnp.zeros(4), "frame_cnt": jnp.zeros(4)}
    aux = {"total_loss": jnp.asarray(0.1)}
    tr._process_chunk_outputs([np.asarray([0, 1])], aux, host_out,
                              i0=1, K=1, epoch=0)
    np.testing.assert_array_equal(tr.latest_vars["rt_raw"], raw0)
    np.testing.assert_allclose(tr.latest_vars["rtk"][0, 2, 3], 9.9)


def test_density_collapse_root_freeze(tmp_path):
    """root_stab_density: a collapsing density grid freezes root updates
    for the coming epoch (round-4 drift forensics: the 26.5-deg run's
    error was acquired while frac_occupied was collapsing)."""
    scene, tr = make_trainer(tmp_path)
    # empty mesh after epoch 0 -> freeze
    tr.mesh_rest = Mesh()
    tr.reset_hparams(2)
    assert tr._root_freeze_epoch
    assert tr._extras_scalars(0.5, 0)["root_update"] == 0.0
    # healthy occupancy -> no freeze
    tr.mesh_rest = Mesh(vertices=np.zeros((200, 3), np.float32))
    tr.mesh_rest.frac_occupied = 0.10
    tr.reset_hparams(2)
    assert not tr._root_freeze_epoch
    assert tr._extras_scalars(0.5, 0)["root_update"] == 1.0
    # collapse below half the running max -> freeze again
    tr.mesh_rest.frac_occupied = 0.04
    tr.reset_hparams(2)
    assert tr._root_freeze_epoch
    # disabled flag -> never freezes
    tr.cfg = tr.cfg.replace(root_stab_density=False)
    tr.reset_hparams(2)
    assert not tr._root_freeze_epoch


@pytest.mark.slow
def test_trainer_chunked_dispatch_epoch(tmp_path):
    """The K>1 dispatch path (steps_chunk=2) through train(): per-step
    scalars stacked, loader fallback assembly (SynthLoader has no
    next_chunk), assemble/upload timing split logged."""
    import json
    scene, tr = make_trainer(tmp_path, num_epochs=1, steps_chunk=2)
    tr.train()
    rows = [json.loads(l) for l in open(tr.log_path)]
    losses = [r["total_loss"] for r in rows if "total_loss" in r]
    assert len(losses) >= 2 and np.isfinite(losses).all()
    ep = [r for r in rows if "epoch_time" in r][-1]
    assert "t_assemble" in ep and "t_upload" in ep


def test_warmup_pose_installs_cnn_cameras(tmp_path, monkeypatch):
    """Regression (round-5 cold-start forensics): train() must follow
    warmup_pose with extract_cams_cnn + preset_rootmlp when no cameras
    were installed (the reference's warmup_pose -> extract_cams ->
    warmup_rootmlp chain, train_utils.py:871-921,662-666). The broken
    orchestration trained and saved the pose CNN but never USED it: three
    full-budget rehearsals optimized from identity cameras (rooteval
    62-86 deg) while the CNN itself measured ~20 deg."""
    from types import SimpleNamespace
    scene, tr = make_trainer(tmp_path, num_epochs=1,
                             warmup_pose_ep=1, warmup_rootmlp=True)
    tr.eval_datasets = [SimpleNamespace(reader=object(), num_frames=2)]
    calls = []
    monkeypatch.setattr(
        Trainer, "warmup_pose",
        lambda self, n: (calls.append("warmup"),
                         setattr(self, "pose_cnn", object()))[0])

    def fake_extract(self, ds, save=True):
        calls.append("extract")
        rtk = np.tile(np.eye(4, dtype=np.float32)[None],
                      (self.data_info.num_fr, 1, 1))
        rtk[:, 2, 3] = 3.0
        rtk[:, 3] = np.asarray(self.data_info.intrinsics[0])
        self.set_cameras_from_rtk_files(rtk)
        return rtk, np.ones(len(rtk), bool)

    monkeypatch.setattr(Trainer, "extract_cams_cnn", fake_extract)
    monkeypatch.setattr(Trainer, "preset_rootmlp",
                        lambda self: calls.append("preset"))
    monkeypatch.setattr(Trainer, "train_one_epoch",
                        lambda self, *a, **k: calls.append("epoch"))
    tr.latest_vars["idk"][:] = 0  # no cameras installed (cold-start route)
    tr.train()
    assert calls[:3] == ["warmup", "extract", "preset"]

    # and with cameras already installed (use_rtk_file route), the CNN
    # cameras must NOT overwrite them
    scene2, tr2 = make_trainer(tmp_path / "b", num_epochs=1,
                               warmup_pose_ep=1, warmup_rootmlp=True)
    tr2.eval_datasets = [SimpleNamespace(reader=object(), num_frames=2)]
    calls2 = []
    monkeypatch.setattr(
        Trainer, "warmup_pose",
        lambda self, n: (calls2.append("warmup"),
                         setattr(self, "pose_cnn", object()))[0])
    monkeypatch.setattr(Trainer, "extract_cams_cnn",
                        lambda self, ds, save=True: calls2.append("extract"))
    monkeypatch.setattr(Trainer, "preset_rootmlp",
                        lambda self: calls2.append("preset"))
    monkeypatch.setattr(Trainer, "train_one_epoch",
                        lambda self, *a, **k: calls2.append("epoch"))
    tr2.train()
    assert "extract" not in calls2 and "preset" in calls2
