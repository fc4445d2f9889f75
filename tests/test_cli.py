import os

import numpy as np
import pytest

from moda_tpu.cli.flags import parse_config


def test_flags_reference_spellings():
    cfg = parse_config([
        "--seqname", "cat-pikachiu-sub", "--num_epochs", "120", "--lineload",
        "--batch_size", "256", "--warmup_shape_ep", "5", "--warmup_rootmlp",
        "--nosymm_shape", "--nouse_human", "--eikonal_wt", "0.001",
        "--nsample", "4", "--noppr_eikonal", "--freeze_proj", "--proj_end", "1",
    ])
    assert cfg.seqname == "cat-pikachiu-sub"
    assert cfg.num_epochs == 120 and cfg.lineload and cfg.batch_size == 256
    assert cfg.warmup_shape_ep == 5 and cfg.warmup_rootmlp
    assert not cfg.symm_shape and not cfg.use_human
    assert cfg.eikonal_wt == 0.001 and not cfg.ppr_eikonal
    assert cfg.freeze_proj and cfg.proj_end == 1.0


def test_flagfile_roundtrip(tmp_path):
    from moda_tpu.config import MoDAConfig
    cfg = MoDAConfig(num_epochs=42, logname="abc")
    p = tmp_path / "opts.json"
    p.write_text(cfg.to_json())
    cfg2 = parse_config(["--flagfile", str(p), "--num_epochs", "7"])
    assert cfg2.logname == "abc"
    assert cfg2.num_epochs == 7  # CLI overrides flagfile


@pytest.mark.slow
def test_extract_app_end_to_end(tmp_path, monkeypatch):
    """Init a model on a fake dataset, save, extract meshes+cams via CLI."""
    import cv2
    from moda_tpu.preproc import pipeline as PP

    seq = "cliseq"
    img_dir = tmp_path / "JPEGImages" / "Full-Resolution" / seq
    ann_dir = tmp_path / "Annotations" / "Full-Resolution" / seq
    os.makedirs(img_dir)
    os.makedirs(ann_dir)
    rng = np.random.default_rng(0)
    for i in range(3):
        img = (rng.uniform(size=(48, 48, 3)) * 255).astype(np.uint8)
        cv2.imwrite(str(img_dir / ("%05d.jpg" % i)), img)
        m = np.zeros((48, 48), np.uint8)
        m[10:40, 10:40] = 128
        cv2.imwrite(str(ann_dir / ("%05d.png" % i)), m)
    PP.write_config(str(tmp_path / "configs"), seq, str(img_dir), (48, 48))

    # build + save an untrained checkpoint
    from moda_tpu.config import DataInfo, MoDAConfig
    from moda_tpu.train.trainer import Trainer
    cfg = MoDAConfig(num_bones=3, img_size=32, ndepth=8, render_size=8,
                     sample_grid3d=24, seqname=seq, logname="cli",
                     checkpoint_dir=str(tmp_path / "logdir"),
                     config_dir=str(tmp_path / "configs"), chunk=256,
                     test_frames="2", feat_ndepth_grid=4)
    info = DataInfo(offset=(0, 3), intrinsics=((48.0, 48.0, 24.0, 24.0),))
    tr = Trainer(cfg, info, loader=None)
    tr.latest_vars["rtk"][:] = np.eye(4)
    tr.latest_vars["rtk"][:, 2, 3] = 0.3
    tr.latest_vars["rtk"][:, 3] = [48, 48, 24, 24]
    tr.latest_vars["idk"][:] = 1
    tr.save("latest")

    from moda_tpu.cli import extract_app
    extract_app.main([
        "--seqname", seq, "--logname", "cli",
        "--checkpoint_dir", str(tmp_path / "logdir"),
        "--config_dir", str(tmp_path / "configs"),
        "--model_path", str(tmp_path / "logdir" / "cli" / "latest"),
        "--num_bones", "3", "--img_size", "32", "--ndepth", "8",
        "--render_size", "8", "--sample_grid3d", "24", "--chunk", "256",
        "--test_frames", "2", "--feat_ndepth_grid", "4",
    ])
    out = tmp_path / "logdir" / "cli-export"
    files = os.listdir(out)
    assert any(f.endswith("mesh-rest.obj") for f in files)
    assert any("cam-" in f for f in files)
    # NVS inputs exported alongside (render_vis.py:531-535 layout)
    assert any("ctrajs-" in f for f in files)
    assert any("refsil-" in f for f in files)

    # ctraj-file-driven NVS with sil compositing (scripts/visualize/nvs.py)
    from moda_tpu.cli import nvs_app
    outpath = str(tmp_path / "nvs" / "t")
    nvs_app.main([
        "--seqname", seq, "--logname", "cli",
        "--checkpoint_dir", str(tmp_path / "logdir"),
        "--config_dir", str(tmp_path / "configs"),
        "--model_path", str(tmp_path / "logdir" / "cli" / "latest"),
        "--num_bones", "3", "--img_size", "32", "--ndepth", "8",
        "--render_size", "8", "--sample_grid3d", "24", "--chunk", "256",
        "--feat_ndepth_grid", "4",
        "--rootdir", str(out / f"{seq}-ctrajs-"),
        "--nvs_outpath", outpath, "--scale", "0.5", "--maxframe", "2",
    ])
    assert os.path.exists(outpath + "-rgb.gif")
    assert os.path.exists(outpath + "-rgb_00000.png")
    import cv2 as _cv2
    rgb = _cv2.imread(outpath + "-rgb_00000.png")
    assert rgb is not None and rgb.shape[0] == 24  # max(48,48)*0.5
