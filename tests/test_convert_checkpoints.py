"""tools/convert_all_checkpoints.py: npz round-trip + real-weight gate.

The converters themselves are oracle-tested (test_pointrend_infer /
test_cse_infer / test_vcn_flow); here we pin the tool's npz pytree
round-trip and the acceptance harness, and gate the real released
checkpoints (reference: preprocess/mask.py:50-126, utils/cselib.py:35-149,
third_party/vcnplus/auto_gen.py) behind MODA_WEIGHTS_DIR — the test
skips cleanly when the weights are not on disk (zero-egress CI).
"""
import os

import numpy as np
import pytest

from tools.convert_all_checkpoints import (load_pytree_npz, main,
                                           save_pytree_npz)


def test_pytree_npz_round_trip(tmp_path):
    tree = {"a": {"b": np.arange(6, dtype=np.float32).reshape(2, 3),
                  "c": np.float32(2.5)},
            "d": np.ones((4,), np.int32)}
    p = str(tmp_path / "t.npz")
    save_pytree_npz(p, tree)
    back = load_pytree_npz(p)
    np.testing.assert_array_equal(back["a"]["b"], tree["a"]["b"])
    np.testing.assert_array_equal(back["d"], tree["d"])
    assert float(back["a"]["c"]) == 2.5


def test_cse_convert_save_load_matches_direct(tmp_path):
    # randomized torch-layout CSE head state dict -> convert -> npz ->
    # reload must equal the direct conversion bit-for-bit
    rng = np.random.default_rng(0)
    sd = {}
    for i in range(1, 9):
        sd[f"roi_heads.densepose_head.body_conv_fcn{i}.weight"] = \
            rng.normal(size=(8, 8 if i > 1 else 4, 3, 3)).astype(np.float32)
        sd[f"roi_heads.densepose_head.body_conv_fcn{i}.bias"] = \
            rng.normal(size=(8,)).astype(np.float32)
    sd["roi_heads.densepose_predictor.embed_lowres.weight"] = \
        rng.normal(size=(8, 16, 4, 4)).astype(np.float32)
    sd["roi_heads.densepose_predictor.embed_lowres.bias"] = \
        rng.normal(size=(16,)).astype(np.float32)

    from moda_tpu.preproc.cse_infer import convert_cse_head
    direct = convert_cse_head(sd)
    p = str(tmp_path / "head.npz")
    save_pytree_npz(p, direct)
    back = load_pytree_npz(p)
    flat_d = {}
    flat_b = {}
    import jax
    for k, v in jax.tree_util.tree_leaves_with_path(direct):
        flat_d[jax.tree_util.keystr(k)] = np.asarray(v)
    for k, v in jax.tree_util.tree_leaves_with_path(back):
        flat_b[jax.tree_util.keystr(k)] = np.asarray(v)
    assert flat_d.keys() == flat_b.keys()
    for k in flat_d:
        np.testing.assert_array_equal(flat_d[k], flat_b[k])


def test_main_reports_missing_weights(tmp_path):
    assert main(["--weights_dir", str(tmp_path),
                 "--out_dir", str(tmp_path / "out")]) == 2


@pytest.mark.slow
def test_real_weight_acceptance():
    wdir = os.environ.get("MODA_WEIGHTS_DIR", "")
    if not wdir or not os.path.isdir(wdir):
        pytest.skip("released checkpoints not available "
                    "(set MODA_WEIGHTS_DIR to run)")
    gdir = os.path.join(wdir, "golden")
    rc = main(["--weights_dir", wdir, "--out_dir",
               os.path.join(wdir, "converted")]
              + (["--golden_dir", gdir] if os.path.isdir(gdir) else []))
    assert rc == 0


def _tree_equal(a, b):
    import jax

    fa = {jax.tree_util.keystr(k): np.asarray(v)
          for k, v in jax.tree_util.tree_leaves_with_path(a)}
    fb = {jax.tree_util.keystr(k): np.asarray(v)
          for k, v in jax.tree_util.tree_leaves_with_path(b)}
    assert fa.keys() == fb.keys()
    for k in fa:
        np.testing.assert_array_equal(fa[k], fb[k], err_msg=k)


def test_converter_proxy_detectron2_files(tmp_path):
    """Zero-egress proxy for the real-weight run (the released d2/VCN
    checkpoints cannot be downloaded in this environment — BASELINE.md
    'real-weight availability'): write locally-constructed checkpoints in
    the RELEASED FILE FORMATS (d2 .pkl = pickle of numpy under 'model'),
    run the tool end-to-end, and require the converted npz trees to equal
    the direct in-memory conversion and the predictors to construct."""
    import pickle

    import test_cse_infer as TC
    import test_pointrend_infer as TP
    from moda_tpu.preproc.checkpoints import (load_cse_predictor,
                                              load_pointrend_predictor)
    from moda_tpu.preproc.cse_infer import convert_cse_checkpoint
    from moda_tpu.preproc.pointrend_infer import convert_pointrend_checkpoint

    wdir = tmp_path / "weights"
    odir = tmp_path / "out"
    wdir.mkdir()

    pr_sd = TP.make_backbone_sd()
    pr_sd.update(TP.make_heads_sd())
    with open(wdir / "pointrend_r50.pkl", "wb") as f:
        pickle.dump({"model": pr_sd, "__author__": "proxy"}, f)

    cse_sd = TC.make_backbone_sd()
    cse_sd.update(TC.make_head_sd(n_convs=8, cin=256, hidden=64, E=16))
    cse_sd["roi_heads.embedder.embeddings.sheep_5004.weight"] = \
        np.random.RandomState(7).randn(100, 16).astype(np.float32)
    with open(wdir / "cse_r50.pkl", "wb") as f:
        pickle.dump({"model": cse_sd}, f)

    assert main(["--weights_dir", str(wdir), "--out_dir", str(odir)]) == 0
    import json

    manifest = json.load(open(odir / "manifest.json"))
    assert set(manifest) == {"pointrend", "cse"}

    _tree_equal(load_pytree_npz(manifest["pointrend"]),
                convert_pointrend_checkpoint(pr_sd))
    direct = convert_cse_checkpoint(cse_sd)
    back = load_pytree_npz(manifest["cse"])
    _tree_equal(back["backbone"], direct.bp)
    _tree_equal(back["head"], direct.hp)
    np.testing.assert_array_equal(back["vertex_embeddings"],
                                  direct.vertex_embeddings)
    # predictors must construct from the converted files
    load_pointrend_predictor(manifest["pointrend"])
    p = load_cse_predictor(manifest["cse"])
    assert p.vertex_embeddings.shape == (100, 16)


@pytest.mark.slow
def test_converter_proxy_vcn_pth(tmp_path):
    """vcn_rob.pth format (torch zip pickle with 'state_dict' + 'mean_L')
    through the tool: converted tree == in-memory conversion, and the
    flow predictor constructs from the npz."""
    import torch

    import test_vcn_flow as TV
    from moda_tpu.preproc.checkpoints import load_vcn_predictor
    from moda_tpu.preproc.vcn_flow import convert_vcn_checkpoint

    model, sd_np = TV.ref_model_and_sd.__wrapped__() \
        if hasattr(TV.ref_model_and_sd, "__wrapped__") else TV.ref_model_and_sd()
    wdir = tmp_path / "weights"
    odir = tmp_path / "out"
    wdir.mkdir()
    torch.save({"state_dict": model.state_dict(),
                "mean_L": [[0.30, 0.32, 0.34]], "mean_R": [[0.30, 0.32, 0.34]]},
               wdir / "vcn_rob.pth")

    assert main(["--weights_dir", str(wdir), "--out_dir", str(odir)]) == 0
    tree = load_pytree_npz(odir / "vcn_rob.npz")
    _tree_equal(tree["params"], convert_vcn_checkpoint(sd_np))
    np.testing.assert_allclose(np.asarray(tree["mean"]),
                               [0.30, 0.32, 0.34], atol=1e-6)
    pred = load_vcn_predictor(str(odir / "vcn_rob.npz"))
    assert callable(pred.as_flow_fn())
