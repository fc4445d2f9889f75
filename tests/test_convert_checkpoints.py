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
