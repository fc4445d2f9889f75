"""Line-level silhouette loss filter (train/step.py::sil_loss_filter_line)
vs the reference's loss_filter_line (nnutils/loss_utils.py:432-445).

The reference function is pure numpy+torch; it is extracted from the source
file by text (importing nnutils.loss_utils needs trimesh/pytorch3d, which
are not in this image) and exec'd as the oracle.
"""
import os

import numpy as np
import pytest

import jax.numpy as jnp

from moda_tpu.train.step import masked_median, sil_loss_filter_line

REF = "/root/reference/nnutils/loss_utils.py"
pytestmark = pytest.mark.skipif(not os.path.exists(REF),
                                reason="reference not available")

torch = pytest.importorskip("torch")


def load_ref_filter():
    src = open(REF).read()
    start = src.index("def loss_filter_line")
    end = src.index("\ndef ", start)
    ns = {"np": np}
    exec(src[start:end], ns)  # noqa: S102 - test oracle extraction
    return ns["loss_filter_line"]


def test_masked_median_matches_numpy():
    rng = np.random.default_rng(0)
    for n in (1, 2, 5, 8):
        x = rng.uniform(0.1, 2.0, size=11).astype(np.float32)
        mask = np.zeros(11, bool)
        mask[rng.choice(11, size=n, replace=False)] = True
        got = float(masked_median(jnp.asarray(x), jnp.asarray(mask)))
        np.testing.assert_allclose(got, np.median(x[mask]), rtol=1e-6)


def _run_both(vals, errid, frameid, num_fr, img_size):
    ref_filter = load_ref_filter()
    sil_err = np.zeros(num_fr * img_size, np.float32)
    invalid_ref = ref_filter(sil_err, np.asarray(errid), np.asarray(frameid),
                             torch.tensor(np.asarray(vals, np.float32)), img_size)
    keep, frame_err, frame_cnt = sil_loss_filter_line(
        jnp.asarray(vals, jnp.float32)[:, None], jnp.asarray(errid),
        jnp.asarray(frameid), num_fr, img_size,
        progress=jnp.asarray(1.0), warmup_steps=0.0)
    return np.asarray(invalid_ref, bool), 1.0 - np.asarray(keep)[:, 0], frame_err


def test_line_filter_matches_reference_one_sample_per_line():
    """One sample per line -> the per-line representative is identical to the
    reference's scatter, so rejection must match exactly."""
    rng = np.random.default_rng(1)
    num_fr, img_size = 6, 8
    # sample 4 distinct lines from each of the 6 frames
    frameid = np.repeat(np.arange(num_fr), 4).astype(np.int32)
    rows = np.concatenate([rng.choice(img_size, 4, replace=False)
                           for _ in range(num_fr)]).astype(np.int32)
    errid = frameid * img_size + rows
    vals = rng.uniform(0.01, 0.05, size=len(errid)).astype(np.float32)
    vals[frameid == 3] = 5.0  # one catastrophically bad segmentation

    invalid_ref, invalid_ours, frame_err = _run_both(
        vals, errid, frameid, num_fr, img_size)
    np.testing.assert_array_equal(invalid_ref, invalid_ours)
    assert invalid_ours[frameid == 3].all()
    assert not invalid_ours[frameid != 3].any()


def test_line_filter_matches_reference_no_outliers():
    rng = np.random.default_rng(2)
    num_fr, img_size = 5, 8
    frameid = np.repeat(np.arange(num_fr), 3).astype(np.int32)
    rows = np.tile(np.arange(3), num_fr).astype(np.int32)
    errid = frameid * img_size + rows
    vals = rng.uniform(0.01, 0.05, size=len(errid)).astype(np.float32)
    invalid_ref, invalid_ours, _ = _run_both(vals, errid, frameid, num_fr, img_size)
    np.testing.assert_array_equal(invalid_ref, invalid_ours)
    assert not invalid_ours.any()


def test_line_filter_multi_sample_per_line():
    """Several samples on the same line (constant within the line, so the
    mean and the reference's last-write scatter agree)."""
    num_fr, img_size = 4, 8
    frameid = np.repeat(np.arange(num_fr), 6).astype(np.int32)
    rows = np.tile(np.repeat(np.arange(2), 3), num_fr).astype(np.int32)
    errid = frameid * img_size + rows
    vals = np.full(len(errid), 0.02, np.float32)
    vals[frameid == 0] = 1.0
    invalid_ref, invalid_ours, _ = _run_both(vals, errid, frameid, num_fr, img_size)
    np.testing.assert_array_equal(invalid_ref, invalid_ours)
    assert invalid_ours[frameid == 0].all()


def test_line_filter_inactive_before_warmup():
    num_fr, img_size = 3, 8
    frameid = np.repeat(np.arange(num_fr), 2).astype(np.int32)
    errid = frameid * img_size + np.tile(np.arange(2), num_fr)
    vals = np.asarray([9.0, 9.0, 0.01, 0.01, 0.01, 0.01], np.float32)
    keep, _, _ = sil_loss_filter_line(
        jnp.asarray(vals)[:, None], jnp.asarray(errid), jnp.asarray(frameid),
        num_fr, img_size, progress=jnp.asarray(0.1), warmup_steps=0.4)
    assert np.asarray(keep).all()  # gate not yet active
