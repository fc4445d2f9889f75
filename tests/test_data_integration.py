"""End-to-end data-path integration: on-disk DAVIS layout -> datasets ->
loader -> one training step. Exercises the same file formats the
reference's dataloader consumes (vidbase.py:68-174)."""
import os

import numpy as np
import cv2
import pytest

from moda_tpu.preproc import pipeline as PP


@pytest.fixture(scope="module")
def davis_db(tmp_path_factory):
    root = tmp_path_factory.mktemp("db")
    seq = "toyseq"
    img_dir = root / "JPEGImages" / "Full-Resolution" / seq
    ann_dir = root / "Annotations" / "Full-Resolution" / seq
    os.makedirs(img_dir)
    os.makedirs(ann_dir)
    rng = np.random.default_rng(0)
    n, H, W = 6, 64, 80
    for i in range(n):
        img = (rng.uniform(size=(H, W, 3)) * 255).astype(np.uint8)
        # a moving bright square as the "object"
        x0 = 10 + 6 * i
        img[20:44, x0:x0 + 24] = [250, 120, 30]
        cv2.imwrite(str(img_dir / ("%05d.jpg" % i)), img)
        mask = np.zeros((H, W), np.uint8)
        mask[20:44, x0:x0 + 24] = 128
        cv2.imwrite(str(ann_dir / ("%05d.png" % i)), mask)
    PP.compute_flows(str(img_dir), str(root), seq, dframes=(1, 2))
    cfg_dir = root / "configs"
    PP.write_config(str(cfg_dir), seq, str(img_dir), (H, W))
    return root, seq


def test_build_datasets_and_pairs(davis_db):
    root, seq = davis_db
    from moda_tpu.data.dataset import build_datasets, collate_pairs, data_offsets

    ds = build_datasets(seq, img_size=32, config_dir=str(root / "configs"))
    assert len(ds) == 1 and ds[0].num_frames == 6
    pair = ds[0].sample_pair(np.random.default_rng(1), idx=2)
    p0 = pair["frames"][0]
    assert p0["imgs"].shape == (3, 32 * 32)
    assert p0["masks"].max() == 1.0
    assert np.isfinite(p0["flow"]).all()
    batch = collate_pairs([pair, ds[0].sample_pair(np.random.default_rng(2), idx=0)],
                          data_offsets(ds))
    assert batch["imgs"].shape == (4, 3, 1024)
    assert batch["frameid"].shape == (4,)


def test_loader_and_train_step(davis_db):
    root, seq = davis_db
    import jax
    import jax.numpy as jnp

    from moda_tpu.config import DataInfo, MoDAConfig
    from moda_tpu.data.dataset import PairLoader, build_datasets, data_offsets
    from moda_tpu.fields.model import MoDAModel
    from moda_tpu.train.optim import MoDAOptimizer
    from moda_tpu.train.step import StepExtras, make_train_step

    ds = build_datasets(seq, img_size=32, config_dir=str(root / "configs"))
    loader = PairLoader(ds, batch_size=2, num_threads=1)
    batch = next(loader)
    loader.close()

    cfg = MoDAConfig(num_bones=3, img_size=32, nsample=4, ndepth=8,
                     feat_ndepth_grid=4, use_embed=False)
    info = DataInfo(offset=data_offsets(ds), intrinsics=((80.0, 80.0, 40.0, 32.0),))
    model = MoDAModel(cfg, info)
    params, mvars = model.init(jax.random.key(0))
    opt = MoDAOptimizer(cfg, total_steps=10)
    step = make_train_step(model, opt, nsample=cfg.nsample, ndepth=cfg.ndepth,
                           use_fine=False, use_dskin=False, use_bones=True,
                           donate=False)
    extras = StepExtras(
        progress=jnp.asarray(0.1), loss_select=jnp.asarray(1),
        root_update=jnp.asarray(1.0), body_update=jnp.asarray(1.0),
        shape_update=jnp.asarray(0.0), cvf_update=jnp.asarray(0.0),
        sil_err_median=jnp.asarray(1e9), shape_samp=jnp.zeros((16, 3)),
        shape_samp_valid=jnp.asarray(0.0), embed_alpha=jnp.asarray(10.0))
    batch_dev = {k: jnp.asarray(v) for k, v in batch.items()}
    p2, s2, aux, host_out = step(params, opt.init(params), mvars, batch_dev,
                                 extras, jax.random.key(0))
    assert np.isfinite(float(aux["total_loss"]))
    assert host_out["rtk"].shape == (4, 4, 4)


def test_line_shard_roundtrip(davis_db):
    """write_lines shards -> LineShardDataset reads them back."""
    root, seq = davis_db
    from moda_tpu.data.dataset import (LineShardDataset, build_datasets,
                                       collate_pairs, data_offsets)

    ds = build_datasets(seq, img_size=16, config_dir=str(root / "configs"))
    PP.write_lines(str(root), seq, 16, ds)
    pixels_dir = str(root / "Pixels" / "Full-Resolution" / seq)
    # our writer emits per-frame dirs named 1_%05d with rows + rtk.npy
    assert os.path.isdir(os.path.join(pixels_dir, "1_00000"))

    imglist = ds[0].reader.paths.imglist
    lds = LineShardDataset(pixels_dir, imglist, img_size=16)
    pair = lds.sample_pair(np.random.default_rng(3), idx=0, idy=5)
    p0 = pair["frames"][0]
    assert p0["imgs"].shape == (3, 16)
    assert p0["dp_feats"].shape == (16, 16)
    assert pair["lineid"][0] == 5
    batch = collate_pairs([pair], data_offsets(ds))
    assert batch["imgs"].shape == (2, 3, 16)
    assert "lineid" in batch


def test_pairloader_process_sharding(davis_db):
    """Per-process data sharding (the DistributedSampler equivalent,
    frameloader.py:40-45): distinct process_index -> disjoint RNG streams
    (different batches), same index -> identical batches."""
    root, seq = davis_db
    from moda_tpu.data.dataset import PairLoader, build_datasets

    ds = build_datasets(seq, img_size=32, config_dir=str(root / "configs"))

    def first_batch(pi):
        ld = PairLoader(ds, batch_size=2, seed=7, process_index=pi,
                        num_threads=1, num_prefetch=1)
        b = next(ld)
        ld.close()
        return b

    b0, b0b, b1 = first_batch(0), first_batch(0), first_batch(1)
    np.testing.assert_array_equal(b0["frameid"], b0b["frameid"])
    np.testing.assert_array_equal(b0["imgs"], b0b["imgs"])
    assert (not np.array_equal(b0["frameid"], b1["frameid"])
            or not np.array_equal(b0["imgs"], b1["imgs"]))


def test_maybe_init_distributed_noop(monkeypatch):
    """Single-host: no env vars -> no initialize call."""
    from moda_tpu.cli.train_app import maybe_init_distributed
    for v in ("JAX_NUM_PROCESSES", "NPROCS", "JAX_COORDINATOR_ADDRESS",
              "COORDINATOR_ADDRESS"):
        monkeypatch.delenv(v, raising=False)
    # single-host axon image sets TPU_WORKER_HOSTNAMES=localhost; must not init
    monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "localhost")
    import jax
    called = []
    monkeypatch.setattr(jax.distributed, "initialize",
                        lambda *a, **k: called.append((a, k)))
    maybe_init_distributed()
    assert called == []


def test_maybe_init_distributed_env(monkeypatch):
    from moda_tpu.cli.train_app import maybe_init_distributed
    monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "10.0.0.1:1234")
    monkeypatch.setenv("JAX_NUM_PROCESSES", "4")
    monkeypatch.setenv("JAX_PROCESS_ID", "2")
    import jax
    called = []
    monkeypatch.setattr(jax.distributed, "initialize",
                        lambda **k: called.append(k))
    maybe_init_distributed()
    assert called == [{"coordinator_address": "10.0.0.1:1234",
                       "num_processes": 4, "process_id": 2}]


def test_sparsify_batch_ignores_non_pixel_arrays():
    """Regression: rtk [2B,4,4] is ndim-3 but NOT per-pixel — sparsify must
    only subsample the pixel-axis observation arrays (a silent worker death
    from indexing rtk hung training at step 0)."""
    from moda_tpu.data.dataset import sparsify_batch
    b = {"imgs": np.zeros((4, 3, 512)), "masks": np.zeros((4, 1, 512)),
         "rtk": np.zeros((4, 4, 4)), "kaug": np.zeros((4, 4)),
         "frameid": np.zeros(4, np.int32)}
    sp = sparsify_batch(b, 20, np.random.default_rng(0))
    assert sp["rtk"].shape == (4, 4, 4)
    assert sp["imgs"].shape == (4, 3, 20)
    assert sp["pix_ids"].shape == (4, 20)


@pytest.mark.filterwarnings(
    "ignore::pytest.PytestUnhandledThreadExceptionWarning")
def test_pairloader_raises_when_workers_die():
    from moda_tpu.data.dataset import PairLoader
    ld = PairLoader([], 2, num_threads=1)  # no datasets -> workers crash
    try:
        next(ld)
        raise AssertionError("expected RuntimeError")
    except RuntimeError:
        pass
    finally:
        ld.close()


def test_pairloader_next_chunk(davis_db):
    """Chunk-level prefetch: next_chunk(k) returns a pre-stacked K-step
    dispatch chunk with the same fields/shapes the trainer's K>1 path
    builds inline, plus per-step frameid arrays for host bookkeeping."""
    root, seq = davis_db
    from moda_tpu.data.dataset import PairLoader, build_datasets

    ds = build_datasets(seq, img_size=32, config_dir=str(root / "configs"))
    ld = PairLoader(ds, batch_size=2, seed=3, num_threads=1, num_prefetch=2)
    single = next(ld)
    stacked, fids = ld.next_chunk(3)
    assert set(stacked) == set(single)
    for k, v in stacked.items():
        assert v.shape == (3,) + single[k].shape, k
    assert len(fids) == 3
    for j, f in enumerate(fids):
        np.testing.assert_array_equal(f, stacked["frameid"][j])
    # a second chunk keeps flowing (assembler thread stays alive)
    stacked2, _ = ld.next_chunk(3)
    assert stacked2["imgs"].shape == stacked["imgs"].shape
    ld.close()
