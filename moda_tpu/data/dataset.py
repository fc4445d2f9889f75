"""Datasets + batcher: frame-pair sampling with fixed-shape device batches.

Host-side redesign of utils/io.py:277-518 (config_to_dataloader /
VidDataset / LineDataset) + dataloader/frameloader.py. Key differences:

- No torch DataLoader: a numpy sampler + thread prefetcher produce
  ready-to-ship [2B, C, P] arrays (reference pixel layout flattened) so the
  device step does a single gather per ray.
- Distributed sharding is a keyed slice per jax process
  (DistributedSampler equivalent, frameloader.py:40-45).
- The per-line shard format of preprocess/img2lines.py is replaced by the
  same frame reader with line cropping — lines are rows of the cropped
  frame, so no separate on-disk shard step is required (the ``Pixels/``
  directory is still read if present, for drop-in compat).
"""
from __future__ import annotations

import os
import queue
import threading
from dataclasses import dataclass
from typing import Dict, List, Optional

import numpy as np

from moda_tpu.config import SeqData, load_seq_config
from moda_tpu.data.frames import FramePaths, FrameReader

DFRAME_CANDIDATES = [2, 4, 8, 16, 32]


@dataclass
class VideoDataset:
    """One video: frame pair access (vidbase.load_data equivalent)."""

    reader: FrameReader
    dataid: int
    num_frames: int

    def sample_pair(self, rng: np.random.Generator, idx: Optional[int] = None) -> Dict[str, np.ndarray]:
        max_id = self.num_frames - 1
        if idx is None:
            idx = int(rng.integers(0, max_id))
        fw = bool(rng.integers(0, 2)) if idx > 0 and idx < max_id else (idx < max_id)
        dir_fac = 1 if fw else -1
        cands = [1] + [d for d in DFRAME_CANDIDATES
                       if idx % d == 0 and 0 <= idx + d * dir_fac <= max_id]
        dframe = int(rng.choice(cands))
        i0 = idx
        i1 = idx + dframe * dir_fac

        d0 = self.reader.read_raw(i0, flowfw=fw, dframe=dframe)
        d1 = self.reader.read_raw(i1, flowfw=not fw, dframe=dframe)
        flow, flown, occ, occn = self.reader.flow_process(d0, d1)

        def pack(d, fl, oc):
            S = self.reader.img_size
            return {
                "imgs": d["img"].reshape(-1, 3).T,         # [3, P]
                "masks": (d["mask"] * d["vis2d"] > 0).astype(np.float32).reshape(1, -1),
                "vis2d": d["vis2d"].reshape(1, -1).astype(np.float32),
                "flow": fl.reshape(-1, 2).T,
                "occ": oc.reshape(1, -1),
                "dp_feats": d["dp_feat_rsmp"].reshape(16, -1),
                "dps": d["dp"].reshape(1, -1),
                "rtk": d["rtk"].astype(np.float32),
                "kaug": d["kaug"].astype(np.float32),
            }

        return {
            "frames": (pack(d0, flow, occ), pack(d1, flown, occn)),
            "frameid": np.asarray([i0, i1], np.int32),
            "dataid": np.asarray([self.dataid, self.dataid], np.int32),
        }


def build_datasets(seqname: str, img_size: int, config_dir: str = "configs",
                   rtk_base: Optional[str] = None) -> List[VideoDataset]:
    """Parse configs/<seqname>.config into per-video datasets."""
    seqs = load_seq_config(seqname, config_dir)
    out = []
    for i, s in enumerate(seqs):
        imgs = s.image_list()
        rtk_path = rtk_base + "/" + imgs[0].split("/")[-2] if rtk_base else s.rtk_path
        paths = FramePaths.from_imglist(imgs, rtk_path)
        reader = FrameReader(paths, img_size, s.flip)
        out.append(VideoDataset(reader=reader, dataid=i, num_frames=len(imgs)))
    return out


def data_offsets(datasets: List[VideoDataset]) -> tuple:
    """Cumulative frame offsets per video (extract_data_info equivalent,
    utils/io.py:537-548)."""
    off = [0]
    for d in datasets:
        off.append(off[-1] + d.num_frames)
    return tuple(off)


PIXEL_KEYS = ("imgs", "masks", "vis2d", "flow", "occ", "dp_feats", "dps")


def collate_pairs(pairs: List[Dict], offsets, npix: Optional[int] = None,
                  rng: Optional[np.random.Generator] = None) -> Dict[str, np.ndarray]:
    """B pair dicts -> one [2B, ...] frame batch, reference ordering:
    first all reference frames, then all paired frames (moda.py:1362-1417).
    frameid is made absolute via the video offsets.

    npix: sparse collation — per-entry pixel columns are sampled here and
    only those are stacked (the host-side sampling contract of
    sparsify_batch, fused into collation so the full rows are never
    copied; matters on few-core hosts)."""
    B = len(pairs)
    keys = pairs[0]["frames"][0].keys()
    batch = {}
    ids = None
    if npix is not None:
        P = np.asarray(pairs[0]["frames"][0]["imgs"]).shape[-1]
        ids = rng.integers(0, P, size=(2 * B, npix)).astype(np.int32)
    for k in keys:
        if ids is not None and k in PIXEL_KEYS:
            a = np.stack([np.asarray(p["frames"][0][k])[:, ids[i]]
                          for i, p in enumerate(pairs)])
            b = np.stack([np.asarray(p["frames"][1][k])[:, ids[B + i]]
                          for i, p in enumerate(pairs)])
        else:
            a = np.stack([p["frames"][0][k] for p in pairs])
            b = np.stack([p["frames"][1][k] for p in pairs])
        batch[k] = np.concatenate([a, b], 0)
    if ids is not None:
        batch["pix_ids"] = ids
    fid = np.concatenate([
        np.stack([p["frameid"][0] for p in pairs]),
        np.stack([p["frameid"][1] for p in pairs]),
    ])
    did = np.concatenate([
        np.stack([p["dataid"][0] for p in pairs]),
        np.stack([p["dataid"][1] for p in pairs]),
    ])
    offsets = np.asarray(offsets)
    batch["frameid_sub"] = fid.astype(np.int32)
    batch["frameid"] = (fid + offsets[did]).astype(np.int32)
    batch["dataid"] = did.astype(np.int32)
    if "lineid" in pairs[0]:
        lid = np.concatenate([
            np.stack([p["lineid"][0] for p in pairs]),
            np.stack([p["lineid"][1] for p in pairs]),
        ])
        batch["lineid"] = lid.astype(np.int32)
    return batch


def sparsify_batch(batch: Dict[str, np.ndarray], npix: int,
                   rng: np.random.Generator) -> Dict[str, np.ndarray]:
    """Host-side pixel sampling: keep only npix random pixel columns per
    entry, recording their global ids in batch['pix_ids'] [2B, npix].

    The device step only ever gathers nsample(+active pool) pixels per
    entry; uploading full rows/frames through a remote-TPU link costs more
    than the step itself (measured 25 MB -> ~0.4 s vs a 77 ms step), so
    the sampling moves host-side. Layout contract with
    render/rays.py::build_rays: columns [:nsample] are the uniform slots,
    the last 4*(nsample+nsample_active) are the active candidate pool."""
    per_px = [k for k in PIXEL_KEYS if k in batch]
    P = batch[per_px[0]].shape[-1]
    n = batch[per_px[0]].shape[0]
    ids = rng.integers(0, P, size=(n, npix)).astype(np.int32)
    out = dict(batch)
    for k in per_px:
        out[k] = np.take_along_axis(batch[k], ids[:, None, :], axis=2)
    out["pix_ids"] = ids
    return out


class PairLoader:
    """Random pair batches with thread prefetch; per-process sharding by
    disjoint RNG streams (replaces DistributedSampler).

    npix: when set, batches are host-subsampled to npix pixel columns per
    entry (sparsify_batch) before upload."""

    def __init__(self, datasets: List[VideoDataset], batch_size: int,
                 seed: int = 0, process_index: int = 0, num_prefetch: int = 4,
                 num_threads: int = 4, npix: Optional[int] = None):
        self.npix = npix
        self.datasets = datasets
        self.offsets = data_offsets(datasets)
        self.batch_size = batch_size
        self.rng = np.random.default_rng(seed * 1000 + process_index)
        self.q: queue.Queue = queue.Queue(maxsize=num_prefetch)
        self._stop = threading.Event()
        self.threads = [
            threading.Thread(target=self._worker, daemon=True) for _ in range(num_threads)
        ]
        self._lock = threading.Lock()
        for t in self.threads:
            t.start()

    def _sample_batch(self) -> Dict[str, np.ndarray]:
        with self._lock:
            picks = [int(self.rng.integers(0, len(self.datasets)))
                     for _ in range(self.batch_size)]
            seeds = self.rng.integers(0, 2**31, size=self.batch_size + 1)
        pairs = []
        for ds_idx, s in zip(picks, seeds):
            try:
                pairs.append(self.datasets[ds_idx].sample_pair(np.random.default_rng(int(s))))
            except Exception as e:  # data fault -> fall back to pair 0
                print(f"warning: loading pair failed ({e}); falling back to 0")
                pairs.append(self.datasets[ds_idx].sample_pair(
                    np.random.default_rng(0), idx=0))
        return collate_pairs(pairs, self.offsets, npix=self.npix,
                             rng=np.random.default_rng(int(seeds[-1])))

    def _worker(self):
        while not self._stop.is_set():
            try:
                self.q.put(self._sample_batch(), timeout=1.0)
            except queue.Full:
                continue
            except Exception:
                if self._stop.is_set():
                    return
                raise

    def __next__(self):
        while True:
            try:
                return self.q.get(timeout=5.0)
            except queue.Empty:
                if not any(t.is_alive() for t in self.threads):
                    raise RuntimeError(
                        "all PairLoader workers died (see tracebacks above)")

    def __iter__(self):
        return self

    def close(self):
        self._stop.set()


class LineShardDataset:
    """Drop-in reader for the reference's pre-sharded pixel rows
    (preprocess/img2lines.py:33-107 + utils/io.py:380-454):
    ``Pixels/<seq>/<dframe>_<frameid>/%04d.npy`` holding per-row dicts
    {img [1,2,3,W], mask, vis2d, flow [1,2,2,W], occ, dp, dp_feat_rsmp
    [1,2,16,W]} plus ``rtk.npy`` {'rtk','kaug'}. Produces the same pair
    layout as VideoDataset.sample_pair, with one row per sample (lineid)."""

    def __init__(self, pixels_dir: str, imglist: List[str], img_size: int,
                 dataid: int = 0, rtklist: Optional[List[str]] = None,
                 cache_bytes: int = 8 << 30):
        self.pixels_dir = pixels_dir
        self.img_size = img_size
        self.dataid = dataid
        self.num_frames = len(imglist)
        self.rtklist = rtklist
        # in-memory caches: on few-core hosts the per-pair file parsing
        # (np.load pickle rows + np.loadtxt cams) dominates the train loop;
        # rows fill the cache up to cache_bytes then stop being added
        self._cache_bytes = cache_bytes
        self._cache_used = 0
        self._row_cache: Dict = {}
        self._meta_cache: Dict = {}
        self._rtk_cache: Dict = {}

    def _load_rtk(self, idt: int) -> Optional[np.ndarray]:
        if self.rtklist is None:
            return None
        if idt not in self._rtk_cache:
            try:
                self._rtk_cache[idt] = np.loadtxt(self.rtklist[idt])
            except (OSError, FileNotFoundError):
                self._rtk_cache[idt] = None
        return self._rtk_cache[idt]

    def _load_row(self, shard: str, idy: int):
        key = (shard, idy)
        row = self._row_cache.get(key)
        if row is None:
            row = np.load(os.path.join(shard, "%04d.npy" % idy),
                          allow_pickle=True).item()
            if self._cache_used < self._cache_bytes:
                self._row_cache[key] = row
                self._cache_used += sum(
                    np.asarray(v).nbytes for v in row.values())
        return row

    def _load_meta(self, shard: str):
        meta = self._meta_cache.get(shard)
        if meta is None:
            meta = np.load(os.path.join(shard, "rtk.npy"),
                           allow_pickle=True).item()
            self._meta_cache[shard] = meta
        return meta

    def sample_pair(self, rng: np.random.Generator, idx: Optional[int] = None,
                    idy: Optional[int] = None) -> Dict[str, np.ndarray]:
        max_id = self.num_frames - 1
        idt = int(rng.integers(0, max_id)) if idx is None else idx
        idy = int(rng.integers(0, self.img_size)) if idy is None else idy
        cands = [1] + [d for d in DFRAME_CANDIDATES
                       if idt % d == 0 and idt + d <= max_id]
        # only dframes whose shards exist on disk (partial exports)
        cands = [d for d in cands
                 if os.path.isdir(os.path.join(self.pixels_dir, f"{d}_{idt:05d}"))] or [1]
        dframe = int(rng.choice(cands))
        shard = os.path.join(self.pixels_dir, f"{dframe}_{idt:05d}")
        row = self._load_row(shard, idy)
        meta = self._load_meta(shard)
        kaug = np.asarray(meta["kaug"]).reshape(2, 4)

        rtk0 = self._load_rtk(idt)
        rtk1 = self._load_rtk(idt + dframe)
        if rtk0 is None or rtk1 is None:
            rtk = np.asarray(meta.get("rtk", np.tile(np.eye(4)[None], (1, 2, 1, 1))))
            rtk = rtk.reshape(2, 4, 4)
        else:
            rtk = np.stack([rtk0, rtk1])

        def pack(j):
            d = {
                "imgs": np.asarray(row["img"]).reshape(2, 3, -1)[j],
                "masks": np.asarray(row["mask"]).reshape(2, 1, -1)[j],
                "vis2d": np.asarray(row["vis2d"]).reshape(2, 1, -1)[j],
                "flow": np.asarray(row["flow"]).reshape(2, 2, -1)[j],
                "occ": np.asarray(row["occ"]).reshape(2, 1, -1)[j],
                "dp_feats": np.asarray(row["dp_feat_rsmp"]).reshape(2, 16, -1)[j],
                "rtk": rtk[j].astype(np.float32),
                "kaug": kaug[j].astype(np.float32),
            }
            d["masks"] = ((d["masks"] * d["vis2d"]) > 0).astype(np.float32)
            return d

        return {
            "frames": (pack(0), pack(1)),
            "frameid": np.asarray([idt, idt + dframe], np.int32),
            "dataid": np.asarray([self.dataid, self.dataid], np.int32),
            "lineid": np.asarray([idy, idy], np.int32),
        }


def build_line_datasets(seqname: str, img_size: int, config_dir: str = "configs",
                        rtk_base: Optional[str] = None) -> List[LineShardDataset]:
    """Line-shard datasets from configs/<seq>.config + Pixels/ shards."""
    seqs = load_seq_config(seqname, config_dir)
    out = []
    for i, s in enumerate(seqs):
        imgs = s.image_list()
        seqdir = os.path.basename(os.path.dirname(imgs[0]))
        pixels_dir = imgs[0].replace("JPEGImages", "Pixels").rsplit("/", 1)[0]
        rtk_path = rtk_base + "/" + seqdir if rtk_base else s.rtk_path
        if rtk_path:
            rtklist = ["%s-%05d.txt" % (rtk_path, k) for k in range(len(imgs))]
        else:
            # default Cameras/ layout (FramePaths.from_imglist convention)
            rtklist = [p.replace("JPEGImages", "Cameras").rsplit(".", 1)[0] + ".txt"
                       for p in imgs]
        out.append(LineShardDataset(pixels_dir, imgs, img_size, dataid=i,
                                    rtklist=rtklist))
    return out
