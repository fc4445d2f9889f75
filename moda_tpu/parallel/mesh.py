"""Device mesh + sharding helpers: SPMD data parallelism over ICI.

TPU-native replacement of the reference's NCCL DDP stack (main.py:22-28,
DataParallelPassthrough + DistributedSampler, train_utils.py:48-62,
frameloader.py:40-45):

- one 1-axis mesh ("data"); the frame-pair batch is sharded on its leading
  [2B] axis, params/optimizer state are replicated;
- gradients need no explicit all-reduce: the loss is a global mean over the
  sharded batch, so XLA inserts the psum during SPMD partitioning —
  DDP's backward hook becomes a compiler decision;
- the reference's post-reinit broadcasts (train_utils.py:1136-1152) vanish
  because bone re-init is deterministic in the trainer.

The model is small (MLPs of width <=256), so tensor/pipeline sharding adds
nothing; scaling happens along rays/frames. Ray-batch sharding IS the
sequence-parallel analogue for this workload (SURVEY.md §2.3).
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()[: n_devices or len(jax.devices())]
    return Mesh(np.asarray(devices), axis_names=("data",))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading [2B] axis of every batch array over 'data'."""
    return NamedSharding(mesh, P("data"))


def batch_sharding_stacked(mesh: Mesh) -> NamedSharding:
    """For chunk-stacked batches [K, 2B, ...]: shard the [2B] axis."""
    return NamedSharding(mesh, P(None, "data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    s = batch_sharding(mesh)
    return {k: jax.device_put(v, s) for k, v in batch.items()}


def replicate(tree, mesh: Mesh):
    s = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), tree)
