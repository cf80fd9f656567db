"""Data-parallel mesh + sharding helpers.

The reference's only parallelism is single-process multi-GPU
DataParallel with uneven chunk sizes (reference:
src/lib/model/data_parallel.py, scatter_gather.py, opts.py:300-309).
The TPU-native equivalent: a 1-D `jax.sharding.Mesh` over the 'data'
axis; batches are sharded on dim 0, parameters replicated, and pjit
inserts the gradient all-reduce over ICI. No uneven chunks — TPU slices
are homogeneous, so the master-GPU special case has no analogue.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


DATA_AXIS = "data"


def make_mesh(num_devices: Optional[int] = None,
              devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard dim 0 (batch) over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """Place every array in the batch dict with batch-dim sharding."""
    sh = batch_sharding(mesh)
    return {k: jax.device_put(v, sh) for k, v in batch.items()}


def replicate_tree(tree, mesh: Mesh):
    return jax.device_put(tree, replicated(mesh))
