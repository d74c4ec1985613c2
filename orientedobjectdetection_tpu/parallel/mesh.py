"""Device mesh + sharding helpers.

Replaces the reference's DDP/NCCL layer (``utils/util_distribution.py:10-62``,
``tools/dist_train.sh``) with JAX SPMD: a named mesh, batch-sharded inputs,
replicated params; XLA inserts the gradient all-reduce over ICI. Detection
models here are <100M params, so data parallelism is the whole story
(SURVEY.md §2.10) — the mesh is 1-D but kept named so larger layouts slot in.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = 'data'


def make_mesh(devices=None, axis_name: str = DATA_AXIS) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding for input pytrees."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Place a host batch pytree with the batch axis split over the mesh."""
    sharding = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)
