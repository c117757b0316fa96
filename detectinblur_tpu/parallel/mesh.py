"""Device mesh + sharding rules.

The reference's distributed story is single-axis data parallelism over
NCCL DDP (utils.py:763-785, SURVEY.md §2.6). TPU-native, that becomes SPMD
under jit on a 1-D ``data`` mesh: parameters replicated, batch sharded,
gradients reduced by the partitioner over ICI — DDP's machinery disappears
but every capability (multi-chip training, rank-0 I/O, per-host seeding,
cross-host eval merge) is reproduced here and in train/eval_loop.py (cross-host merge).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(n_devices: Optional[int] = None, axis: str = DATA_AXIS) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree):
    """Place every leaf with its leading dim sharded over the data axis."""
    s = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), tree)


def replicate(mesh: Mesh, tree):
    r = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, r), tree)


def is_main_process() -> bool:
    """rank-0-only I/O gate (utils.py:734-760 equivalent)."""
    return jax.process_index() == 0


def local_batch_slice(global_batch: int) -> slice:
    """Per-host shard of the global batch (DistributedSampler equivalent)."""
    per = global_batch // jax.process_count()
    start = jax.process_index() * per
    return slice(start, start + per)
