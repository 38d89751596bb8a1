"""Device-mesh helpers.

The reference is single-process (SURVEY.md §2.6: no NCCL/MPI anywhere);
its only parallel patterns are thread-sharded scans with top-k merges
(seqsearch.cc:73-98, 163-176). The TPU-native replacement is a 1-D
corpus-sharding mesh axis with queries replicated and per-shard top-k
merged over ICI collectives.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

SHARD_AXIS = "shard"


def make_mesh(num_devices: int | None = None, axis: str = SHARD_AXIS) -> Mesh:
    devs = jax.devices()
    if num_devices is not None:
        devs = devs[:num_devices]
    return Mesh(np.asarray(devs), (axis,))


def shard_rows(mesh: Mesh, x, axis: str = SHARD_AXIS):
    """Place an array with rows split across the mesh axis."""
    return jax.device_put(x, NamedSharding(mesh, P(axis)))


def replicate(mesh: Mesh, x):
    return jax.device_put(x, NamedSharding(mesh, P()))
