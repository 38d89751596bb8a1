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
#: two-tier mesh axis names: slow inter-host tier, fast intra-slice tier
DCN_AXIS = "dcn"
ICI_AXIS = "ici"


def make_mesh(num_devices: int | None = None, axis: str = SHARD_AXIS) -> Mesh:
    devs = jax.devices()
    if num_devices is not None:
        devs = devs[:num_devices]
    return Mesh(np.asarray(devs), (axis,))


def make_mesh2(dcn: int, ici: int) -> Mesh:
    """Two-tier mesh [dcn, ici]: the leading axis maps across hosts
    (slow DCN links), the trailing axis within a slice (fast ICI) —
    jax.devices() orders devices host-major, so reshaping row-major puts
    each host's chips in one ICI row. Collectives over ICI_AXIS ride
    ICI; the hierarchical merge sends only [Q, k] per query over DCN
    (parallel/sharded.py sharded_exact_knn_hier)."""
    devs = jax.devices()
    if dcn * ici > len(devs):
        raise ValueError(f"need {dcn * ici} devices, have {len(devs)}")
    return Mesh(np.asarray(devs[: dcn * ici]).reshape(dcn, ici), (DCN_AXIS, ICI_AXIS))


def shard_rows(mesh: Mesh, x, axis: str = SHARD_AXIS):
    """Place an array with rows split across the mesh axis."""
    return jax.device_put(x, NamedSharding(mesh, P(axis)))


def replicate(mesh: Mesh, x):
    return jax.device_put(x, NamedSharding(mesh, P()))
