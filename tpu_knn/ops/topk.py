"""Top-k primitives: the TPU replacement for KNNQueue / SortArrBI.

The reference maintains a bounded max-heap per query (include/knnqueue.h)
or an incremental sorted array (include/sort_arr_bi.h). On TPU the
equivalent is `jax.lax.top_k` over whole distance blocks, plus a
streaming merge so a full corpus scan never materializes more than one
[Q, chunk] block of distances (SURVEY.md §7: "tiled matmul + streaming
top-k").
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

#: Sentinel used for masked/padded candidates. numpy, not jnp: a
#: module-level jnp constant would initialize the backend at import
#: time, before platform pinning (see ops/sparse.py PAD_Q note).
INF = np.float32(np.inf)


def smallest_k(dists: jax.Array, k: int, idx: jax.Array | None = None):
    """Per-row k smallest entries, ascending. Returns (dists[Q,k], ids[Q,k]).

    ``idx``: optional [Q, N] (or [N]) global ids to return instead of column
    positions.
    """
    neg, pos = jax.lax.top_k(-dists, k)
    if idx is None:
        ids = pos
    elif idx.ndim == 1:
        ids = idx[pos]
    else:
        ids = jnp.take_along_axis(idx, pos, axis=1)
    return -neg, ids


def merge_topk(d_a, i_a, d_b, i_b, k: int):
    """Merge two per-row top-k sets into one (ascending). This is the
    shard/thread merge of the reference (seqsearch.cc:163-176) and the
    multi-chip ICI merge primitive."""
    d = jnp.concatenate([d_a, d_b], axis=-1)
    i = jnp.concatenate([i_a, i_b], axis=-1)
    return smallest_k(d, k, i)


def streaming_smallest_k(
    chunk_dists: Callable[[jax.Array], jax.Array],
    num_chunks: int,
    chunk_size: int,
    num_queries: int,
    k: int,
):
    """Scan ``num_chunks`` corpus chunks, keeping a running top-k.

    ``chunk_dists(ci)`` must return the [Q, chunk_size] distance block for
    chunk ``ci`` (with padded corpus rows already set to +inf). HBM traffic
    stays at one corpus read + O(k) state.
    """
    init_d = jnp.full((num_queries, k), INF, jnp.float32)
    init_i = jnp.full((num_queries, k), -1, jnp.int32)

    def step(carry, ci):
        cd, cidx = carry
        d = chunk_dists(ci)  # [Q, C]
        base = ci * chunk_size
        cols = base + jax.lax.broadcasted_iota(jnp.int32, (num_queries, chunk_size), 1)
        nd, ni = merge_topk(cd, cidx, d, cols, k)
        return (nd, ni), None

    (fd, fi), _ = jax.lax.scan(step, (init_d, init_i), jnp.arange(num_chunks))
    return fd, fi


def mask_padding(dists: jax.Array, count: int | jax.Array, total: int) -> jax.Array:
    """Set distance columns >= count (corpus padding rows) to +inf."""
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, total), 1)
    return jnp.where(cols < count, dists, INF)


#: Lane-group width for the two-pass exact top-k (one VPU lane row).
#: The group-min containment theorem behind the two-pass scan: if entry
#: e is among the k smallest overall, fewer than k groups have a min
#: below e's group min (each such group would contribute an element
#: smaller than e), so e's group is among the k smallest group-mins —
#: one top-k over the [Q, N/128] mins selects <= k+margin groups whose
#: k*128 columns provably contain the exact answer. The full pipeline
#: lives in methods/seq_search.py (_knn_device_twopass) with the fused
#: pass-1 kernel in ops/pallas_scan.py.
GROUP = 128
