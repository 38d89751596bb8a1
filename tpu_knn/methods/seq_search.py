"""Exact brute-force scan: seq_search / brute_force.

Reference: include/method/seqsearch.h, src/method/seqsearch.cc. There it
is a per-object loop, optionally thread-sharded with a final top-k merge
(seqsearch.cc:73-98, 144-176). Here it is the TPU-native design from
SURVEY.md §7: a tiled matmul (or blocked VPU distance) over corpus
chunks with a streaming top-k carried through a `lax.scan` — never
materializing more than one [Q, chunk] distance block. This method is
also the gold-standard generator for the evaluation harness
(gold_standard.h:151-174).

The reference's ``multiThread``/``threadQty`` sharding maps to the mesh-
sharded variant in parallel/sharded.py; the params are accepted here for
API parity and ignored single-chip (the batch dimension already fills
the chip).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..core.dataset import DataStore, round_up
from ..core.errors import IndexNotBuiltError
from ..core.params import ParamManager, Params
from ..core.registry import register_method
from ..ops import topk as T
from .base import Method


@partial(jax.jit, static_argnames=("space", "k", "chunk", "precision"))
def _knn_device(space, qenc, data, k: int, chunk: int, precision: str):
    nq = qenc["q"].shape[0] if "q" in qenc else next(iter(qenc.values())).shape[0]
    n_pad = data.ids.shape[0]
    num_chunks = n_pad // chunk

    def chunk_dists(ci):
        xc = space.slice_data(data, ci * chunk, chunk)
        return space.block(qenc, xc, precision)

    d, pos = T.streaming_smallest_k(chunk_dists, num_chunks, chunk, nq, k)
    ids = jnp.where(pos >= 0, data.ids[jnp.clip(pos, 0, n_pad - 1)], -1)
    return d, ids, pos


@partial(jax.jit, static_argnames=("space", "chunk", "precision"))
def _all_dists_device(space, qenc, data, chunk: int, precision: str):
    n_pad = data.ids.shape[0]
    num_chunks = n_pad // chunk

    def one(ci):
        xc = space.slice_data(data, ci * chunk, chunk)
        return space.block(qenc, xc, precision)

    blocks = jax.lax.map(one, jnp.arange(num_chunks))  # [C?, Q, chunk]
    return jnp.moveaxis(blocks, 0, 1).reshape(blocks.shape[1], -1)


@register_method("seq_search")
class SeqSearch(Method):
    """Exact kNN / range scan; the correctness oracle for every ANN method."""

    name = "seq_search"
    supports_range = True

    DEFAULT_CHUNK = 8192

    def __init__(self, space, params: Params | None = None):
        super().__init__(space, params)
        pm = ParamManager(self.index_params)
        # Reference-parity knobs (seqsearch.cc:52-71): accepted, with the
        # threading ones subsumed by batching/sharding.
        self.copy_mem = pm.get("copyMem", False, bool)
        self.multi_thread = pm.get("multiThread", False, bool)
        self.thread_qty = pm.get("threadQty", 0, int)
        self.chunk = pm.get("chunkSize", 0, int)
        self.precision = pm.get("precision", "float32", str)
        pm.check_unused()
        self.dist_comps = 0

    def create_index(self, store: DataStore, params: Params | None = None) -> None:
        self.store = store
        n = max(len(store), 1)
        default = getattr(self.space, "preferred_chunk", self.DEFAULT_CHUNK)
        chunk = self.chunk or min(default, round_up(n, 8))
        chunk = round_up(chunk, 8)
        self.data = self.space.encode_dataset(store, row_multiple=chunk)
        self._chunk = chunk

    def set_query_time_params(self, params: Params | None) -> None:
        pm = ParamManager(Params.of(params))
        pm.get("dummyParam", 0, int)  # parity no-op
        pm.check_unused()
        super().set_query_time_params(params)

    def knn(self, points, k: int):
        if self.data is None:
            raise IndexNotBuiltError("seq_search: index not built")
        qenc = self.space.encode_queries(points)
        kk = min(k, self.data.ids.shape[0])
        d, ids, _ = _knn_device(self.space, qenc, self.data, kk, self._chunk, self.precision)
        if kk < k:  # keep the requested width; extras are masked
            padw = k - kk
            d = jnp.pad(d, ((0, 0), (0, padw)), constant_values=jnp.inf)
            ids = jnp.pad(ids, ((0, 0), (0, padw)), constant_values=-1)
        self.dist_comps += d.shape[0] * self.data.count
        return self._finalize_knn(d, ids)

    def range(self, points, radius: float):
        if self.data is None:
            raise IndexNotBuiltError("seq_search: index not built")
        qenc = self.space.encode_queries(points)
        dists = np.asarray(
            _all_dists_device(self.space, qenc, self.data, self._chunk, self.precision)
        )
        ids = np.asarray(self.data.ids)
        self.dist_comps += dists.shape[0] * self.data.count
        out = []
        for row in dists:
            sel = np.nonzero(row <= radius)[0]
            order = np.argsort(row[sel], kind="stable")
            sel = sel[order]
            out.append((ids[sel].copy(), row[sel].copy()))
        return out

    # -- the gold-standard hook (gold_standard.h analog) --
    def exact_knn(self, points, k: int):
        return self.knn(points, k)
