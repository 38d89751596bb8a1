"""Corpus-sharded HNSW: one subgraph per device, searched in parallel.

The TPU-native scale-out of SURVEY.md §7 step 9: the corpus is split
into equal shards, each shard gets its own HNSW built by the wave
builder (methods/hnsw.py), the per-shard graphs and encoded corpus
arrays (space.corpus_dict — generic over dense/sparse/string layouts)
are stacked on a leading shard axis, and a query batch runs the batched
beam search on every shard simultaneously under shard_map, with one
all_gather + top-k merge over ICI at the end.

Recall note: searching S subgraphs with the same ef is slightly *more*
accurate than one big graph at equal total work, so recall parity with
the single-chip path holds by construction; tests assert it on the
8-device CPU mesh.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from jax.sharding import Mesh, PartitionSpec as P

from ..core.dataset import DataKind, DataStore
from ..core.params import Params
from ..methods.hnsw import Hnsw
from ..ops import graph as G
from .mesh import SHARD_AXIS
from .sharded import merge_sharded_topk


def _pad_rows_to(a: jnp.ndarray, n: int, fill) -> jnp.ndarray:
    if a.shape[0] == n:
        return a
    pad = jnp.full((n - a.shape[0],) + a.shape[1:], fill, a.dtype)
    return jnp.concatenate([a, pad], axis=0)


def _subset_store(store: DataStore, lo: int, hi: int) -> DataStore:
    sub = DataStore(store.kind)
    ids = store.ids[lo:hi]
    if store.kind in (DataKind.DENSE, DataKind.UINT8):
        mat = store.dense_matrix()[lo:hi]
        if store.kind is DataKind.DENSE:
            sub.add_dense_batch(mat, ids)
        else:
            sub.add_uint8_batch(mat, ids)
    elif store.kind is DataKind.SPARSE:
        sub.add_sparse_batch(store.sparse_points()[lo:hi], ids)
    else:
        sub.add_string_batch(store.strings()[lo:hi], ids)
    return sub


class ShardedHnsw:
    """Builds and queries S per-shard HNSW graphs under one mesh."""

    def __init__(self, space, mesh: Mesh, index_params: Params | None = None,
                 axis: str = SHARD_AXIS):
        self.space = space
        self.mesh = mesh
        self.axis = axis
        self.params = Params.of(index_params)
        self.ef_search = 20
        self.expand = 4
        self._stacked = None

    # ---------------- build ----------------

    def build(self, store: DataStore) -> None:
        s = self.mesh.devices.size
        n = len(store)
        per = (n + s - 1) // s
        shards: list[Hnsw] = []
        for si in range(s):
            lo, hi = si * per, min((si + 1) * per, n)
            h = Hnsw(self.space, self.params)
            h.create_index(_subset_store(store, lo, hi))
            shards.append(h)
        self._stack(shards)

    def _stack(self, shards: list[Hnsw]) -> None:
        n_pad = max(h.data.ids.shape[0] for h in shards)
        max_lv = max(len(h._upper) for h in shards)
        m = shards[0].maxM
        u_rows = [
            max((h._upper[l].shape[0] if l < len(h._upper) else 1) for h in shards)
            for l in range(max_lv)
        ]
        corpus_keys = None
        corpus_stacks: dict[str, list] = {}
        ids, lvl0 = [], []
        uppers: list[list] = [[] for _ in range(max_lv)]
        for h in shards:
            c = self.space.corpus_dict(h.data)
            # per-shard counts differ, so the static-count row masking of
            # ops/graph.py can't apply across the stack: every shard gets
            # an explicit row_mask instead
            c.pop("count", None)
            c.setdefault("row_mask", h.data.extra["pad"])
            if corpus_keys is None:
                corpus_keys = [k for k, v in c.items() if v is not None]
            for k in corpus_keys:
                fill = 1e30 if k in ("pad", "row_mask") else 0
                corpus_stacks.setdefault(k, []).append(_pad_rows_to(c[k], n_pad, fill))
            ids.append(_pad_rows_to(h.data.ids, n_pad, -1))
            lvl0.append(_pad_rows_to(h.graph["level0"], n_pad, -1))
            for l in range(max_lv):
                u = h._upper[l] if l < len(h._upper) else jnp.full((1, m), -1, jnp.int32)
                uppers[l].append(_pad_rows_to(u, u_rows[l], -1))
        self._stacked = {
            "corpus": {k: jnp.stack(v) for k, v in corpus_stacks.items()},
            "ids": jnp.stack(ids),
            "level0": jnp.stack(lvl0),
            "upper": tuple(jnp.stack(u) for u in uppers),
        }
        self._shard_devices()

    def _shard_devices(self) -> None:
        from jax.sharding import NamedSharding

        sh = NamedSharding(self.mesh, P(self.axis))
        st = self._stacked
        st["corpus"] = {k: jax.device_put(v, sh) for k, v in st["corpus"].items()}
        st["ids"] = jax.device_put(st["ids"], sh)
        st["level0"] = jax.device_put(st["level0"], sh)
        st["upper"] = tuple(jax.device_put(u, sh) for u in st["upper"])

    # ---------------- search ----------------

    def set_query_time_params(self, params: Params | None) -> None:
        pm_ef = Params.of(params)
        if pm_ef.has("ef"):
            self.ef_search = int(pm_ef.get("ef"))
        if pm_ef.has("efSearch"):
            self.ef_search = int(pm_ef.get("efSearch"))

    def knn(self, points, k: int):
        qenc = self.space.encode_queries(points)
        ef = max(self.ef_search, k)
        st = self._stacked
        d, ids = _sharded_search(
            self.space, qenc, st["corpus"], st["ids"],
            st["level0"], st["upper"], ef, k, self.expand, self.mesh, self.axis,
        )
        d = np.asarray(d)
        ids = np.asarray(ids)
        bad = ~np.isfinite(d) | (d >= 1e29)
        return np.where(bad, np.inf, d), np.where(bad, -1, ids)


@partial(
    jax.jit,
    static_argnames=("space", "ef", "k", "expand", "mesh", "axis"),
)
def _sharded_search(space, qenc, corpus_st, ids, level0, upper, ef, k, expand,
                    mesh, axis):
    def local(qenc_l, corpus_l, ids_l, level0, upper):
        # strip the leading local-shard axis of size 1
        corpus = {kk: v[0] for kk, v in corpus_l.items()}
        ids_one, level0 = ids_l[0], level0[0]
        upper = tuple(u[0] for u in upper)
        b = next(v.shape[0] for v in qenc_l.values() if hasattr(v, "ndim") and v.ndim >= 1)
        cur = jnp.zeros(b, jnp.int32)
        cur_d = G.score_rows(space, qenc_l, corpus, cur[:, None])[:, 0]
        for adj in reversed(upper):
            cur, cur_d = G.greedy_descent(space, qenc_l, corpus, adj, None, cur, cur_d)
        beam_d, beam_i, _ = G.beam_search(
            space, qenc_l, corpus, level0, None, cur, ef=ef, expand=expand
        )
        d, pos = beam_d[:, :k], beam_i[:, :k]
        out_ids = jnp.where(pos >= 0, ids_one[jnp.clip(pos, 0, ids_one.shape[0] - 1)], -1)
        return merge_sharded_topk(d, out_ids, k, axis)

    specs = (
        jax.tree_util.tree_map(lambda _: P(), qenc),
        jax.tree_util.tree_map(lambda _: P(axis), corpus_st),
        P(axis),
        P(axis),
        tuple(P(axis) for _ in upper),
    )
    f = jax.shard_map(
        local, mesh=mesh, in_specs=specs, out_specs=(P(), P()), check_vma=False
    )
    return f(qenc, corpus_st, ids, level0, upper)
