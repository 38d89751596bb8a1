"""Corpus-sharded HNSW: one subgraph per device, searched in parallel.

The TPU-native scale-out of SURVEY.md §7 step 9: the corpus is split
into equal shards, each shard gets its own HNSW built by the wave
builder (methods/hnsw.py), the per-shard graphs and encoded data are
stacked on a leading shard axis, and a query batch runs the batched
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

from ..core.dataset import DataStore
from ..core.params import Params
from ..methods.hnsw import Hnsw, _corpus_dict
from ..ops import graph as G
from .mesh import SHARD_AXIS
from .sharded import merge_sharded_topk


def _pad_rows_to(a: jnp.ndarray, n: int, fill) -> jnp.ndarray:
    if a.shape[0] == n:
        return a
    pad = jnp.full((n - a.shape[0],) + a.shape[1:], fill, a.dtype)
    return jnp.concatenate([a, pad], axis=0)


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
            sub = DataStore(store.kind)
            lo, hi = si * per, min((si + 1) * per, n)
            ids = store.ids[lo:hi]
            if store.kind.value == "dense_vector":
                sub.add_dense_batch(store.dense_matrix()[lo:hi], ids)
            elif store.kind.value == "dense_uint8_vector":
                sub.add_uint8_batch(store.dense_matrix()[lo:hi], ids)
            else:
                raise NotImplementedError("sharded hnsw: dense kinds only for now")
            h = Hnsw(self.space, self.params)
            h.create_index(sub)
            shards.append(h)
        self._stack(shards)

    def _stack(self, shards: list[Hnsw]) -> None:
        n_pad = max(h.data.ids.shape[0] for h in shards)
        max_lv = max(len(h._upper) for h in shards)
        vecs, ids, pad, term, lvl0 = [], [], [], [], []
        uppers: list[list] = [[] for _ in range(max_lv)]
        u_rows = [
            max((h._upper[l].shape[0] if l < len(h._upper) else 1) for h in shards)
            for l in range(max_lv)
        ]
        m = shards[0].maxM
        for h in shards:
            vecs.append(_pad_rows_to(h.data.vecs, n_pad, 0))
            ids.append(_pad_rows_to(h.data.ids, n_pad, -1))
            pad.append(_pad_rows_to(h.data.extra["pad"], n_pad, 1e30))
            if h.data.row_term is not None:
                term.append(_pad_rows_to(h.data.row_term, n_pad, 0))
            lvl0.append(_pad_rows_to(h.graph["level0"], n_pad, -1))
            for l in range(max_lv):
                u = h._upper[l] if l < len(h._upper) else jnp.full((1, m), -1, jnp.int32)
                uppers[l].append(_pad_rows_to(u, u_rows[l], -1))
        self._stacked = {
            "vecs": jnp.stack(vecs),
            "ids": jnp.stack(ids),
            "pad": jnp.stack(pad),
            "term": jnp.stack(term) if term else None,
            "level0": jnp.stack(lvl0),
            "upper": tuple(jnp.stack(u) for u in uppers),
        }
        self._shard_devices()

    def _shard_devices(self) -> None:
        from jax.sharding import NamedSharding

        sh = NamedSharding(self.mesh, P(self.axis))
        st = self._stacked
        for k in ("vecs", "ids", "pad", "level0"):
            st[k] = jax.device_put(st[k], sh)
        if st["term"] is not None:
            st["term"] = jax.device_put(st["term"], sh)
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
            self.space, qenc, st["vecs"], st["ids"], st["pad"], st["term"],
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
def _sharded_search(space, qenc, vecs, ids, pad, term, level0, upper, ef, k, expand,
                    mesh, axis):
    if term is None:
        term = jnp.zeros(vecs.shape[:2], jnp.float32)

    def local(qenc_l, vecs, ids_l, pad, term, level0, upper):
        # strip the leading local-shard axis of size 1
        vecs, ids_l, pad, level0 = vecs[0], ids_l[0], pad[0], level0[0]
        upper = tuple(u[0] for u in upper)
        corpus = {"vecs": vecs, "pad": pad, "term": term[0]}
        b = next(v.shape[0] for v in qenc_l.values() if hasattr(v, "ndim") and v.ndim >= 1)
        cur = jnp.zeros(b, jnp.int32)
        cur_d = G.score_rows(space, qenc_l, corpus, cur[:, None])[:, 0]
        for adj in reversed(upper):
            cur, cur_d = G.greedy_descent(space, qenc_l, corpus, adj, None, cur, cur_d)
        beam_d, beam_i, _ = G.beam_search(
            space, qenc_l, corpus, level0, None, cur, ef=ef, expand=expand
        )
        d, pos = beam_d[:, :k], beam_i[:, :k]
        out_ids = jnp.where(pos >= 0, ids_l[jnp.clip(pos, 0, ids_l.shape[0] - 1)], -1)
        return merge_sharded_topk(d, out_ids, k, axis)

    specs = (
        jax.tree_util.tree_map(lambda _: P(), qenc),
        P(axis), P(axis), P(axis),
        P(axis),
        P(axis),
        tuple(P(axis) for _ in upper),
    )
    f = jax.shard_map(
        local, mesh=mesh, in_specs=specs, out_specs=(P(), P()), check_vma=False
    )
    return f(qenc, vecs, ids, pad, term, level0, upper)
