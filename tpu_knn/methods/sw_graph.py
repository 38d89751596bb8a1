"""SW-graph (small_world_rand): single-layer navigable small-world graph
(reference: include/method/small_world_rand.h,
src/method/small_world_rand.cc; Malkov et al. 2014).

TPU design: the single layer is exactly the HNSW level-0 machinery, so
this reuses the batched-wave construction and beam search with no upper
levels (level sampling pinned to 0). The reference's unbounded sorted
friend lists become a capped padded adjacency row (``maxFriends``,
default 4*NN) with heuristic shrink-on-overflow — a documented
deviation: the reference never prunes, we cap for the fixed-shape
layout.

This is the only method with incremental maintenance (reference:
small_world_rand.cc:141-338):

  * ``add_batch`` — new points are inserted with the same wave machinery
    against the frozen existing graph (AddBatch analog; the reference
    also just runs its parallel insert over the new points).
  * ``delete_batch`` — strategies mirror ``DeleteStrategy``
    (small_world_rand.h:80-152):
      - "none" (kNone): drop deleted nodes and every link to them;
      - "neighbors_only" (kNeighborsOnly): additionally patch each
        surviving node's deleted links with the deleted node's closest
        surviving friend (removeGivenFriendsPatchWithClosestNeighbor).
    Deleted rows stay allocated but masked (+inf pad, id -1) — the
    reference compacts ids instead; external ids here are stable.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import numpy as np

from ..core.dataset import DataStore
from ..core.errors import IndexNotBuiltError, InvalidArgumentError
from ..core.params import ParamManager, Params
from ..core.registry import register_method
from ..ops import graph as G
from ..ops.topk import INF
from .hnsw import Hnsw, NEG1, _corpus_dict, _score_pairs


@register_method("sw-graph")
@register_method("small_world_rand")
class SmallWorldRand(Hnsw):
    name = "sw-graph"
    supports_range = False
    supports_incremental = True
    # delete_batch re-scores pairs with the wave encodings after the
    # build (_patch_links), so construction state must survive
    KEEP_WAVE_STATE = True

    def __init__(self, space, params: Params | None = None):
        pm = ParamManager(Params.of(params))
        nn = pm.get("NN", 10, int)
        efc = pm.get_synonym(["efConstruction", "initIndexAttempts"], nn, int)
        max_friends = pm.get("maxFriends", 4 * nn, int)
        pm.get("initSearchAttempts", 1, int)  # parity no-op (batched search)
        pm.get("indexThreadQty", 0, int)  # parity no-op: waves batch instead
        pm.get("useProxyDist", False, bool)  # parity no-op: no proxy distances
        wave = pm.get("waveSize", 256, int)
        wave_mates = pm.get("waveMates", 8, int)
        expand = pm.get("searchExpand", 4, int)
        # same wave machinery as hnsw: the synced 300k re-tune flipped
        # the default from the round-1 expand=16 (an unsynced-wall
        # artifact) to 4 (methods/hnsw.py, r2_btune.jsonl)
        c_expand = pm.get("constructionExpand", 4, int)
        seed = pm.get("seed", 0, int)
        delaunay = pm.get("delaunay_type", 2, int)
        pm.check_unused()
        super().__init__(
            space,
            Params(
                M=nn,
                maxM0=max_friends,
                efConstruction=efc,
                mult=0.0,  # pins every point to level 0 -> single layer
                delaunay_type=delaunay,
                waveSize=wave,
                waveMates=wave_mates,
                searchExpand=expand,
                constructionExpand=c_expand,
                seed=seed,
                # pin the insertion-wave build: hnsw's buildAlgo=auto
                # default is measured for hnsw only, and sw-graph's
                # delete patching assumes wave construction state
                buildAlgo="waves",
            ),
        )
        self.nn = nn
        # query-time default efSearch = NN (reference: small_world_rand.cc:366-427)
        self.ef_search = nn
        self.DEFAULT_EF_SEARCH = nn
        self._deleted: np.ndarray | None = None

    def _sample_levels(self, n: int, rng) -> np.ndarray:
        return np.zeros(max(n, 1), np.int32)[:n]

    # ---------------- incremental addition ----------------

    def add_batch(self, store: DataStore, new_positions: Sequence[int]) -> None:
        """Insert the store's new tail into the existing graph
        (reference: SmallWorldRand::AddBatch, small_world_rand.cc:141)."""
        if self.graph is None:
            self.create_index(store, self.index_params)
            return
        old_n = self._n_total
        n = len(store)
        if n <= old_n:
            return
        old_deleted = self._deleted
        self.store = store
        # order is identity for a single-layer graph (levels all 0)
        self.order = np.arange(n)
        self.levels = np.zeros(n, np.int32)
        old_level0 = self.graph["level0"]
        self._encode_store(store, n)
        n_pad = self.data.ids.shape[0]
        level0 = jnp.full((n_pad, self.maxM0), NEG1)
        level0 = level0.at[: old_level0.shape[0]].set(old_level0)
        self.graph = {"level0": level0}
        self._upper = []
        self._max_level = 0
        if old_deleted is not None:
            self._deleted = np.concatenate([old_deleted, np.zeros(n - old_n, bool)])
            self._mask_deleted_rows()
        self._run_waves(old_n, n)

    # ---------------- deletion ----------------

    def delete_batch(self, positions: Sequence[int], strategy: str = "none") -> None:
        """Remove nodes by store position (reference: DeleteBatch,
        small_world_rand.cc:232-338)."""
        if self.graph is None:
            raise IndexNotBuiltError("sw-graph: index not built")
        if strategy not in ("none", "neighbors_only"):
            raise InvalidArgumentError(
                f"unknown delete strategy {strategy!r}; use 'none' or 'neighbors_only'"
            )
        n = self._n_total
        pos = np.asarray(list(positions), np.int64)
        if pos.size == 0:
            return
        if pos.min() < 0 or pos.max() >= n:
            raise InvalidArgumentError("delete position out of range")
        if self._deleted is None:
            self._deleted = np.zeros(n, bool)
        newly = np.zeros(n, bool)
        newly[pos] = True
        self._deleted |= newly

        adj = np.asarray(self.graph["level0"])  # [n_pad, cap]
        deleted_full = np.zeros(adj.shape[0], bool)
        deleted_full[:n] = self._deleted
        is_del_link = (adj >= 0) & deleted_full[np.clip(adj, 0, adj.shape[0] - 1)]

        if strategy == "neighbors_only":
            adj = self._patch_links(adj, is_del_link, deleted_full)
        else:
            adj = np.where(is_del_link, -1, adj)
        adj[deleted_full] = -1
        self.graph = {"level0": jnp.asarray(adj)}
        self._mask_deleted_rows()
        # move the entry point off a deleted node (the reference keeps a
        # live entry element the same way, small_world_rand.cc)
        if self._deleted[self._entry]:
            surv = np.nonzero(~self._deleted)[0]
            self._entry = int(surv[0]) if surv.size else 0

    def _patch_links(self, adj: np.ndarray, is_del_link: np.ndarray, deleted_full: np.ndarray):
        """For each surviving node u with a deleted friend d, replace that
        link with d's closest surviving friend (closest to u), as in
        removeGivenFriendsPatchWithClosestNeighbor
        (small_world_rand.h:101-152)."""
        u_idx, slot_idx = np.nonzero(is_del_link & ~deleted_full[:, None])
        if u_idx.size == 0:
            return np.where(is_del_link, -1, adj)
        d_idx = adj[u_idx, slot_idx]
        cand = adj[d_idx]  # [P, cap] deleted nodes' friends
        cand_ok = (cand >= 0) & ~deleted_full[np.clip(cand, 0, adj.shape[0] - 1)]
        cand_m = np.where(cand_ok, cand, -1)
        # score in the GRAPH space: the wave encodings are proxy sketches
        # when a sparse build used one, and "closest surviving friend" is
        # an ordering decision, which the proxy preserves — mixing host
        # space with proxy encodings would score garbage
        corpus = _corpus_dict(self._graph_space, self._graph_data)
        d = np.asarray(
            _score_pairs(
                self._graph_space,
                self._qenc_all,
                self._n_total,
                corpus,
                jnp.asarray(u_idx[:, None].astype(np.int32)),
                jnp.asarray(cand_m.astype(np.int32)),
            )
        )[:, 0, :]
        # don't re-link to self or to an existing friend
        d = np.where(cand_m == u_idx[:, None], np.inf, d)
        already = (cand_m[:, :, None] == adj[u_idx][:, None, :]).any(axis=2)
        d = np.where(already, np.inf, d)
        best = np.argmin(d, axis=1)
        best_d = d[np.arange(len(best)), best]
        repl = np.where(np.isfinite(best_d), cand_m[np.arange(len(best)), best], -1)
        out = np.where(is_del_link, -1, adj)
        out[u_idx, slot_idx] = repl
        # reverse edges repl -> u into free slots (link() adds both ways)
        for p in np.argsort(repl):  # group-stable fill
            r, u = repl[p], u_idx[p]
            if r < 0:
                continue
            row = out[r]
            if (row == u).any():
                continue
            free = np.nonzero(row < 0)[0]
            if free.size:
                out[r, free[0]] = u
        return out

    def _mask_deleted_rows(self) -> None:
        if self._deleted is None or not self._deleted.any():
            return
        pad = np.array(self.data.extra["pad"])  # copies: np.asarray views are read-only
        ids = np.array(self.data.ids)
        delf = np.zeros(pad.shape[0], bool)
        delf[: self._n_total] = self._deleted
        pad[delf] = np.float32(1e30)
        ids[delf] = -1
        self.data.extra["pad"] = jnp.asarray(pad)
        # dynamic row mask: deleted REAL rows must be masked in gather
        # paths, which otherwise derive masking from the static count
        # (ops/graph.py _row_pad); presence of this key switches modes
        # (and, being a pytree-structure change, retriggers jit traces)
        self.data.extra["row_mask"] = jnp.asarray(pad)
        self.data.ids = jnp.asarray(ids)

    def data_qty(self) -> int:
        n = self._n_total if self.graph is not None else len(self.store or [])
        return n - int(self._deleted.sum()) if self._deleted is not None else n

    # ---------------- persistence ----------------

    def state_arrays(self) -> dict:
        out = super().state_arrays()
        if self._deleted is not None:
            out["deleted"] = self._deleted.astype(np.int8)
        return out

    def restore(self, store: DataStore, state: dict, params: Params | None = None) -> None:
        super().restore(store, state, params)
        if "deleted" in state:
            self._deleted = np.asarray(state["deleted"]).astype(bool)
            self._mask_deleted_rows()
