"""simple_invindx — document-at-a-time (DAAT) top-k retrieval over
sparse vectors (reference: include/method/simple_inverted_index.h,
src/method/simple_inverted_index.cc).

The reference builds per-term posting lists sorted by doc id and merges
them document-at-a-time with a heap, accumulating query-value x
doc-value products; it works ONLY with the negdotprod_sparse_fast space
(simple_inverted_index.h:40-50) and only answers kNN (range throws).

TPU shape (round 4): a REAL posting-list engine (ops/inverted.py) —
128-aligned CSC posting blocks, host batch planning, block gathers +
scatter-add accumulation — whose per-query cost is proportional to the
query's posting mass like the reference's DAAT, not to the corpus size.
On the benchmark distribution one query touches ~85k postings at 1M
instead of the blocked scan's 64M (scripts/r4_taat_stats.py), so the
small-batch/latency regime this method exists for is ~2 orders of
magnitude faster than routing through the scan; at large batches the
batch term-union approaches the whole corpus and the scan formulation
wins — INVINDX_BACKEND="scan" keeps it as the A/B arm. dist_comps
counts documents with a non-empty posting intersection (what DAAT
touches); results contain only such documents (reference DAAT heap
semantics — a doc sharing no term never enters the heap).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..core.dataset import DataStore
from ..core.errors import IndexNotBuiltError, SpaceIncompatibleError
from ..core.params import ParamManager, Params
from ..core.registry import register_method
from ..ops import inverted as IV
from ..ops import topk as T
from .base import Method

#: "taat" = the posting-block engine (default); "scan" = the blocked
#: corpus scan (identical scores for touched docs; also returns
#: zero-overlap docs when k exceeds the touched count). Trace-time
#: module flag like napp.SCANCOUNT_BACKEND.
INVINDX_BACKEND = "taat"


@partial(jax.jit, static_argnames=("space", "k", "chunk"))
def _daat_knn(space, qenc, data, k: int, chunk: int):
    n_pad = data.ids.shape[0]
    b = qenc["qcol"].shape[0]
    # densify the query table ONCE outside the chunk scan: the in-body
    # scatter does NOT get hoisted out of lax.scan (r2_nprof lesson,
    # same manual hoist as seq_search/napp) — without it the [Q, V_pad]
    # table re-materialized per chunk, 10x-ing the wall and faulting
    # the TPU worker at 100k x 512q (round 4, r4_sparse.jsonl taat)
    from .seq_search import _densify_in_jit

    qenc = _densify_in_jit(space, qenc, data)

    # one scan does scoring + top-k + the DAAT touched-doc accounting.
    # (The former SEPARATE intersect-count sweep doubled the corpus work
    # per batch and was the prime suspect in two TPU worker faults at
    # 100k x 512q and 1M x 32q — r4_sparse.jsonl taat stage.) Touched is
    # counted as dot != 0: identical to the posting-intersection count
    # for positive-valued data; an exactly-cancelling mixed-sign overlap
    # would be uncounted (the TAAT backend counts the same way).
    def step(carry, ci):
        cd, cidx, nacc = carry
        xc = space.slice_data(data, ci * chunk, chunk)
        d = space.block(qenc, xc)
        cols = ci * chunk + jax.lax.broadcasted_iota(jnp.int32, (b, chunk), 1)
        nd_, ni_ = T.merge_topk(cd, cidx, d, cols, k)
        # padding rows carry the pad term (nonzero): mask them out
        nacc = nacc + jnp.sum((d != 0.0) & (cols < data.count), axis=1,
                              dtype=jnp.int32)
        return (nd_, ni_, nacc), None

    init = (
        jnp.full((b, k), T.INF, jnp.float32),
        jnp.full((b, k), -1, jnp.int32),
        jnp.zeros(b, jnp.int32),
    )
    (d, pos, nd), _ = jax.lax.scan(step, init, jnp.arange(n_pad // chunk))
    ids = jnp.where(pos >= 0, data.ids[jnp.clip(pos, 0, n_pad - 1)], -1)
    return d, ids, nd


@register_method("simple_invindx")
class SimpleInvIndex(Method):
    name = "simple_invindx"
    supports_range = False  # "Range search is not supported!" (reference)

    def __init__(self, space, params: Params | None = None):
        super().__init__(space, params)
        if space.name not in ("negdotprod_sparse", "negdotprod_sparse_fast"):
            raise SpaceIncompatibleError(
                "The method simple_invindx works only with the space "
                "negdotprod_sparse_fast"
            )
        pm = ParamManager(self.index_params)
        pm.get("dummyParam", 0, int)  # the reference's only index param
        pm.check_unused()

    def set_query_time_params(self, params: Params | None) -> None:
        pm = ParamManager(Params.of(params))
        pm.get("dummyParam", 0, int)
        pm.check_unused()
        super().set_query_time_params(params)

    def create_index(self, store: DataStore, params: Params | None = None) -> None:
        self.store = store
        n = max(len(store), 1)
        pref = getattr(self.space, "preferred_chunk", 256)
        chunk = max(8, min(pref, ((n + 7) // 8) * 8))
        self._chunk = ((chunk + 7) // 8) * 8
        self.data = self.space.encode_dataset(store, row_multiple=self._chunk)
        # the posting directory (host CSC build over the padded-CSR host
        # arrays; simple_inverted_index.cc:96-118 CreateIndex analog)
        self._inv = IV.build_postings(
            np.asarray(self.data.col), np.asarray(self.data.val),
            self.data.count, int(self.data.ids.shape[0]),
        )

    def _taat_tchunk(self) -> int:
        # the accumulator top-k pass reads [chunk, nq] score slices (no
        # [Q, C, nnz] blocks like the scan), so its chunk can be much
        # wider than preferred_chunk — pick the widest divisor of the
        # padded row count
        return next(c for c in (8192, 4096, 2048, 1024, 512, 256, 8)
                    if self._inv.n_rows % c == 0 and c <= self._inv.n_rows)

    def _taat_dispatch(self, points, k: int):
        """Enqueue the TAAT engine; returns a zero-arg finisher, or None
        when the backend/space can't take this batch. Packed transport
        (ops/qpack) by default: the plan rides ONE upload and the result
        ONE download — the eager path's five transfers dominated
        small-batch latency over a remote link (99 ms wall at nq=1 on 1M
        vs ~5-10 ms device; VERDICT r4 item 6)."""
        from ..ops import qpack as Q

        if INVINDX_BACKEND != "taat" or self._inv is None:
            return None
        qhost = self.space.encode_queries_host(points)
        if qhost is None:
            return None
        block_ids, ublock, w = IV.plan_batch(qhost["qcol"], qhost["qval"], self._inv)
        # top-k merges need k <= chunk lanes; clamp like the scan
        kk = min(k, self._inv.n_rows)
        tchunk = self._taat_tchunk()
        if Q.PACKED_QUERIES:
            buf, meta = Q.pack_host(
                {"block_ids": block_ids, "ublock": ublock, "w": w})
            packed, nd = IV.taat_topk_packed(
                self._inv.pdoc_blocks, self._inv.pval_blocks,
                jnp.asarray(buf), meta, self.data.ids, kk, tchunk,
            )
            self._add_dist_comps(nd)

            def finish():
                d, ids = Q.unpack_results(packed, kk)
                return self._taat_finalize(d, ids, k, kk)
        else:
            d_dev, ids_dev, nd = IV.taat_topk(
                self._inv.pdoc_blocks, self._inv.pval_blocks,
                jnp.asarray(block_ids), jnp.asarray(ublock),
                jnp.asarray(w), self.data.ids, kk, tchunk,
            )
            self._add_dist_comps(nd)

            def finish():
                return self._taat_finalize(
                    np.asarray(d_dev), np.asarray(ids_dev), k, kk)

        return finish

    def _taat_finalize(self, d, ids, k: int, kk: int):
        if kk < k:
            d = np.pad(d, ((0, 0), (0, k - kk)), constant_values=np.inf)
            ids = np.pad(ids, ((0, 0), (0, k - kk)), constant_values=-1)
        return self._finalize_knn(d, ids)

    def knn(self, points, k: int):
        if self.data is None:
            raise IndexNotBuiltError("simple_invindx: index not built")
        finish = self._taat_dispatch(points, k)
        if finish is not None:
            return finish()
        qenc = self.space.encode_queries(points)
        d, ids, nd = _daat_knn(self.space, qenc, self.data, k, self._chunk)
        self._add_dist_comps(nd)
        return self._finalize_knn(d, ids)

    def knn_async(self, points, k: int):
        """Async variant: dispatch now, materialize on call (the packed
        result stays on device until the finisher runs)."""
        if self.data is None:
            raise IndexNotBuiltError("simple_invindx: index not built")
        finish = self._taat_dispatch(points, k)
        if finish is not None:
            return finish
        return super().knn_async(points, k)
