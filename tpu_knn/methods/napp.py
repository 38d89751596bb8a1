"""NAPP — neighborhood approximation index (registry names napp /
pivot_neighb_invindx; reference: include/method/pivot_neighb_invindx.h,
src/method/pivot_neighb_invindx.cc, permutation_utils.h).

Reference algorithm: pick numPivot pivots; index every object under its
numPrefix closest pivots in chunked inverted files; at query time,
generate candidates by counting how often each object appears in the
posting lists of the query's numPrefixSearch closest pivots (ScanCount),
keep those appearing >= minTimes, then re-rank candidates with real
distances unless skipChecking.

TPU redesign: the inverted files disappear — the per-object pivot
prefix is a dense i32[N, numPrefix] array, and ScanCount becomes one
MXU matmul per corpus chunk: one-hot the chunk's prefixes [C, P+1] and
multiply by the query pivot-membership mask [Q, P+1] (exact integer
counts in f32; SCANCOUNT_BACKEND="gather" keeps the round-1
membership-gather formulation, which ran on the VPU and dominated the
1M query wall at 81 qps — r2_nprof.jsonl). Counting, candidate
masking, (masked) real-distance scoring, and the dist-comp accounting
all fuse into ONE streaming pass over the corpus; dist_comps counts
only mask-passing rows (the reference's "improvement in dist comp"
metric stays meaningful).

invProcAlg (scan/map/merge/pq/wand/store_sort) selects between CPU
candidate-generation strategies in the reference; here there is a single
fused implementation, so the value is accepted and ignored. dbScanFrac /
knnAmp are accepted for parity; minTimes is the operative knob.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..core.dataset import DataStore
from ..core.errors import IndexNotBuiltError, InvalidArgumentError
from ..core.params import ParamManager, Params
from ..core.registry import register_method
from ..ops import qpack as QP
from ..ops import topk as T
from ..ops.topk import INF
from ..utils.logging import log
from ..utils.rng import np_rng
from .base import Method, stream_range_results
from .vptree import _gather_xc

#: ScanCount backend: "mxu" one-hots each chunk's pivot prefixes and
#: counts via one matmul against the query pivot-membership mask;
#: "gather" is the [Q, C, numPrefix] membership-gather formulation
#: (VPU-bound — it dominated the 1M NAPP query at 81 qps, r2_nprof).
#: Module flag for on-chip A/B; both produce identical integer counts.
#: Read at TRACE time: set it before the first napp query of the
#: process (jit caches don't key on it) — the A/B harness runs one
#: backend per process, like GROUPMIN_BACKEND.
SCANCOUNT_BACKEND = "mxu"


@partial(
    jax.jit,
    static_argnames=(
        "space", "qmeta", "k", "chunk", "min_times", "skip_checking",
        "prefix_search",
    ),
)
def _napp_knn_packed(
    space, qbuf, qmeta, data, pivot_rows, prefix, k: int, chunk: int,
    min_times: int, skip_checking: bool, prefix_search: int,
):
    """Packed-transport NAPP search (ops/qpack.py): one query upload,
    one bitcast-packed result download — see methods/hnsw.py
    _hnsw_search_packed for the round-trip economics."""
    qenc = space.complete_queries(QP.unpack_device(qbuf, qmeta))
    d, ids, nd = _napp_knn(
        space, qenc, data, pivot_rows, prefix, k, chunk, min_times,
        skip_checking, prefix_search,
    )
    return QP.pack_results(d, ids), nd


@partial(jax.jit, static_argnames=("space", "k", "chunk", "min_times", "skip_checking", "prefix_search"))
def _napp_knn(
    space,
    qenc,
    data,
    pivot_rows,  # i32[P] corpus rows of the pivots
    prefix,  # i32[n_pad, numPrefix] pivot ids per object (-1 pad rows)
    k: int,
    chunk: int,
    min_times: int,
    skip_checking: bool,
    prefix_search: int,
):
    n_pad = data.ids.shape[0]
    p = pivot_rows.shape[0]
    # shared prelude: densified queries (the [Q, V_pad] sparse table is
    # hoisted out of the chunk scan — r2_nprof showed it re-materializing
    # per iteration otherwise) + the ScanCount chunk_counts closure
    qenc, b, chunk_counts = _napp_candidate_prelude(
        space, qenc, data, pivot_rows, prefix, chunk, prefix_search)
    # per-query counts: a 2048-query batch over a 1M corpus can exceed
    # int32 in total; the host sums per-query i32 in int64 (methods/base.py)
    ndist = jnp.full((b,), p, jnp.int32)

    # one scan does candidate generation + re-ranking + the dist-comp
    # accounting (the accounting used to re-run the count pass a second
    # time over the whole corpus)
    def step(carry, ci):
        cd0, ci0, nacc = carry
        count = chunk_counts(ci)
        cand = count >= min_times
        if skip_checking:
            # rank by count (proxy distance), no real distance evaluations
            d = jnp.where(cand, -count, INF)
        else:
            xcc = space.slice_data(data, ci * chunk, chunk)
            d = jnp.where(cand, space.block(qenc, xcc), INF)
            nacc = nacc + jnp.sum(cand, axis=1, dtype=jnp.int32)
        cols = ci * chunk + jax.lax.broadcasted_iota(jnp.int32, (b, chunk), 1)
        nd_, ni_ = T.merge_topk(cd0, ci0, d, cols, k)
        return (nd_, ni_, nacc), None

    init = (
        jnp.full((b, k), INF, jnp.float32),
        jnp.full((b, k), -1, jnp.int32),
        jnp.zeros(b, jnp.int32),
    )
    (cd, cpos, ncand), _ = jax.lax.scan(step, init, jnp.arange(n_pad // chunk))
    ndist = ndist + ncand
    ids = jnp.where(cpos >= 0, data.ids[jnp.clip(cpos, 0, n_pad - 1)], -1)
    return cd, ids, ndist


@partial(
    jax.jit,
    static_argnames=(
        "space", "qmeta", "k", "chunk", "min_times", "prefix_search", "keep",
        "cand_chunk",
    ),
)
def _napp_knn_gathered_packed(
    space, qbuf, qmeta, data, pivot_rows, prefix, k: int, chunk: int,
    min_times: int, prefix_search: int, keep: int, cand_chunk: int,
):
    qenc = space.complete_queries(QP.unpack_device(qbuf, qmeta))
    d, ids, nd = _napp_knn_gathered(
        space, qenc, data, pivot_rows, prefix, k, chunk, min_times,
        prefix_search, keep, cand_chunk,
    )
    return QP.pack_results(d, ids), nd


@partial(
    jax.jit,
    static_argnames=(
        "space", "k", "chunk", "min_times", "prefix_search", "keep",
        "cand_chunk",
    ),
)
def _napp_knn_gathered(
    space, qenc, data, pivot_rows, prefix, k: int, chunk: int,
    min_times: int, prefix_search: int, keep: int, cand_chunk: int,
):
    """Candidate-GATHERED rerank (VERDICT r4 item 2; reference workhorse
    pivot_neighb_invindx.cc:295-340 candidate generation + rerank).

    The fused scan (_napp_knn) evaluates the exact distance for EVERY
    corpus row and masks non-candidates, so its qps is pinned at the
    full-scan rate (~330 at 1M sparse) no matter how few candidates
    ScanCount admits. Here the exact scoring touches only candidates:

    Pass A (sort-based per-chunk compaction): per corpus chunk, keep the
    ``keep`` best candidate positions by ScanCount count (a [Q, chunk]
    sort — count is the proxy priority, exactly the reference's
    sorted-by-frequency candidate ordering); the per-chunk winners
    concatenate into a fixed [Q, num_chunks*keep] candidate table.
    ``keep`` is sized from dbScanFrac (the reference's candidate-budget
    knob, operative here), so a chunk with more candidates than
    ``keep`` truncates lowest-count first.

    Pass B: gather-and-score only those candidates per query
    (ops/graph.score_rows — the sparse gathered_block take_along_axis
    path) in ``cand_chunk`` column slices, streaming top-k.
    """
    n_pad = data.ids.shape[0]
    p = pivot_rows.shape[0]
    qenc, b, chunk_counts = _napp_candidate_prelude(
        space, qenc, data, pivot_rows, prefix, chunk, prefix_search)
    num_chunks = n_pad // chunk

    def step_a(nacc, ci):
        count = chunk_counts(ci)
        cand = count >= min_times
        dd = jnp.where(cand, -count, INF)
        cols = ci * chunk + jax.lax.broadcasted_iota(jnp.int32, (b, chunk), 1)
        cc, cpos = T.smallest_k(dd, keep, cols)
        cpos = jnp.where(jnp.isinf(cc), -1, cpos)
        # dist-comp accounting = candidates actually scored in pass B
        return nacc + jnp.sum(cpos >= 0, axis=1, dtype=jnp.int32), cpos

    ncand, cpos = jax.lax.scan(
        step_a, jnp.zeros(b, jnp.int32), jnp.arange(num_chunks))
    cpos = jnp.moveaxis(cpos, 0, 1).reshape(b, num_chunks * keep)
    # pad the candidate table to a cand_chunk multiple with -1 (scores
    # +INF) — overlapping tail slices would double-score rows and
    # duplicate ids in the top-k
    total = num_chunks * keep
    pad_cols = (-total) % cand_chunk
    if pad_cols:
        cpos = jnp.pad(cpos, ((0, 0), (0, pad_cols)), constant_values=-1)
    corpus = space.corpus_dict(data)
    from ..ops import graph as G

    def step_b(carry, cj):
        cd0, ci0 = carry
        pos = jax.lax.dynamic_slice_in_dim(cpos, cj * cand_chunk, cand_chunk, 1)
        d = G.score_rows(space, qenc, corpus, pos)
        return T.merge_topk(cd0, ci0, d, pos, k), None

    init = (
        jnp.full((b, k), INF, jnp.float32),
        jnp.full((b, k), -1, jnp.int32),
    )
    (cd, cpos_k), _ = jax.lax.scan(
        step_b, init, jnp.arange((total + pad_cols) // cand_chunk))
    ids = jnp.where(cpos_k >= 0, data.ids[jnp.clip(cpos_k, 0, n_pad - 1)], -1)
    return cd, ids, ncand + p


def _napp_candidate_prelude(space, qenc, data, pivot_rows, prefix,
                            chunk: int, prefix_search: int):
    """Shared front of the kNN and range scans: densified queries, the
    query pivot-membership mask, and a ``chunk_counts(ci)`` closure
    producing exact integer ScanCount values per corpus chunk."""
    p = pivot_rows.shape[0]
    b = next(v.shape[0] for v in qenc.values() if hasattr(v, "ndim") and v.ndim >= 1)
    from .seq_search import _densify_in_jit

    qenc = _densify_in_jit(space, qenc, data)
    xc = _gather_xc(space, data, pivot_rows)
    dq = space.block(qenc, xc)  # [Q, P]
    _, qtop = jax.lax.top_k(-dq, min(prefix_search, p))  # [Q, S]
    qmask = jnp.zeros((b, p + 1), bool).at[jnp.arange(b)[:, None], qtop].set(True)
    qmask_f = qmask.astype(jnp.float32)

    def chunk_counts(ci):
        pfx = jax.lax.dynamic_slice_in_dim(prefix, ci * chunk, chunk, 0)
        safe = jnp.where(pfx >= 0, pfx, p)  # pad slots hit the dead column p
        if SCANCOUNT_BACKEND == "mxu":
            rows = jax.lax.broadcasted_iota(jnp.int32, safe.shape, 0)
            oneh = jnp.zeros((safe.shape[0], p + 1), jnp.float32).at[
                rows, safe
            ].add(1.0, mode="drop")
            return jnp.einsum(
                "qp,cp->qc", qmask_f, oneh,
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32,
            )
        hits = qmask[:, safe]  # [Q, C, numPrefix]
        return jnp.sum(hits, axis=2).astype(jnp.float32)

    return qenc, b, chunk_counts


@partial(jax.jit, static_argnames=("space", "chunk", "min_times", "prefix_search"))
def _napp_range_counts(space, qenc, data, pivot_rows, prefix, radius,
                       chunk: int, min_times: int, prefix_search: int):
    """Pass 1 of the NAPP range query: per-query candidate-hit counts
    within ``radius`` (i32[Q]) plus the dist-comp tally. The reference
    answers range queries through the same candidate-generation + exact
    check path as kNN (pivot_neighb_invindx.cc:783-785: GenSearch(query,
    0) -> CheckAndAddToResult with real distances)."""
    qenc, b, chunk_counts = _napp_candidate_prelude(
        space, qenc, data, pivot_rows, prefix, chunk, prefix_search)
    num_chunks = data.ids.shape[0] // chunk

    def step(carry, ci):
        hits, nacc = carry
        cand = chunk_counts(ci) >= min_times
        d = jnp.where(cand, space.block(qenc, space.slice_data(data, ci * chunk, chunk)), INF)
        hits = hits + jnp.sum((d <= radius).astype(jnp.int32), axis=1)
        nacc = nacc + jnp.sum(cand, axis=1, dtype=jnp.int32)
        return (hits, nacc), None

    init = (jnp.zeros(b, jnp.int32), jnp.zeros(b, jnp.int32))
    (hits, ncand), _ = jax.lax.scan(step, init, jnp.arange(num_chunks))
    return hits, ncand + pivot_rows.shape[0]


@partial(jax.jit, static_argnames=("space", "cap", "chunk", "min_times", "prefix_search"))
def _napp_range_collect(space, qenc, data, pivot_rows, prefix, radius,
                        cap: int, chunk: int, min_times: int, prefix_search: int):
    """Pass 2: ascending ([Q, cap] dists, positions) of candidate hits
    within ``radius`` — streaming smallest-cap merge, O(Q*(cap+chunk))
    device memory like the seq_search range scan."""
    qenc, b, chunk_counts = _napp_candidate_prelude(
        space, qenc, data, pivot_rows, prefix, chunk, prefix_search)
    num_chunks = data.ids.shape[0] // chunk

    def chunk_dists(ci):
        cand = chunk_counts(ci) >= min_times
        d = jnp.where(cand, space.block(qenc, space.slice_data(data, ci * chunk, chunk)), INF)
        return jnp.where(d <= radius, d, INF)

    return T.streaming_smallest_k(chunk_dists, num_chunks, chunk, b, cap)


@register_method("napp")
@register_method("pivot_neighb_invindx")
class Napp(Method):
    name = "napp"
    supports_range = True

    def __init__(self, space, params: Params | None = None):
        super().__init__(space, params)
        pm = ParamManager(self.index_params)
        self.num_pivot = pm.get("numPivot", 512, int)
        self.num_prefix = pm.get_synonym(["numPrefix", "numPivotIndex"], 32, int)
        pm.get("chunkIndexSize", 65536, int)  # parity no-op: no chunked postings
        pm.get("indexThreadQty", 0, int)  # parity no-op
        pm.get("recreatePoints", False, bool)  # parity no-op
        pm.get("hashTrickDim", 0, int)  # parity no-op
        self.pivot_file = pm.get("pivotFile", "", str)
        self.seed = pm.get("seed", 0, int)
        pm.check_unused()
        # query-time defaults (pivot_neighb_invindx.cc:295-340)
        self.num_prefix_search = self.num_prefix
        self.min_times = 2
        self.skip_checking = False
        self.db_scan_frac = 0.05
        self.inv_proc_alg = "scan"
        self._prefix = None

    def set_query_time_params(self, params: Params | None) -> None:
        if params is None:
            # ResetQueryTimeParams (pivot_neighb_invindx.cc defaults)
            self.num_prefix_search = self.num_prefix
            self.min_times = 2
            self.skip_checking = False
            self.db_scan_frac = 0.05
            self.inv_proc_alg = "scan"
            super().set_query_time_params(None)
            return
        pm = ParamManager(Params.of(params))
        self.num_prefix_search = pm.get("numPrefixSearch", self.num_prefix_search, int)
        self.min_times = pm.get("minTimes", self.min_times, int)
        self.skip_checking = pm.get("skipChecking", self.skip_checking, bool)
        # operative for the gathered rerank: candidate budget fraction
        # (reference: dbScanFrac bounds the candidate pool the same way,
        # pivot_neighb_invindx.cc:295-340); ignored by the fused scan
        self.db_scan_frac = pm.get("dbScanFrac", self.db_scan_frac, float)
        pm.get("knnAmp", 0, int)  # parity no-op
        # "scan" = fused masked whole-corpus scan; "gather" (extension) =
        # sort-compacted candidate table + gathered exact rescore —
        # candidate-proportional, the serving path for big sparse corpora
        self.inv_proc_alg = pm.get("invProcAlg", self.inv_proc_alg, str)
        if self.inv_proc_alg not in ("scan", "gather"):
            raise InvalidArgumentError(
                f"invProcAlg={self.inv_proc_alg!r}: this build implements "
                "'scan' (fused) and 'gather' (candidate-gathered rerank)")
        pm.get("useSort", False, bool)  # parity no-op
        pm.check_unused()
        super().set_query_time_params(params)

    # ---------------- construction ----------------

    def create_index(self, store: DataStore, params: Params | None = None) -> None:
        self.store = store
        n = len(store)
        pref = getattr(self.space, "preferred_chunk", 8192)
        chunk = max(8, min(pref, ((max(n, 1) + 7) // 8) * 8))
        self._chunk = ((chunk + 7) // 8) * 8
        self.data = self.space.encode_dataset(store, row_multiple=self._chunk)
        if n == 0:
            self._prefix = None
            return
        rng = np_rng(self.seed)
        p = min(self.num_pivot, n)
        if self.pivot_file:
            piv = np.loadtxt(self.pivot_file, dtype=np.int64).reshape(-1)[:p]
            if piv.size and (piv.min() < 0 or piv.max() >= n):
                # negatives would clip to row 0 with an INF pad — a
                # silently inert pivot — so reject them like overflows
                raise InvalidArgumentError("pivotFile contains out-of-range positions")
        else:
            piv = rng.choice(n, size=p, replace=False)
        self._pivot_rows = jnp.asarray(piv.astype(np.int32))
        npfx = min(self.num_prefix, p)
        self._npfx = npfx

        # per-object prefix: numPrefix closest pivots. The corpus is
        # encoded as queries ONCE (round 1 re-packed every 4096-point
        # chunk on host — the 1M build bottleneck) and sliced on device
        # per step; _gather_xc carries vocab_mark so sparse scoring runs
        # dense-after-scatter on the MXU, not sorted lookups.
        points = self.space.store_as_query_points(store)
        n_pad = self.data.ids.shape[0]
        prefix = np.full((n_pad, npfx), -1, np.int32)
        xc_piv = _gather_xc(self.space, self.data, self._pivot_rows)
        qenc_all = self.space.encode_queries(points)
        step = 4096
        for lo in range(0, n, step):
            hi = min(lo + step, n)
            qenc = {
                k: (v[lo:hi] if hasattr(v, "ndim") and v.ndim >= 1 and v.shape[0] >= n else v)
                for k, v in qenc_all.items()
            }
            d = _pivot_dists(self.space, qenc, xc_piv)  # [hi-lo, P]
            _, top = jax.lax.top_k(-d, npfx)
            prefix[lo:hi] = np.asarray(top)
        self._prefix = jnp.asarray(prefix)
        log("DEBUG", f"napp built: n={n} pivots={p} prefix={npfx}")

    # ---------------- search ----------------

    def _gather_plan(self, k: int) -> tuple[int, int]:
        """(keep, cand_chunk) for the gathered rerank: the dbScanFrac
        candidate budget spread uniformly over the corpus chunks (8-
        rounded so the compaction sort stays lane-aligned)."""
        n = int(self.data.count)
        n_pad = self.data.ids.shape[0]
        num_chunks = max(n_pad // self._chunk, 1)
        budget = max(int(self.db_scan_frac * n), k, 8)
        keep = min(self._chunk, max(8, -(-budget // num_chunks)))
        keep = ((keep + 7) // 8) * 8
        cand_chunk = min(4096, ((num_chunks * keep + 7) // 8) * 8)
        return keep, cand_chunk

    def _packed_dispatch(self, points, k: int):
        qhost = self.space.encode_queries_host(points)
        if qhost is None:
            return None
        buf, meta = QP.pack_host(qhost)
        nps = min(self.num_prefix_search, self._pivot_rows.shape[0])
        if self.inv_proc_alg == "gather" and not self.skip_checking:
            keep, cand_chunk = self._gather_plan(k)
            packed, nd = _napp_knn_gathered_packed(
                self.space, jnp.asarray(buf), meta, self.data,
                self._pivot_rows, self._prefix, k, self._chunk,
                self.min_times, nps, keep, cand_chunk,
            )
        else:
            packed, nd = _napp_knn_packed(
                self.space, jnp.asarray(buf), meta, self.data,
                self._pivot_rows, self._prefix, k, self._chunk,
                self.min_times, self.skip_checking, nps,
            )
        self._add_dist_comps(nd)
        return packed

    def knn_async(self, points, k: int):
        if self._prefix is None:
            raise IndexNotBuiltError("napp: index not built")
        if QP.PACKED_QUERIES:
            packed = self._packed_dispatch(points, k)
            if packed is not None:
                return lambda: self._finalize_knn(*QP.unpack_results(packed, k))
        return super().knn_async(points, k)

    def knn(self, points, k: int):
        if self._prefix is None:
            raise IndexNotBuiltError("napp: index not built")
        if QP.PACKED_QUERIES:
            packed = self._packed_dispatch(points, k)
            if packed is not None:
                return self._finalize_knn(*QP.unpack_results(packed, k))
        qenc = self.space.encode_queries(points)
        nps = min(self.num_prefix_search, self._pivot_rows.shape[0])
        if self.inv_proc_alg == "gather" and not self.skip_checking:
            keep, cand_chunk = self._gather_plan(k)
            d, ids, nd = _napp_knn_gathered(
                self.space, qenc, self.data, self._pivot_rows, self._prefix,
                k, self._chunk, self.min_times, nps, keep, cand_chunk,
            )
        else:
            d, ids, nd = _napp_knn(
                self.space, qenc, self.data, self._pivot_rows, self._prefix,
                k, self._chunk, self.min_times, self.skip_checking, nps,
            )
        self._add_dist_comps(nd)
        return self._finalize_knn(d, ids)

    def range(self, points, radius: float):
        """Approximate range search through the kNN candidate pipeline
        (reference parity: pivot_neighb_invindx.cc:783-785 routes range
        queries through GenSearch(query, 0) — ScanCount candidates with
        >= minTimes shared prefix pivots, then an exact radius check).
        Like the reference's, results within the radius that never make
        the candidate set are missed; seq_search.range is the exact
        oracle."""
        if self._prefix is None:
            raise IndexNotBuiltError("napp: index not built")
        qenc = self.space.encode_queries(points)
        pfx_s = min(self.num_prefix_search, self._pivot_rows.shape[0])
        counts, nd = _napp_range_counts(
            self.space, qenc, self.data, self._pivot_rows, self._prefix,
            float(radius), self._chunk, self.min_times, pfx_s,
        )
        counts = np.asarray(counts)
        self._add_dist_comps(nd)
        return stream_range_results(
            counts,
            self.data,
            lambda cap: _napp_range_collect(
                self.space, qenc, self.data, self._pivot_rows, self._prefix,
                float(radius), cap, self._chunk, self.min_times, pfx_s,
            ),
        )

    # ---------------- persistence ----------------

    def state_arrays(self) -> dict:
        if self._prefix is None:
            return {}
        return {
            "pivot_rows": np.asarray(self._pivot_rows),
            "prefix": np.asarray(self._prefix),
            "meta": np.asarray([self._chunk, self._npfx]),
        }

    def restore(self, store: DataStore, state: dict, params: Params | None = None) -> None:
        if not state:
            self.create_index(store, params)
            return
        self.store = store
        self._chunk = int(state["meta"][0])
        self._npfx = int(state["meta"][1])
        self.data = self.space.encode_dataset(store, row_multiple=self._chunk)
        self._pivot_rows = jnp.asarray(state["pivot_rows"])
        self._prefix = jnp.asarray(state["prefix"])


@partial(jax.jit, static_argnames=("space",))
def _pivot_dists(space, qenc, xc_piv):
    return space.block(qenc, xc_piv)
