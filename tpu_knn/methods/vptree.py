"""VP-tree with the learned "stretched triangle inequality" pruner
(reference: include/method/vptree.h, src/method/vptree.cc,
include/searchoracle.h PolynomialPruner).

TPU redesign (SURVEY.md §7): the recursive build becomes *level-
synchronous* — at each depth every node picks a random pivot and all
pivot->subset distances at that depth are computed in one blocked
call; the median split then yields a perfectly balanced implicit
binary tree over a corpus permutation, so leaves are contiguous
slices.

Search replaces the recursive branch-and-bound with three batched
phases:
  1. one [Q, n_internal] block for all query->pivot distances,
  2. greedy descent to each query's home leaf -> scan it -> initial
     radius r (the kth best),
  3. level-by-level visit masks with the exact pruner rule
     (searchoracle.h:163-186: visit ONLY left if dq <= M and
     r < alphaLeft*(M-dq)^expLeft, ONLY right in the mirrored case,
     both otherwise), then one masked distance pass over the union of
     visited leaves — or, when ``maxLeavesToVisit`` bounds the visit
     set tightly enough, a GATHERED pass that scores only each query's
     selected leaves' rows (O(Q*maxLeaves*leaf_cap) work instead of
     O(Q*N)); without it the pruner changed the mask but never the
     work, so qps was flat in alpha (79 qps at 1M).

Because phase 3 prunes with the phase-2 radius (>= the reference's
evolving radius), the visited set is a superset of the reference's:
recall can only match or exceed it at equal parameters.
``maxLeavesToVisit`` caps visited leaves per query in left-to-right
order, mirroring the reference's traversal-order cap (vptree.cc:417).
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..core.dataset import DataStore
from ..core.errors import IndexNotBuiltError
from ..core.params import ParamManager, Params
from ..core.registry import register_method
from ..ops import topk as T
from ..ops.topk import INF
from ..utils.logging import log
from ..utils.rng import np_rng
from .base import Method, stream_range_results


@partial(
    jax.jit,
    static_argnames=(
        "space", "depth", "leaf_cap", "k", "max_leaves", "chunk", "gathered"
    ),
)
def _vptree_knn(
    space,
    qenc,
    data,
    pivot_pos,  # i32[n_internal] corpus row of each internal node (heap order, 1-based)
    medians,  # f32[n_internal]
    leaf_members,  # i32[n_leaves, leaf_cap] corpus rows (-1 pad)
    leaf_of,  # i32[n_pad] corpus row -> leaf id (-1 for pivots/padding)
    leaf_count,  # i32[n_leaves]
    pruner,  # f32[4]: alphaL, expL, alphaR, expR
    depth: int,
    leaf_cap: int,
    k: int,
    max_leaves: int,
    chunk: int,
    gathered: bool = False,
):
    n_internal = pivot_pos.shape[0]
    n_leaves = leaf_members.shape[0]
    n_pad = data.ids.shape[0]
    b = next(v.shape[0] for v in qenc.values() if hasattr(v, "ndim") and v.ndim >= 1)
    # sparse: densify the query table ONCE before any chunk scan /
    # gathered step — XLA does not hoist the loop-invariant scatter
    # out of lax.scan bodies (measured ~2.9 s/batch of per-iteration
    # [Q, V_pad] copies at 1M before the napp hoist, r2_nprof.jsonl)
    from .seq_search import _densify_in_jit

    qenc = _densify_in_jit(space, qenc, data)

    # phase 1: all query->pivot distances in one masked gather-block
    xc = _gather_xc(space, data, pivot_pos)
    dpiv = space.block(qenc, xc)  # [Q, n_internal]
    # dist counts are PER QUERY (each < 2^31; the batch total can exceed
    # int32 at 2048 queries x 1M corpus — summed in int64 on host)
    ndist = jnp.full((b,), n_internal, jnp.int32)

    # phase 2: home-leaf descent + initial radius
    node = jnp.ones(b, jnp.int32)
    for _ in range(depth):
        dq = jnp.take_along_axis(dpiv, node[:, None] - 1, 1)[:, 0]
        med = medians[node - 1]
        node = jnp.where(dq <= med, 2 * node, 2 * node + 1)
    home_leaf = node - (n_internal + 1)  # [Q]
    home = leaf_members[jnp.clip(home_leaf, 0, n_leaves - 1)]  # [Q, leaf_cap]
    dh = _score_members(space, qenc, data, home)
    ndist = ndist + jnp.sum(home >= 0, axis=1)
    kk = min(k, leaf_cap)
    init_d, init_pos = T.smallest_k(dh, kk, jnp.where(home >= 0, home, -1))
    if kk < k:
        init_d = jnp.pad(init_d, ((0, 0), (0, k - kk)), constant_values=jnp.inf)
        init_pos = jnp.pad(init_pos, ((0, 0), (0, k - kk)), constant_values=-1)
    # pivots also participate in results (they are real points)
    piv_d, piv_pos = T.smallest_k(dpiv, min(k, n_internal), pivot_pos)
    r = jnp.minimum(init_d[:, -1], piv_d[:, -1] if k <= n_internal else INF)

    # phase 3: per-leaf pruner bounds (the smallest radius that reaches
    # each leaf); visit mask = bound <= r. The capped paths below spend
    # the leaf budget in ASCENDING-BOUND order — the reference's
    # pruner-guided recursion order (vptree.cc:417-470), not index order
    prio = _vptree_leaf_bounds(dpiv, medians, pruner, depth)
    visit = prio <= r[:, None]

    if gathered:
        # phase 4 (gathered): each query gathers ONLY its ``max_leaves``
        # best-bound visited leaves' member rows and scores them — work
        # is O(Q * max_leaves * leaf_cap) instead of the masked path's
        # O(Q * N) full-corpus pass, which made qps FLAT in the pruner
        # (a 1M scan per batch regardless of alpha). Leaf groups stream
        # through a lax.scan with a running top-k so gather temporaries
        # stay bounded.
        lidx = jax.lax.broadcasted_iota(jnp.int32, visit.shape, 1)
        key = jnp.where(visit, prio, INF)
        # stable sort: ties (e.g. the all-zero-bound home path) keep
        # ascending leaf id, so the order is deterministic
        skey, sid = jax.lax.sort((key, lidx), num_keys=1)
        sel = jnp.where(
            skey[:, :max_leaves] < INF, sid[:, :max_leaves], n_leaves
        )  # [Q, L] best-bound leaf ids; n_leaves = no more visits
        # gathered rows per step ~4k, but never more leaves than the cap
        # (grp > max_leaves would pad sel with sentinels that still get
        # gathered and scored-to-INF — ~8x wasted work at max_leaves=8)
        grp = max(1, min(max_leaves, 4096 // leaf_cap))
        steps = (max_leaves + grp - 1) // grp
        if steps * grp > max_leaves:
            sel = jnp.pad(sel, ((0, 0), (0, steps * grp - max_leaves)),
                          constant_values=n_leaves)
        corpus = space.corpus_dict(data)
        from ..ops.graph import score_rows

        def gstep(carry, si):
            cd0, ci0, nvis = carry
            lf = jax.lax.dynamic_slice_in_dim(sel, si * grp, grp, 1)
            ok = lf < n_leaves
            rows = leaf_members[jnp.clip(lf, 0, n_leaves - 1)]  # [Q,G,cap]
            rows = jnp.where(ok[:, :, None], rows, -1).reshape(b, grp * leaf_cap)
            dly = score_rows(space, qenc, corpus, rows)
            nd_, ni_ = T.merge_topk(cd0, ci0, dly, rows, k)
            nvis = nvis + jnp.sum(
                jnp.where(ok, leaf_count[jnp.clip(lf, 0, n_leaves - 1)], 0),
                axis=1,
            )
            return (nd_, ni_, nvis), None

        init = (
            jnp.full((b, k), INF, jnp.float32),
            jnp.full((b, k), -1, jnp.int32),
            jnp.zeros(b, jnp.int32),
        )
        (cd, cpos, nvis), _ = jax.lax.scan(gstep, init, jnp.arange(steps))
        # selected-leaf totals (home leaf counted in both phases, like
        # the masked path's visit*leaf_count sum)
        ndist = ndist + nvis
        all_d = jnp.concatenate([init_d, piv_d, cd], axis=1)
        all_p = jnp.concatenate([init_pos, piv_pos, cpos], axis=1)
        md, mpos = _dedup_topk(all_d, all_p, k)
        ids = jnp.where(
            mpos >= 0, data.ids[jnp.clip(mpos, 0, data.ids.shape[0] - 1)], -1
        )
        return md, ids, ndist

    # maxLeavesToVisit cap in pruner-bound order (vptree.cc
    # MaxLeavesToVisit spends its budget in recursion order — the
    # best-bound subtrees first, not left-to-right)
    if max_leaves < n_leaves:
        lidx = jax.lax.broadcasted_iota(jnp.int32, visit.shape, 1)
        key = jnp.where(visit, prio, INF)
        _, sid = jax.lax.sort((key, lidx), num_keys=1)
        rank = (
            jnp.zeros(visit.shape, jnp.int32)
            .at[jnp.arange(visit.shape[0])[:, None], sid]
            .set(jnp.broadcast_to(lidx, visit.shape))
        )
        visit = visit & (rank < max_leaves)

    # phase 4: masked streaming scan over the union of visited leaves
    # (memory-light: never materializes more than one [Q, chunk] block)
    def chunk_dists(ci):
        xcc = space.slice_data(data, ci * chunk, chunk)
        d = space.block(qenc, xcc)
        lf = jax.lax.dynamic_slice_in_dim(leaf_of, ci * chunk, chunk, 0)
        vis = (
            jnp.take_along_axis(
                visit, jnp.clip(lf, 0, n_leaves - 1)[None, :].repeat(b, 0), 1
            )
            & (lf >= 0)[None, :]
        )
        return jnp.where(vis, d, INF)

    cd, cpos = T.streaming_smallest_k(chunk_dists, n_pad // chunk, chunk, b, k)
    ndist = ndist + jnp.sum(visit * leaf_count[None, :], axis=1)

    # merge the three result sets; dedup on the FULL concatenation before
    # truncating to k (the home leaf is scored both in phase 2 and 4)
    all_d = jnp.concatenate([init_d, piv_d, cd], axis=1)
    all_p = jnp.concatenate([init_pos, piv_pos, cpos], axis=1)
    md, mpos = _dedup_topk(all_d, all_p, k)
    ids = jnp.where(mpos >= 0, data.ids[jnp.clip(mpos, 0, data.ids.shape[0] - 1)], -1)
    return md, ids, ndist


def _vptree_leaf_bounds(dpiv, medians, pruner, depth: int):
    """Per-(query, leaf) pruner bound: the smallest ball radius that
    reaches the leaf — max over the leaf's root path of the crossing
    cost ``a*diff**e`` at every level where the leaf sits on the far
    side of the median. The visit rule of searchoracle.h:163-186 is
    exactly ``bound <= r`` (prune iff r < a*diff**e at some crossing),
    and ascending bound APPROXIMATES (and likely dominates) the
    reference's recursion-order budget: vptree.cc:417-470 recurses
    depth-first into the query's side first, so it exhausts the home
    subtree's reachable leaves before any far-root subtree even when a
    far leaf has a lower crossing bound — globally best-bound spending
    is not that order, but it selects leaves at least as promising per
    unit budget (the round-2 index-order cap scored 0.26-0.40 recall at
    alpha=1 because it spent the budget left-to-right instead)."""
    b = dpiv.shape[0]
    aL, eL, aR, eR = pruner[0], pruner[1], pruner[2], pruner[3]
    prio = jnp.zeros((b, 1), jnp.float32)
    for lvl in range(depth):
        lo = (1 << lvl) - 1
        width = 1 << lvl
        dq = jax.lax.dynamic_slice_in_dim(dpiv, lo, width, 1)
        med = jax.lax.dynamic_slice_in_dim(medians, lo, width, 0)[None, :]
        diffL = jnp.maximum(med - dq, 0.0)
        diffR = jnp.maximum(dq - med, 0.0)
        # entering the RIGHT child from the left side costs aL*diffL**eL
        # (the original mask's left_only prune), and vice versa; the
        # containing side costs 0
        costR = jnp.where(dq <= med, aL * diffL**eL, 0.0)
        costL = jnp.where(dq >= med, aR * diffR**eR, 0.0)
        prio = jnp.stack(
            [jnp.maximum(prio, costL), jnp.maximum(prio, costR)], axis=2
        ).reshape(b, 2 * width)
    return prio


def _vptree_visit_masks(dpiv, medians, r, pruner, depth: int):
    """Per-query leaf visit masks for a fixed ball radius ``r`` [Q] —
    the phase-3 pruner rule of _vptree_knn (searchoracle.h Polynomial
    Pruner; with alpha=exp=1 it is the exact triangle-inequality rule:
    skip the right child iff r < median - d(q,pivot), etc.). Derived
    from the leaf bounds: visited iff no path crossing needs a radius
    above ``r``."""
    return _vptree_leaf_bounds(dpiv, medians, pruner, depth) <= r[:, None]


@partial(jax.jit, static_argnames=("space", "depth", "chunk"))
def _vptree_range_counts(
    space, qenc, data, pivot_pos, medians, leaf_of, leaf_count, pruner,
    radius, depth: int, chunk: int,
):
    """Pruned range pass 1: per-query hit counts (leaves + pivots) and
    the distance-computation total, without materializing [Q, N]."""
    n_internal = pivot_pos.shape[0]
    n_leaves = 1 << depth
    b = next(v.shape[0] for v in qenc.values() if hasattr(v, "ndim") and v.ndim >= 1)
    # sparse: densify the query table ONCE before any chunk scan /
    # gathered step — XLA does not hoist the loop-invariant scatter
    # out of lax.scan bodies (measured ~2.9 s/batch of per-iteration
    # [Q, V_pad] copies at 1M before the napp hoist, r2_nprof.jsonl)
    from .seq_search import _densify_in_jit

    qenc = _densify_in_jit(space, qenc, data)
    xc = _gather_xc(space, data, pivot_pos)
    dpiv = space.block(qenc, xc)  # [Q, n_internal]
    r = jnp.full(b, radius, jnp.float32)
    visit = _vptree_visit_masks(dpiv, medians, r, pruner, depth)

    def step(acc, ci):
        xcc = space.slice_data(data, ci * chunk, chunk)
        d = space.block(qenc, xcc)
        lf = jax.lax.dynamic_slice_in_dim(leaf_of, ci * chunk, chunk, 0)
        vis = (
            jnp.take_along_axis(
                visit, jnp.clip(lf, 0, n_leaves - 1)[None, :].repeat(b, 0), 1
            )
            & (lf >= 0)[None, :]
        )
        hit = vis & (d <= radius)
        return acc + jnp.sum(hit.astype(jnp.int32), axis=1), None

    acc0 = jnp.sum((dpiv <= radius).astype(jnp.int32), axis=1)
    counts, _ = jax.lax.scan(step, acc0, jnp.arange(data.ids.shape[0] // chunk))
    # per-query counts (batch totals can exceed int32; summed on host)
    ndist = n_internal + jnp.sum(visit * leaf_count[None, :], axis=1)
    return counts, ndist


@partial(jax.jit, static_argnames=("space", "cap", "depth", "chunk"))
def _vptree_range_collect(
    space, qenc, data, pivot_pos, medians, leaf_of, leaf_count, pruner,
    radius, cap: int, depth: int, chunk: int,
):
    """Pruned range pass 2: ascending ([Q, cap] dists, corpus positions)
    of all hits; (+inf, -1) past each query's count."""
    n_internal = pivot_pos.shape[0]
    n_leaves = 1 << depth
    b = next(v.shape[0] for v in qenc.values() if hasattr(v, "ndim") and v.ndim >= 1)
    # sparse: densify the query table ONCE before any chunk scan /
    # gathered step — XLA does not hoist the loop-invariant scatter
    # out of lax.scan bodies (measured ~2.9 s/batch of per-iteration
    # [Q, V_pad] copies at 1M before the napp hoist, r2_nprof.jsonl)
    from .seq_search import _densify_in_jit

    qenc = _densify_in_jit(space, qenc, data)
    xc = _gather_xc(space, data, pivot_pos)
    dpiv = space.block(qenc, xc)
    r = jnp.full(b, radius, jnp.float32)
    visit = _vptree_visit_masks(dpiv, medians, r, pruner, depth)

    def chunk_dists(ci):
        xcc = space.slice_data(data, ci * chunk, chunk)
        d = space.block(qenc, xcc)
        lf = jax.lax.dynamic_slice_in_dim(leaf_of, ci * chunk, chunk, 0)
        vis = (
            jnp.take_along_axis(
                visit, jnp.clip(lf, 0, n_leaves - 1)[None, :].repeat(b, 0), 1
            )
            & (lf >= 0)[None, :]
        )
        return jnp.where(vis & (d <= radius), d, INF)

    cd, cpos = T.streaming_smallest_k(
        chunk_dists, data.ids.shape[0] // chunk, chunk, b, cap
    )
    # pivots are real points too (heap nodes hold them, not the leaves)
    kp = min(cap, n_internal)
    pd, ppos = T.smallest_k(
        jnp.where(dpiv <= radius, dpiv, INF), kp, pivot_pos
    )
    ppos = jnp.where(jnp.isinf(pd), -1, ppos)
    return T.merge_topk(cd, cpos, pd, ppos, cap)


def _gather_xc(space, data, rows):
    """Corpus slice at arbitrary row indices, in block()'s xc format."""
    from ..ops.graph import gather_rows, inject_term

    c = space.corpus_dict(data)
    r2, pad2, extras2 = gather_rows(c, rows[None, :])
    extras2 = inject_term(space, r2, extras2)
    xc = {"x": r2[0], "pad": pad2[0]}
    xc.update({k: v[0] for k, v in extras2.items()})
    if "vocab_mark" in c:
        # static vocab-width carrier rides along un-gathered so sparse
        # blocks against gathered rows take the dense-after-scatter MXU
        # path instead of per-pair sorted lookups
        xc["vocab_mark"] = c["vocab_mark"]
    return xc


def _score_members(space, qenc, data, rows):
    """rows i32[..., C]: distance of every query to shared candidate rows
    [Q, C] (rows may be -1). When rows differ per query ([Q, C]), fall
    back to per-query gathering via ops.graph.score_rows."""
    if rows.ndim == 1:
        xc = _gather_xc(space, data, rows)
        return space.block(qenc, xc)
    from ..ops.graph import score_rows

    corpus = space.corpus_dict(data)
    return score_rows(space, qenc, corpus, rows)


def _dedup_topk(d, pos, k):
    """Mask duplicate positions (keep first occurrence), re-sort."""
    dup = (pos[:, :, None] == pos[:, None, :]) & (pos[:, :, None] >= 0)
    earlier = jnp.tril(jnp.ones((d.shape[1], d.shape[1]), bool), k=-1)[None]
    is_dup = jnp.any(dup & earlier, axis=2)
    d2 = jnp.where(is_dup, jnp.inf, d)
    p2 = jnp.where(is_dup, -1, pos)
    return T.smallest_k(d2, k, p2)


@register_method("vptree")
class VPTree(Method):
    name = "vptree"
    supports_range = True

    def __init__(self, space, params: Params | None = None):
        super().__init__(space, params)
        pm = ParamManager(self.index_params)
        self.bucket_size = pm.get("bucketSize", 50, int)
        pm.get("chunkBucket", True, bool)  # parity no-op: layout is contiguous
        pm.get("selectPivotAttempts", 5, int)  # parity no-op: random pivot
        self.seed = pm.get("seed", 0, int)
        # index-time tuning triggers (reference: vptree.cc + tune.h)
        self.desired_recall = pm.get("desiredRecall", 0.0, float)
        self.tune_k = pm.get("tuneK", 0, int)
        self.tune_r = pm.get("tuneR", 0.0, float)
        self.tune_qty = pm.get("tuneQty", 200, int)
        # exponent grid for the autotuner (searchoracle.cc:212 iterates
        # ce = minExp..maxExp; defaults 1/1 per searchoracle.h:50-51)
        self.min_exp = pm.get("minExp", 1, int)
        self.max_exp = pm.get("maxExp", 1, int)
        if self.max_exp < self.min_exp or self.max_exp < 1:
            raise ValueError("maxExp must be >= minExp >= 1")
        pm.check_unused()
        # query-time pruner params (searchoracle.h defaults: all 1)
        self.alpha_left = 1.0
        self.exp_left = 1.0
        self.alpha_right = 1.0
        self.exp_right = 1.0
        self.max_leaves = 1 << 30
        #: A/B knob: route finite maxLeavesToVisit through the gathered
        #: traversal (see _vptree_knn phase 4) instead of the masked
        #: full-corpus scan. Default on; the masked path stays as the
        #: exact/unbounded fallback and the A/B harness arm.
        self.gather_traversal = True
        self._tree = None

    def set_query_time_params(self, params: Params | None) -> None:
        if params is None:
            # ResetQueryTimeParams: pruner defaults are all 1 (searchoracle.h)
            self.alpha_left = self.alpha_right = 1.0
            self.exp_left = self.exp_right = 1.0
            self.max_leaves = 1 << 30
            super().set_query_time_params(None)
            return
        pm = ParamManager(Params.of(params))
        self.alpha_left = pm.get("alphaLeft", self.alpha_left, float)
        self.alpha_right = pm.get("alphaRight", self.alpha_right, float)
        self.exp_left = pm.get("expLeft", self.exp_left, float)
        self.exp_right = pm.get("expRight", self.exp_right, float)
        self.max_leaves = pm.get("maxLeavesToVisit", self.max_leaves, int)
        pm.check_unused()
        super().set_query_time_params(params)

    # ---------------- construction ----------------

    def create_index(self, store: DataStore, params: Params | None = None) -> None:
        self.store = store
        n = len(store)
        pref = getattr(self.space, "preferred_chunk", 8192)
        chunk = max(8, min(pref, ((max(n, 1) + 7) // 8) * 8))
        chunk = ((chunk + 7) // 8) * 8
        self._chunk = chunk
        self.data = self.space.encode_dataset(store, row_multiple=chunk)
        if n == 0:
            self._tree = None
            return
        rng = np_rng(self.seed)
        # depth so that leaf size <= bucket_size (pivots removed on the way)
        depth = 0
        while (n >> depth) > self.bucket_size and (1 << depth) <= n:
            depth += 1
        self.depth = depth
        n_internal = (1 << depth) - 1
        n_leaves = 1 << depth

        # Level-synchronous vectorized build (the round-1 version looped
        # over 2^depth per-node Python segments per level AND scored each
        # level's pivots against the WHOLE corpus — O(n^2) device work at
        # the bottom levels; minutes of host time at 1M). Here every
        # level is: one device dispatch scoring each active point against
        # ITS OWN segment's pivot (O(n) distances), then one vectorized
        # lexsort/median/split on host. Tree semantics match the
        # reference (vptree.cc:69-105): random pivot, median split,
        # pivot removed from the pool.
        qenc_all = self.space.encode_queries(self.space.store_as_query_points(store))
        corpus = self.space.corpus_dict(self.data)
        perm = np.arange(n, dtype=np.int64)  # active points, segment-contiguous
        seg = np.zeros(n, np.int64)  # segment id of each active point
        pivot_pos = np.zeros(n_internal, np.int32)
        medians = np.zeros(n_internal, np.float32)
        node_base = 0
        for lvl in range(depth):
            width = 1 << lvl
            m = perm.shape[0]
            seg_len = np.bincount(seg, minlength=width)[:width]
            seg_start = np.concatenate([[0], np.cumsum(seg_len)[:-1]])
            nz = seg_len > 0
            off = rng.integers(0, np.maximum(seg_len, 1))
            pidx = seg_start + np.minimum(off, np.maximum(seg_len - 1, 0))
            piv_pts = np.zeros(width, np.int64)
            if m:
                piv_pts[nz] = perm[np.minimum(pidx, m - 1)][nz]
            pivot_pos[node_base : node_base + width] = piv_pts
            keep = np.ones(m, bool)
            if m:
                keep[pidx[nz]] = False  # pivots move into the nodes
            perm, seg = perm[keep], seg[keep]
            # one device pass: d(point, pivot-of-its-segment)
            d = _self_pair_dists(
                self.space, qenc_all, corpus, perm, piv_pts[seg]
            )
            order = np.lexsort((d, seg))  # segment-major, distance-minor
            perm, seg, d = perm[order], seg[order], d[order]
            seg_len2 = np.bincount(seg, minlength=width)[:width]
            seg_start2 = np.concatenate([[0], np.cumsum(seg_len2)[:-1]])
            half = seg_len2 // 2
            last = seg_start2 + np.maximum(seg_len2 - 1, 0)
            i1 = seg_start2 + np.maximum(half - 1, 0)
            i2 = seg_start2 + np.minimum(half, np.maximum(seg_len2 - 1, 0))
            take = lambda idx: d.take(np.minimum(idx, max(d.shape[0] - 1, 0)))
            med = np.where(
                (half > 0) & (half < seg_len2),
                (take(i1) + take(i2)) / 2.0,
                np.where(seg_len2 > 0, take(last), 0.0),
            )
            medians[node_base : node_base + width] = med.astype(np.float32)
            pos_in_seg = np.arange(perm.shape[0], dtype=np.int64) - seg_start2[seg]
            seg = 2 * seg + (pos_in_seg >= half[seg])
            node_base += width
        # pack leaves (the final segments)
        seg_len = np.bincount(seg, minlength=n_leaves)[:n_leaves]
        seg_start = np.concatenate([[0], np.cumsum(seg_len)[:-1]])
        leaf_cap = max(int(seg_len.max(initial=1)), 1)
        leaf_cap = ((leaf_cap + 7) // 8) * 8
        leaf_members = np.full((n_leaves, leaf_cap), -1, np.int32)
        n_pad = self.data.ids.shape[0]
        leaf_of = np.full(n_pad, -1, np.int32)  # -1: pivots + padding rows
        leaf_count = seg_len.astype(np.int32)
        pos_in_seg = np.arange(perm.shape[0], dtype=np.int64) - seg_start[seg]
        leaf_members[seg, pos_in_seg] = perm
        leaf_of[perm] = seg
        self._tree = {
            "pivot_pos": jnp.asarray(pivot_pos),
            "medians": jnp.asarray(medians),
            "leaf_members": jnp.asarray(leaf_members),
            "leaf_of": jnp.asarray(leaf_of),
            "leaf_count": jnp.asarray(leaf_count),
        }
        self.leaf_cap = leaf_cap
        log("DEBUG", f"vptree built: n={n} depth={depth} leaf_cap={leaf_cap}")
        if self.desired_recall > 0:
            self._autotune(store)

    def _autotune(self, store: DataStore) -> None:
        """GetOptimalAlphas analog (reference: include/tune.h, vptree.cc):
        pick the largest alpha (fewest visits) whose recall on a sampled
        query set still meets desiredRecall."""
        from ..eval.tune import tune_vptree_alphas

        k = self.tune_k if self.tune_k > 0 else 10
        res = tune_vptree_alphas(self, store, k=k, desired_recall=self.desired_recall,
                                 sample=min(self.tune_qty, len(store)),
                                 exp_grid=list(range(self.min_exp, self.max_exp + 1)))
        self.alpha_left = res["alphaLeft"]
        self.alpha_right = res["alphaRight"]
        self.exp_left = res.get("expLeft", self.exp_left)
        self.exp_right = res.get("expRight", self.exp_right)
        log("INFO", f"vptree autotune: {res}")

    # ---------------- search ----------------

    def _pruner(self):
        return jnp.asarray(
            [self.alpha_left, self.exp_left, self.alpha_right, self.exp_right],
            jnp.float32,
        )

    def knn(self, points, k: int):
        if self._tree is None:
            raise IndexNotBuiltError("vptree: index not built")
        qenc = self.space.encode_queries(points)
        t = self._tree
        if t["pivot_pos"].shape[0] == 0:
            # degenerate: single leaf = exact scan
            members = t["leaf_members"][0]
            d = _score_members(self.space, qenc, self.data, members)
            dd, pos = T.smallest_k(d, min(k, d.shape[1]), members)
            ids = jnp.where(pos >= 0, self.data.ids[jnp.clip(pos, 0, self.data.ids.shape[0] - 1)], -1)
            # every member is scored per query (metrics parity with the
            # range() degenerate branch)
            self._add_dist_comps(d.shape[0] * jnp.sum(members >= 0))
            return self._finalize_knn(*_pad_k(dd, ids, k))
        ml = min(self.max_leaves, t["leaf_members"].shape[0])
        # A finite maxLeavesToVisit bounds per-query work, so the
        # gathered traversal (score only the selected leaves' rows)
        # replaces the masked full-corpus pass — unless the cap is so
        # loose that gathering would touch more rows than the scan
        # reads anyway (then the streaming scan's sequential HBM reads
        # win over row gathers).
        gathered = (
            self.gather_traversal
            and 1 <= ml < t["leaf_members"].shape[0]
            and ml * self.leaf_cap * 4 <= self.data.ids.shape[0]
        )
        d, ids, nd = _vptree_knn(
            self.space, qenc, self.data,
            t["pivot_pos"], t["medians"], t["leaf_members"],
            t["leaf_of"], t["leaf_count"], self._pruner(),
            self.depth, self.leaf_cap, k, ml, self._chunk,
            gathered=gathered,
        )
        self._add_dist_comps(nd)
        return self._finalize_knn(d, ids)

    def range(self, points, radius: float):
        """Pruned range query (reference: vptree.cc:417-470 GenericSearch
        with RangeQuery): the kNN phase-3 visit-mask rule with a fixed
        ball radius prunes whole subtrees (exact at the default
        alpha=1 pruner, approximate beyond — same contract as kNN), and
        hits stream through a running smallest-cap merge so device
        memory stays O(Q*(cap+chunk)), never [Q, N]."""
        if self._tree is None:
            raise IndexNotBuiltError("vptree: index not built")
        qenc = self.space.encode_queries(points)
        t = self._tree
        from ..core.dataset import round_up

        if t["pivot_pos"].shape[0] == 0:
            # degenerate single-leaf tree: defer to the streamed scan
            from .seq_search import SeqSearch

            tmp = SeqSearch(self.space, Params())
            tmp.data, tmp._chunk = self.data, self._chunk
            out = tmp.range(points, radius)
            self.dist_comps += tmp.dist_comps
            return out
        args = (
            self.space, qenc, self.data, t["pivot_pos"], t["medians"],
            t["leaf_of"], t["leaf_count"], self._pruner(),
        )
        counts, nd = _vptree_range_counts(
            *args, float(radius), self.depth, self._chunk
        )
        counts = np.asarray(counts)
        self._add_dist_comps(nd)
        return stream_range_results(
            counts,
            self.data,
            lambda cap: _vptree_range_collect(
                *args, float(radius), cap, self.depth, self._chunk
            ),
        )

    # ---------------- persistence ----------------

    def state_arrays(self) -> dict:
        if self._tree is None:
            return {}
        return {
            "pivot_pos": np.asarray(self._tree["pivot_pos"]),
            "medians": np.asarray(self._tree["medians"]),
            "leaf_members": np.asarray(self._tree["leaf_members"]),
            "leaf_of": np.asarray(self._tree["leaf_of"]),
            "leaf_count": np.asarray(self._tree["leaf_count"]),
            "meta": np.asarray([self.depth, self.leaf_cap, self.bucket_size, self._chunk]),
        }

    def restore(self, store: DataStore, state: dict, params: Params | None = None) -> None:
        if not state:
            self.create_index(store, params)
            return
        self.store = store
        self._chunk = int(state["meta"][3])
        self.data = self.space.encode_dataset(store, row_multiple=self._chunk)
        self._tree = {
            k: jnp.asarray(state[k])
            for k in ("pivot_pos", "medians", "leaf_members", "leaf_of", "leaf_count")
        }
        self.depth = int(state["meta"][0])
        self.leaf_cap = int(state["meta"][1])


def _pad_k(d, ids, k):
    kk = d.shape[1]
    if kk >= k:
        return d[:, :k], ids[:, :k]
    return (
        jnp.pad(d, ((0, 0), (0, k - kk)), constant_values=jnp.inf),
        jnp.pad(ids, ((0, 0), (0, k - kk)), constant_values=-1),
    )


def _gather_qenc_rows(qenc_all: dict, rows):
    n = next(
        v.shape[0] for v in qenc_all.values() if hasattr(v, "ndim") and v.ndim >= 1
    )
    out = {}
    for k, v in qenc_all.items():
        if hasattr(v, "ndim") and v.ndim >= 1 and v.shape[0] == n:
            out[k] = v[jnp.asarray(rows)]
        else:
            out[k] = v
    return out


@partial(jax.jit, static_argnames=("space",))
def _pair_dist_block(space, qe, corpus, x_rows):
    from ..ops.graph import score_rows

    return score_rows(space, qe, corpus, x_rows[:, None])[:, 0]


def _self_pair_dists(space, qenc_all, corpus, q_rows, x_rows):
    """d(point q_rows[i], point x_rows[i]) for the level-synchronous
    build: fixed-size blocks so every level reuses ONE compiled program
    (the active pool shrinks by one pivot per segment per level)."""
    m = q_rows.shape[0]
    # sparse spaces densify a [blk, V] query table inside score_rows
    blk = 2048 if "vocab_mark" in corpus else 65536
    out = np.zeros(m, np.float32)
    for lo in range(0, m, blk):
        hi = min(lo + blk, m)
        qp = np.zeros(blk, np.int64)
        xp = np.zeros(blk, np.int64)
        qp[: hi - lo] = q_rows[lo:hi]
        xp[: hi - lo] = x_rows[lo:hi]
        qe = _gather_qenc_rows(qenc_all, qp)
        d = _pair_dist_block(space, qe, corpus, jnp.asarray(xp, jnp.int32))
        out[lo:hi] = np.asarray(d[: hi - lo])
    return out
