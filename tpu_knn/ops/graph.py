"""Batched graph-search primitives: the TPU rebuild of HNSW traversal.

Reference hot paths (SURVEY.md §3.2/3.3): greedy 1-NN descent through
upper levels (hnsw.cc:547-576) and the ef-bounded best-first beam at
level 0 (`kSearchElementsWithAttemptsLevel` / `SearchV1Merge`,
hnsw.cc:611-708, hnsw_distfunc_opt.cc:152-283). There, one query walks
pointers and scores one neighbor at a time with a KNNQueue/SortArrBI
and an epoch-stamped visited byte array.

Here (BASELINE.json north star): a whole *batch* of queries advances in
lock step. Each iteration expands the EXPAND closest unexpanded beam
entries per query at once, gathers their adjacency rows, scores the
whole [B, EXPAND*M] candidate frontier with one blocked distance call,
and merges into the beam with one sort. Visited tracking is replaced by
dedup-against-beam (duplicates are masked before entering the beam;
re-scoring a dropped node is allowed and merely wastes a few cheap
FLOPs, while re-*expansion* is prevented because a re-inserted node can
only re-enter the beam by beating the current ef-th distance).

Everything is shape-static and jit/while_loop friendly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.topk import INF

# numpy, not jnp: module-level jnp constants initialize the backend at
# import time, before platform pinning (see ops/sparse.py PAD_Q note).
NEG1 = np.int32(-1)

#: beam-search iteration-body strategy defaults (overridable per call;
#: module-level so experiment harnesses can flip them globally — change
#: requires jax.clear_caches() to retrace live jits)
#: dedup: how candidate duplicates are removed each iteration
#:   "broadcast": two O(W^2) membership broadcasts before scoring
#:   "postmerge": sort-adjacency run-dedup after the merge (O(W) compare
#:                + one extra narrow sort; duplicates get scored, which
#:                costs nothing at fixed frontier width). Relies on a node
#:                scoring bitwise-identically wherever it appears; the one
#:                exception (the init-scored entry) is masked from
#:                candidates inside the body.
#: Measured on v5e (scripts/r2_beam_modes.py, 100k corpus, 2048 queries,
#: M=16): postmerge is device-faster at both sweep points (92.9 vs
#: 94.8 ms total device time at ef=20; +18% wall qps at ef=50) with
#: bitwise-identical results; "topk" merge is ~3.5x SLOWER device-side
#: than the 3-operand sort (lax.top_k over wide rows, as in the exact
#: scan) and stays off.
BEAM_DEDUP = "postmerge"
#: merge: how the candidate frontier enters the beam
#:   "sort": one 3-operand full-width lax.sort
#:   "topk": lax.top_k on distances + 2 take_along_axis gathers
BEAM_MERGE = "sort"


def _qenc_axes(qenc: dict, batch: int):
    """in_axes tree for vmapping a per-query slice of an encoded query dict."""
    return {
        k: (0 if hasattr(v, "ndim") and v.ndim >= 1 and v.shape[0] == batch else None)
        for k, v in qenc.items()
    }


_NON_GATHER_KEYS = ("vecs", "pad", "term", "ids", "count", "row_mask", "vocab_mark")


def densify_queries(space, qenc: dict, corpus: dict) -> dict:
    """Space hook: attach corpus-sized auxiliary query encodings (the
    sparse densified table, spaces/sparse.py densify_queries). The width
    comes from the corpus being scored, so it can never go stale; the
    scatter is loop-invariant and XLA hoists it out of while loops."""
    hook = getattr(space, "densify_queries", None)
    if hook is None:
        return qenc
    return hook(qenc, corpus)


def _row_pad(corpus: dict, ids: jax.Array, safe: jax.Array) -> jax.Array:
    """Row mask without a scalar gather: padding rows are exactly rows
    >= the (static) real count; a gathered 'row_mask' array is used only
    when a method masks real rows dynamically (sw-graph deletions).
    Profiled on v5e: a 1-D 4B-granule gather costs several times the 512B
    row gather it accompanies, so the static path matters."""
    if "row_mask" in corpus:
        pad = corpus["row_mask"][safe]
    elif "count" in corpus:
        pad = jnp.where(ids >= corpus["count"], INF, 0.0)
    else:
        pad = corpus["pad"][safe]
    return pad + jnp.where(ids < 0, INF, 0.0)


def gather_rows(corpus: dict, ids: jax.Array) -> tuple[jax.Array, jax.Array, dict]:
    """Per-query row gather: (rows [B,K,...], pad [B,K], extras)."""
    safe = jnp.clip(ids, 0, corpus["vecs"].shape[0] - 1)
    rows = corpus["vecs"][safe]  # [B, K, D]
    pad = _row_pad(corpus, ids, safe)  # [B, K]
    extra_sl = {}
    if corpus.get("term") is not None:
        extra_sl["x_term"] = corpus["term"][safe]
    for key, arr in corpus.items():
        if key not in _NON_GATHER_KEYS and getattr(arr, "ndim", 0) >= 1:
            extra_sl[key] = arr[safe]
    return rows, pad, extra_sl


def gather_row_groups(corpus: dict, gsel: jax.Array, group: int = 128):
    """Per-query *group* gather: gsel i32[B, KG] indexes contiguous
    ``group``-row blocks, so each gathered granule is group*rowbytes of
    sequential HBM (64KB for f32[128,128] rows) instead of one row —
    measured ~5x faster than row gathers for the two-pass exact scan.
    Returns (rows [B, KG*group, ...], pad, extras) like gather_rows."""
    b, kg = gsel.shape

    def expand(arr):
        g = arr.reshape((arr.shape[0] // group, group) + arr.shape[1:])
        out = g[gsel]  # [B, KG, group, ...]
        return out.reshape((b, kg * group) + arr.shape[1:])

    rows = expand(corpus["vecs"])
    cols = gsel[:, :, None] * group + jnp.arange(group)[None, None, :]
    cols = cols.reshape(b, kg * group)
    if "row_mask" in corpus:
        pad = expand(corpus["row_mask"])
    elif "count" in corpus:
        pad = jnp.where(cols >= corpus["count"], INF, 0.0)
    else:
        pad = expand(corpus["pad"])
    extra_sl = {}
    if corpus.get("term") is not None:
        extra_sl["x_term"] = expand(corpus["term"])
    for key, arr in corpus.items():
        if key not in _NON_GATHER_KEYS and getattr(arr, "ndim", 0) >= 1:
            extra_sl[key] = expand(arr)
    return rows, pad, extra_sl, cols


def inject_term(space, rows, extra_sl: dict) -> dict:
    """Recompute the per-row term from gathered rows when the space can
    (term_from_rows): avoids a 1-D scalar gather."""
    if "x_term" not in extra_sl and getattr(space, "term_recompute", False):
        t = space.term_from_rows(rows)
        if t is not None:
            extra_sl = dict(extra_sl)
            extra_sl["x_term"] = t
    return extra_sl


def score_gathered(space, qenc: dict, rows, pad, extra_sl: dict) -> jax.Array:
    """Distances of query b to its pre-gathered candidate rows [B,K,...].

    Affine-factored spaces (space.pass1_affine) take one batched einsum
    on the MXU + the exact post-transform — ~50x faster than the
    generic per-query vmap of Space.block, which survives as the
    fallback for merge/DP-style distances."""
    extra_sl = inject_term(space, rows, extra_sl)

    aff = space.pass1_affine() if hasattr(space, "pass1_affine") else None
    if aff is not None and hasattr(rows, "dtype") and rows.ndim == 3:
        from .distance import batched_dot

        scale, sq, sx = aff
        g = batched_dot(qenc["q"], rows)
        s = scale * g
        if sq != 0.0 and "q_term" in qenc:
            s = s + sq * qenc["q_term"][:, None]
        if sx != 0.0 and "x_term" in extra_sl:
            s = s + sx * extra_sl["x_term"]
        return space.pass1_post(s, qenc) + pad

    # space-provided batch scorer for gathered rows (sparse dot family:
    # densified-query take_along_axis — replaces the per-element binary
    # search whose TPU program faulted at 100k graph-query scale)
    gb = getattr(space, "gathered_block", None)
    if gb is not None:
        d = gb(qenc, rows, pad, extra_sl)
        if d is not None:
            return d

    b = rows.shape[0]
    axes = _qenc_axes(qenc, b)

    def one(qe, r, p, ex):
        # restore the (length-1) query axis stripped by vmap
        qe = {k: (v[None] if axes[k] == 0 else v) for k, v in qe.items()}
        xc = {"x": r, "pad": p}
        xc.update(ex)
        return space.block(qe, xc)[0]

    ex_axes = {k: 0 for k in extra_sl}
    return jax.vmap(one, in_axes=(axes, 0, 0, ex_axes))(qenc, rows, pad, extra_sl)


def score_rows(space, qenc: dict, corpus: dict, ids: jax.Array) -> jax.Array:
    """Distances between query b and its own gathered candidate rows.

    ids: i32[B, K] corpus row indices (may be -1 / padding; those score +INF).
    corpus: {'vecs': [N,D], 'pad': [N], optional 'term': [N], extra arrays}.
    Returns f32[B, K].

    Works for every space because it reuses Space.block on a per-query
    basis (vmapped batched matvec on the MXU for factored spaces).
    """
    qenc = densify_queries(space, qenc, corpus)
    rows, pad, extra_sl = gather_rows(corpus, ids)
    d = score_gathered(space, qenc, rows, pad, extra_sl)
    return jnp.where(ids < 0, INF, d)


def greedy_descent(
    space,
    qenc: dict,
    corpus: dict,
    adj: jax.Array,  # i32[S, M] adjacency for this level (slot-indexed)
    slot_of: jax.Array,  # i32[N] corpus idx -> slot (valid for nodes on level)
    start: jax.Array,  # i32[B] current node per query (corpus idx)
    start_d: jax.Array,  # f32[B]
    max_steps: int = 64,
):
    """Greedy 1-NN walk on one upper level (reference: hnsw.cc:547-576).
    Per step: gather current node's M neighbors, score, move to the best
    if it improves; stop when no query improves."""

    def cond(state):
        cur, cur_d, moved, it = state
        return jnp.logical_and(jnp.any(moved), it < max_steps)

    def body(state):
        cur, cur_d, _, it = state
        if slot_of is None:
            slots = cur
        else:
            slots = slot_of[jnp.clip(cur, 0, slot_of.shape[0] - 1)]
        nbrs = adj[jnp.clip(slots, 0, adj.shape[0] - 1)]  # [B, M]
        nbrs = jnp.where(slots[:, None] < 0, NEG1, nbrs)
        d = score_rows(space, qenc, corpus, nbrs)  # [B, M]
        best = jnp.argmin(d, axis=1)
        best_d = jnp.take_along_axis(d, best[:, None], 1)[:, 0]
        best_i = jnp.take_along_axis(nbrs, best[:, None], 1)[:, 0]
        improve = best_d < cur_d
        ncur = jnp.where(improve, best_i, cur)
        ncur_d = jnp.where(improve, best_d, cur_d)
        return ncur, ncur_d, improve, it + 1

    init = (start, start_d, jnp.ones(start.shape[0], bool), jnp.int32(0))
    cur, cur_d, _, _ = jax.lax.while_loop(cond, body, init)
    return cur, cur_d


def beam_search(
    space,
    qenc: dict,
    corpus: dict,
    adj: jax.Array,  # i32[S, M] (slot-indexed; level-0 slot == corpus idx)
    slot_of: jax.Array | None,  # i32[N] or None when slot==idx
    entry: jax.Array,  # i32[B] entry node per query
    ef: int,
    expand: int = 4,
    max_iters: int | None = None,
    nbr_store=None,  # ([S, M, D] replicated neighbor rows, dequant scale)
    dedup: str | None = None,
    merge: str | None = None,
):
    """Batched best-first beam search on one graph level.

    Returns (beam_d f32[B,ef], beam_i i32[B,ef]) sorted ascending, plus
    the number of candidate scorings performed (dist-comp counter analog,
    reference: query.h:33).

    ``nbr_store``: optional DiskANN-style neighborhood replication — each
    node's neighbors' vectors stored contiguously ([S, M, D], typically
    bfloat16). Expanding a parent then costs ONE sequential HBM granule
    (M*D*2 bytes) instead of M separate row gathers; measured on v5e,
    gather cost is granule-count-bound (~45M granules/s regardless of
    granule size), so this cuts the beam's dominant cost ~M-fold for
    ~2x HBM footprint. Scores pick up bf16 rounding (fine for beam
    ordering); callers re-score the final top-k exactly (methods/hnsw.py
    _hnsw_search). Only valid for spaces whose per-row term is
    recomputable from the row (or absent) — the caller gates this.
    """
    dedup = BEAM_DEDUP if dedup is None else dedup
    merge = BEAM_MERGE if merge is None else merge
    b = entry.shape[0]
    m = adj.shape[1]
    k_cand = expand * m
    if max_iters is None:
        max_iters = max(2 * ((ef + expand - 1) // expand) + 4, 8)
    # carry the beam at a multiple of the 128-lane width: ops on unaligned
    # [B, ef] arrays waste VPU register rows and relayout inside the
    # while_loop; columns >= ef are masked INF so the semantics are exactly
    # a beam of ef
    ef_pad = ((ef + 127) // 128) * 128

    entry_d = score_rows(space, qenc, corpus, entry[:, None])[:, 0]
    beam_d = jnp.full((b, ef_pad), INF).at[:, 0].set(entry_d)
    beam_i = jnp.full((b, ef_pad), NEG1).at[:, 0].set(entry)
    expanded = jnp.zeros((b, ef_pad), bool)
    rows = jnp.arange(b)
    lane = jax.lax.broadcasted_iota(jnp.int32, (b, ef_pad), 1)

    def cond(state):
        beam_d, beam_i, expanded, it, ndist = state
        unexp_d = jnp.where(expanded | (beam_i < 0), INF, beam_d)
        frontier_best = jnp.min(unexp_d, axis=1)
        worst = jnp.max(jnp.where(lane < ef, beam_d, -INF), axis=1)
        # classic HNSW stop rule, plus "frontier exhausted" cutoff
        active = (frontier_best <= worst) & (frontier_best < INF)
        return jnp.logical_and(jnp.any(active), it < max_iters)

    def body(state):
        beam_d, beam_i, expanded, it, ndist = state
        # pick EXPAND closest unexpanded entries per query
        unexp_d = jnp.where(expanded | (beam_i < 0), INF, beam_d)
        neg, pos = jax.lax.top_k(-unexp_d, expand)  # [B, E] positions
        parent_valid = neg > -INF
        parents = jnp.where(parent_valid, jnp.take_along_axis(beam_i, pos, 1), NEG1)
        expanded2 = expanded.at[rows[:, None], pos].set(True)

        # gather adjacency rows of the parents
        if slot_of is not None:
            pslots = slot_of[jnp.clip(parents, 0, slot_of.shape[0] - 1)]
            pslots = jnp.where(parents < 0, NEG1, pslots)
        else:
            pslots = parents
        nbrs = adj[jnp.clip(pslots, 0, adj.shape[0] - 1)]  # [B, E, M]
        nbrs = jnp.where(pslots[:, :, None] < 0, NEG1, nbrs).reshape(b, k_cand)

        # dedup: against beam, and within the candidate block (keep first)
        if dedup == "broadcast":
            in_beam = jnp.any(nbrs[:, :, None] == beam_i[:, None, :], axis=2)
            eq = nbrs[:, :, None] == nbrs[:, None, :]
            earlier = jnp.tril(jnp.ones((k_cand, k_cand), bool), k=-1)[None]
            dup = jnp.any(eq & earlier, axis=2)
            cand = jnp.where(in_beam | dup, NEG1, nbrs)
        else:  # postmerge: duplicates survive scoring, removed after sort.
            # The run-compare relies on duplicate ids landing ADJACENT in
            # the (d, id)-keyed sort, i.e. on a node scoring bitwise-
            # identically everywhere it appears. Every in-loop score of a
            # node comes from the same program and does; the ENTRY is the
            # one exception (init-scored by a different program shape at
            # beam setup — and exactly, vs the dequantized store when
            # nbr_store is on), so mask it from candidates — it sits in
            # the beam from iteration 0 anyway.
            cand = jnp.where(nbrs == entry[:, None], NEG1, nbrs)

        if nbr_store is not None:
            # one [M, D] granule per parent; rows are position-aligned
            # with nbrs == cand, masked entries score INF via pad
            store_rows, store_scale = nbr_store
            prows = store_rows[jnp.clip(pslots, 0, store_rows.shape[0] - 1)]
            crows = prows.reshape(b, k_cand, -1).astype(jnp.float32) * store_scale
            safe = jnp.clip(cand, 0, corpus["vecs"].shape[0] - 1)
            pad = _row_pad(corpus, cand, safe)
            extra_sl = inject_term(space, crows, {})
            d = score_gathered(space, qenc, crows, pad, extra_sl)
            d = jnp.where(cand < 0, INF, d)
        else:
            d = score_rows(space, qenc, corpus, cand)  # [B, K]
        ndist = ndist + jnp.sum(cand >= 0)

        # merge candidates into the beam
        all_d = jnp.concatenate([beam_d, d], axis=1)
        all_i = jnp.concatenate([beam_i, cand], axis=1)
        all_e = jnp.concatenate([expanded2, jnp.zeros((b, k_cand), bool)], axis=1)
        if dedup == "postmerge":
            # (d, id)-keyed sort puts duplicate ids adjacent (same point
            # always scores identically); the stable sort keeps the beam
            # copy — which carries the expanded flag — ahead of candidate
            # copies. Run-dedup then one compaction selection.
            all_d, all_i, se = jax.lax.sort(
                (all_d, all_i, all_e.astype(jnp.int32)), num_keys=2
            )
            run = jnp.concatenate(
                [jnp.zeros((b, 1), bool), (all_i[:, 1:] == all_i[:, :-1]) & (all_i[:, 1:] >= 0)],
                axis=1,
            )
            all_d = jnp.where(run, INF, all_d)
            all_i = jnp.where(run, NEG1, all_i)
            all_e = jnp.where(run, 0, se).astype(bool)
        if merge == "topk":
            neg, idx = jax.lax.top_k(-all_d, ef_pad)
            sd = -neg
            si = jnp.take_along_axis(all_i, idx, 1)
            se = jnp.take_along_axis(all_e.astype(jnp.int32), idx, 1).astype(bool)
        else:
            sd, si, se = jax.lax.sort((all_d, all_i, all_e.astype(jnp.int32)), num_keys=1)
            sd, si, se = sd[:, :ef_pad], si[:, :ef_pad], se[:, :ef_pad].astype(bool)
        # mask out slots beyond the logical beam width
        sd = jnp.where(lane < ef, sd, INF)
        si = jnp.where(lane < ef, si, NEG1)
        return sd, si, se, it + 1, ndist

    state = (beam_d, beam_i, expanded, jnp.int32(0), jnp.int32(0))
    beam_d, beam_i, expanded, _, ndist = jax.lax.while_loop(cond, body, state)
    return beam_d[:, :ef], beam_i[:, :ef], ndist


# ---------------- neighbor-selection heuristic ----------------


def select_neighbors_heuristic(
    base_d: jax.Array,  # f32[B, C] candidate -> base distances (INF = invalid)
    cand_pair_d: jax.Array,  # f32[B, C, C] candidate pairwise distances
    m: int,
    exact: bool = True,
):
    """HNSW neighbor-selection heuristic (delaunay_type=2, reference:
    hnsw.h:129-168): scanning candidates in increasing base distance,
    keep c iff d(c, base) < d(c, s) for every already-kept s; stop at m.

    Vectorized over the batch; the candidate scan is a fori_loop whose
    body is O(B*C) VPU work. ``exact=False`` uses the one-shot RNG-rule
    relaxation (compare against all *closer* candidates instead of only
    kept ones) — fully parallel, slightly stronger pruning.

    Returns keep mask bool[B, C] with at most m True per row.
    """
    b, c = base_d.shape
    order = jnp.argsort(base_d, axis=1)  # positions sorted by base dist
    sorted_d = jnp.take_along_axis(base_d, order, 1)
    # reorder pairwise distances into sorted candidate order
    pair = jnp.take_along_axis(
        jnp.take_along_axis(cand_pair_d, order[:, :, None], 1), order[:, None, :], 2
    )

    if not exact:
        closer = sorted_d[:, None, :] < sorted_d[:, :, None]  # j closer than i
        dominated = jnp.any(closer & (pair < sorted_d[:, :, None]), axis=2)
        keep_sorted = (~dominated) & (sorted_d < INF)
    else:
        def body(i, keep):
            # candidate i survives iff closer than base to every kept j < i
            prior = keep & (jnp.arange(c) < i)[None, :]
            pair_i = jax.lax.dynamic_index_in_dim(pair, i, 1, keepdims=False)  # [B, C]
            d_i = jax.lax.dynamic_index_in_dim(sorted_d, i, 1, keepdims=True)  # [B, 1]
            conflict = jnp.any(prior & (pair_i < d_i), axis=1)
            kept_so_far = jnp.sum(prior, axis=1)
            ok = (~conflict) & (d_i[:, 0] < INF) & (kept_so_far < m)
            return keep.at[:, i].set(ok)

        keep_sorted = jax.lax.fori_loop(0, c, body, jnp.zeros((b, c), bool))

    # cap at m (relevant for the rng mode; exact mode already capped)
    rank = jnp.cumsum(keep_sorted, axis=1)
    keep_sorted = keep_sorted & (rank <= m)
    # scatter back to original candidate positions
    keep = jnp.zeros((b, c), bool).at[jnp.arange(b)[:, None], order].set(keep_sorted)
    return keep


def pack_selected(ids: jax.Array, keep: jax.Array, m: int):
    """Compress kept candidate ids [B, C] into fixed rows [B, m] (-1 pad),
    preserving ascending-distance order when ids are pre-sorted."""
    b, c = ids.shape
    key = jnp.where(keep, 0, 1) * jnp.int32(c) + jax.lax.broadcasted_iota(jnp.int32, (b, c), 1)
    order = jnp.argsort(key, axis=1)
    packed = jnp.take_along_axis(jnp.where(keep, ids, NEG1), order, 1)
    return packed[:, :m]
