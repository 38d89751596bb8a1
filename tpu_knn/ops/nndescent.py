"""NN-descent k-NN-graph construction — the matmul-dense alternative to
batched insertion waves for HNSW level 0.

Reference parity: this replaces the *construction* algorithm only
(src/method/hnsw.cc:183-338 sequential insertion); the produced index is
the same layered navigable graph searched by the same batched beam
(ops/graph.py), so query-time behavior and the parameter surface are
unchanged. Rationale (BASELINE.md "Build wall-clock correction"): the
insertion-wave build is gather-bound inside per-wave beam searches
(~58% of device time) and lost the 1M construction headline to the
reference ~3x. NN-descent (Dong et al., WWW'11; the CAGRA/GGNN GPU
build recipe) reformulates construction as a fixed number of
whole-corpus refinement sweeps whose hot loop is contiguous-granule
gathers + one batched matmul — exactly what the TPU memory system and
MXU want:

  * state: each node's current k-NN list (adj [N,k], dist [N,k]).
  * per sweep: symmetrize (forward + capped reverse edges) -> B;
    replicate each node's neighborhood rows contiguously
    (store = xq[B], int8) so a node's candidate set B[B[i]] is scored
    from kb sequential granules instead of kb^2 row gathers; merge the
    per-parent best t into the k-NN list with one (id,d)/(d,id) double
    sort (duplicate-safe across iterations).
  * final sweep re-scores every surviving list entry EXACTLY (f32
    corpus rows) so downstream pruning ranks true neighbors.

Scoring runs on the space's affine pass-1 factorization with BOTH sides
derived from corpus rows (space.rows_as_queries) — no second encoded
corpus copy, no per-candidate query-encoding gathers. Eligible spaces:
l2, cosinesimil/angulardist/negdotprod, l2sqr_sift (native int8 rows,
exact), and the sparse JL sketch proxy.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from . import graph as G
from .topk import INF

NEG1 = np.int32(-1)
#: invalid-id sentinel that sorts AFTER every real id (dedup sorts)
IDBIG = np.int32(2**30)


# ---------------- scoring from rows ----------------


def _score_from_rows(space, qenc: dict, rows, xscale: float):
    """Distances between per-chunk queries qenc['q'] [C, D] and candidate
    rows [C, ..., D] (broadcast over middle dims). rows may be a
    quantized store (int8 * xscale); terms are recomputed from the
    dequantized rows so the affine identity stays consistent.

    Scoring runs in bf16 (f32 accumulation): this ranks DESCENT
    candidates only — the final sweep re-scores every survivor exactly
    from f32 corpus rows — and the int8 store quantization (~1/127
    relative) is already coarser than bf16 rounding. The f32 dequant of
    a [C, kb, kb, D] candidate block was a 2 GB transient at chunk=1024
    that RESOURCE_EXHAUSTED the 1M build next to the 8.2 GB resident
    store; bf16 halves it."""
    scale, sq, sx = space.pass1_affine()
    q = qenc["q"].astype(jnp.bfloat16)
    r = rows.astype(jnp.bfloat16)
    if xscale != 1.0:
        r = r * jnp.bfloat16(xscale)
    g = jnp.einsum("cd,c...d->c...", q, r,
                   preferred_element_type=jnp.float32)
    s = scale * g
    if sq != 0.0 and "q_term" in qenc:
        qt = qenc["q_term"]
        s = s + sq * qt.reshape(qt.shape + (1,) * (g.ndim - 1))
    if sx != 0.0:
        t = space.term_from_rows(r.astype(jnp.float32))
        if t is not None:
            s = s + sx * t
    return space.pass1_post(s, qenc)


def pairs_from_rows(space, rows):
    """All-pairs distances within each row set: rows [C, K, D] ->
    [C, K, K], using rows as their own query encodings. One batched
    matmul on the MXU — replaces the _score_pairs double gather
    (methods/hnsw.py) for symmetric-encode spaces."""
    qe = space.rows_as_queries(rows)
    scale, sq, sx = space.pass1_affine()
    a = qe["q"].astype(jnp.float32)
    b = rows.astype(jnp.float32)
    g = jnp.einsum("cad,cbd->cab", a, b)
    s = scale * g
    if sq != 0.0 and "q_term" in qe:
        s = s + sq * qe["q_term"][:, :, None]
    if sx != 0.0:
        t = space.term_from_rows(b)
        if t is not None:
            s = s + sx * t[:, None, :]
    return space.pass1_post(s, qe)


# ---------------- jitted pieces ----------------


@partial(jax.jit, static_argnames=("krev", "count"))
def _make_b(adj, krev: int, count: int):
    """Symmetrized neighborhood B = [forward | capped reverse] i32[S, kb].

    Reverse edges via the sort/group machinery (cf. methods/hnsw.py
    reverse_update): every forward pair (src -> tgt) competes for one of
    tgt's krev reverse slots, first-come by src order. Pad-state rows
    (src >= count) never emit pairs."""
    s_rows, k = adj.shape
    src = jnp.broadcast_to(
        jnp.arange(s_rows, dtype=jnp.int32)[:, None], (s_rows, k)
    ).reshape(-1)
    tgt = adj.reshape(-1)
    valid = (tgt >= 0) & (src < count)
    npairs = tgt.shape[0]
    skey = jnp.where(valid, tgt, IDBIG)
    order = jnp.argsort(skey)
    sn, sp = skey[order], src[order]
    # SCATTER-FREE grouped gather: pairs are sorted by target, so each
    # target's first krev sources live at [gstart[t], gstart[t]+krev).
    # gstart via binary search replaces the [S*k]-element scatter into
    # [S, krev] — the tens-of-millions-element scatter op class faulted
    # the TPU worker at 1M (48M scatter-max proven fatal; the plain
    # .at[].set of the same size is the remaining suspect at 1M).
    gstart = jnp.searchsorted(
        sn, jnp.arange(s_rows, dtype=sn.dtype)
    ).astype(jnp.int32)
    idx = gstart[:, None] + jnp.arange(krev, dtype=jnp.int32)[None, :]
    inb = idx < npairs
    idx = jnp.where(inb, idx, npairs - 1)
    hit = inb & (sn[idx] == jnp.arange(s_rows, dtype=sn.dtype)[:, None])
    rev = jnp.where(hit, sp[idx], NEG1)
    return jnp.concatenate([adj, rev], axis=1)


@jax.jit
def _gather_store(xq, b):
    """Neighborhood row replication: store[i] = xq[B[i]] ([S, kb, D]).
    One row gather per (node, slot); every later candidate read is a
    kb*D sequential granule."""
    return xq[jnp.clip(b, 0, xq.shape[0] - 1)]


def _merge_dedup_sorted(all_d, all_i, k: int):
    """(id,d)-sort -> run-dedup (keep min d per id) -> (d,id)-sort ->
    first k. Safe when the same id carries bitwise-different scores
    (store-quantized vs exact init), unlike single-sort run-dedup."""
    ids = jnp.where(all_d >= INF, IDBIG, all_i)
    ids = jnp.where(ids < 0, IDBIG, ids)
    d = jnp.where(ids == IDBIG, INF, all_d)
    ids, d = jax.lax.sort((ids, d), num_keys=2)
    run = jnp.concatenate(
        [jnp.zeros((ids.shape[0], 1), bool), (ids[:, 1:] == ids[:, :-1]) & (ids[:, 1:] < IDBIG)],
        axis=1,
    )
    d = jnp.where(run, INF, d)
    ids = jnp.where(run, IDBIG, ids)
    d, ids = jax.lax.sort((d, ids), num_keys=2)
    d, ids = d[:, :k], ids[:, :k]
    return d, jnp.where(ids == IDBIG, NEG1, ids)


def _descent_body(
    space, adj, dist, b, store, xq, qvecs, base, *,
    t_keep: int, count: int, chunk: int, xscale: float,
):
    """One refinement step for nodes [base, base+chunk): score candidate
    set B[B[i]] from neighborhood granules, keep each parent's best
    t_keep, merge into the current k-NN list. Returns the updated
    (dist_c, adj_c, changed_count) for the chunk only (Jacobi update —
    every chunk of an iteration reads the same frozen B/store).

    ``store is None`` = wide-row mode: candidate rows gather straight
    from ``xq`` per (node, parent, slot). The replicated store exists to
    turn kb^2 sub-granule row gathers into kb sequential kb*D granules —
    at row width >= 512 B each ROW is already a granule, and the
    resident store (n*kb*D, 6.6 GB for 100k x 64 x 1024 sketches) is
    what RESOURCE_EXHAUSTED the sparse NND build (batch37 2026-08-19)."""
    k = adj.shape[1]
    kb = b.shape[1]
    adj_c = jax.lax.dynamic_slice_in_dim(adj, base, chunk, 0)
    dist_c = jax.lax.dynamic_slice_in_dim(dist, base, chunk, 0)
    node = base + jnp.arange(chunk, dtype=jnp.int32)
    # query side from the EXACT corpus rows (only candidate rows ride
    # the quantized store) — halves the quantization noise for free
    q = qvecs[jnp.clip(node, 0, qvecs.shape[0] - 1)]
    qe = space.rows_as_queries(q)

    b_c = jax.lax.dynamic_slice_in_dim(b, base, chunk, 0)  # [C, kb]
    safe_p = jnp.clip(b_c, 0, b.shape[0] - 1)
    cand = b[safe_p]  # [C, kb, kb]
    cand = jnp.where(b_c[:, :, None] < 0, NEG1, cand)
    if store is None:
        rows = xq[jnp.clip(cand, 0, xq.shape[0] - 1)]  # [C, kb, kb, D]
    else:
        rows = store[safe_p]  # [C, kb, kb, D]
    d3 = _score_from_rows(space, qe, rows, xscale)  # [C, kb, kb]
    bad = (cand < 0) | (cand >= count) | (cand == node[:, None, None])
    d3 = jnp.where(bad, INF, d3)

    if t_keep < kb:
        d3, cand = jax.lax.sort((d3, cand), num_keys=1)
        d3, cand = d3[:, :, :t_keep], cand[:, :, :t_keep]
    dflat = d3.reshape(chunk, -1)
    iflat = cand.reshape(chunk, -1)

    all_d = jnp.concatenate([dist_c, dflat], axis=1)
    all_i = jnp.concatenate([adj_c, iflat], axis=1)
    nd, ni = _merge_dedup_sorted(all_d, all_i, k)
    return nd, ni, jnp.sum(ni != adj_c)


@partial(jax.jit, static_argnames=("space", "t_keep", "count", "chunk",
                                   "xscale", "nc"))
def _descent_sweep(space, adj, dist, b, store, xq, qvecs, *, t_keep: int,
                   count: int, chunk: int, xscale: float, nc: int):
    """One full refinement sweep as ONE dispatch: fori_loop over the nc
    node chunks, writing each chunk's merged lists into fresh carries
    (Jacobi — every chunk reads the same frozen adj/dist/b/store).
    The per-chunk host-dispatch formulation cost ~19 ms/chunk over a
    remote link (~5.6 s/sweep at 300k, measured r2_nnd.jsonl) against
    <1 ms of device work; at 1M that was the whole build."""

    def body(ci, state):
        adj_new, dist_new, changed = state
        nd, ni, ch = _descent_body(
            space, adj, dist, b, store, xq, qvecs, ci * chunk,
            t_keep=t_keep, count=count, chunk=chunk, xscale=xscale,
        )
        adj_new = jax.lax.dynamic_update_slice_in_dim(adj_new, ni, ci * chunk, 0)
        dist_new = jax.lax.dynamic_update_slice_in_dim(dist_new, nd, ci * chunk, 0)
        return adj_new, dist_new, changed + ch

    return jax.lax.fori_loop(0, nc, body, (adj, dist, jnp.int32(0)))


def _exact_body(space, corpus, adj, base, *, count: int, chunk: int):
    """Exact re-score of the chunk's k-NN lists from the f32 corpus
    (one program for every entry -> authoritative dedup + ordering)."""
    k = adj.shape[1]
    adj_c = jax.lax.dynamic_slice_in_dim(adj, base, chunk, 0)
    node = base + jnp.arange(chunk, dtype=jnp.int32)
    vecs = corpus["vecs"]
    q = vecs[jnp.clip(node, 0, vecs.shape[0] - 1)]
    qe = space.rows_as_queries(q)
    d = G.score_rows(space, qe, corpus, adj_c)
    d = jnp.where((adj_c == node[:, None]) | (adj_c >= count), INF, d)
    return _merge_dedup_sorted(d, adj_c, k)


@partial(jax.jit, static_argnames=("space", "count", "chunk", "nc"))
def _exact_sweep(space, corpus, adj, *, count: int, chunk: int, nc: int):
    """Exact re-score of every chunk's lists in ONE dispatch."""

    def body(ci, state):
        dist_new, adj_new = state
        nd, ni = _exact_body(space, corpus, adj, ci * chunk,
                             count=count, chunk=chunk)
        dist_new = jax.lax.dynamic_update_slice_in_dim(dist_new, nd, ci * chunk, 0)
        adj_new = jax.lax.dynamic_update_slice_in_dim(adj_new, ni, ci * chunk, 0)
        return dist_new, adj_new

    init = (jnp.full(adj.shape, INF), jnp.full(adj.shape, NEG1))
    return jax.lax.fori_loop(0, nc, body, init)


def _exact_aug_body(space, corpus, adj, rand, base, *, count: int, chunk: int):
    """Exact re-score of [k-NN list | random long-link candidates].

    A k-NN candidate list contains NO long edges, so the selection
    heuristic downstream can't retain any — and greedy/beam routing on
    the resulting graph strands in local-minimum pockets (measured:
    self-queries stuck at d~460 with the true node 4 hops away). Random
    augmentation is the Kleinberg small-world fix: a far random node is
    rarely dominated by near neighbors, so the diversity rule keeps it,
    exactly as it keeps the wave build's diverse beam candidates.
    Returns width k + r, sorted ascending by exact distance."""
    adj_c = jax.lax.dynamic_slice_in_dim(adj, base, chunk, 0)
    rand_c = jax.lax.dynamic_slice_in_dim(rand, base, chunk, 0)
    cand = jnp.concatenate([adj_c, rand_c], axis=1)
    node = base + jnp.arange(chunk, dtype=jnp.int32)
    vecs = corpus["vecs"]
    q = vecs[jnp.clip(node, 0, vecs.shape[0] - 1)]
    qe = space.rows_as_queries(q)
    d = G.score_rows(space, qe, corpus, cand)
    d = jnp.where((cand == node[:, None]) | (cand >= count), INF, d)
    return _merge_dedup_sorted(d, cand, cand.shape[1])


@partial(jax.jit, static_argnames=("space", "count", "chunk", "nc"))
def _exact_aug_sweep(space, corpus, adj, rand, *, count: int, chunk: int,
                     nc: int):
    """Exact re-score + random augmentation, ONE dispatch."""
    w = adj.shape[1] + rand.shape[1]

    def body(ci, state):
        dist_new, adj_new = state
        nd, ni = _exact_aug_body(space, corpus, adj, rand, ci * chunk,
                                 count=count, chunk=chunk)
        dist_new = jax.lax.dynamic_update_slice_in_dim(dist_new, nd, ci * chunk, 0)
        adj_new = jax.lax.dynamic_update_slice_in_dim(adj_new, ni, ci * chunk, 0)
        return dist_new, adj_new

    init = (jnp.full((adj.shape[0], w), INF),
            jnp.full((adj.shape[0], w), NEG1))
    return jax.lax.fori_loop(0, nc, body, init)


def _heur_select(space, corpus, adj_c, dist_c, m: int, exact_rule: bool,
                 fill: bool):
    """Neighbor-selection heuristic over (ascending, deduped) candidate
    lists; pair distances from one batched matmul over the gathered rows
    (pairs_from_rows). Returns (sel i32[B, m], seld f32[B, m]).

    ``fill``: top the survivors up to m with the nearest pruned
    candidates (hnswlib's keepPrunedConnections). A k-NN candidate list
    is all-near (unlike a construction beam's diverse frontier), so the
    domination rule alone keeps ~half as many edges as the wave build
    and measurably hurts navigability (self-query misses at any ef)."""
    rows = corpus["vecs"][jnp.clip(adj_c, 0, corpus["vecs"].shape[0] - 1)]
    pair_d = pairs_from_rows(space, rows)
    pair_d = jnp.where(
        (adj_c[:, :, None] < 0) | (adj_c[:, None, :] < 0), INF, pair_d
    )
    base_d = jnp.where(adj_c < 0, INF, dist_c)
    keep = G.select_neighbors_heuristic(base_d, pair_d, m, exact=exact_rule)
    # kept first (ascending d), then pruned-but-valid (ascending d)
    c = adj_c.shape[1]
    pos = jax.lax.broadcasted_iota(jnp.int32, adj_c.shape, 1)
    key = jnp.where(keep, pos, c + pos)
    key = jnp.where((adj_c >= 0) & (base_d < INF), key, 2 * c + pos)
    order = jnp.argsort(key, axis=1)
    sel = jnp.take_along_axis(adj_c, order, 1)[:, :m]
    seld = jnp.take_along_axis(base_d, order, 1)[:, :m]
    selkey = jnp.take_along_axis(key, order, 1)[:, :m]
    lim = 2 * c if fill else c
    return (jnp.where(selkey < lim, sel, NEG1),
            jnp.where(selkey < lim, seld, INF))


@partial(jax.jit, static_argnames=("space", "m", "chunk", "nc", "exact_rule",
                                   "fill", "heur"))
def _prune_sweep(space, corpus, adj, dist, *, m: int, chunk: int, nc: int,
                 exact_rule: bool, fill: bool, heur: bool):
    """Forward selection for every node, ONE dispatch: heuristic over
    each node's k-NN list (or keep-m-closest for delaunay_type=0).
    Returns (sel i32[S, m], seld f32[S, m])."""

    def body(ci, state):
        sel, seld = state
        adj_c = jax.lax.dynamic_slice_in_dim(adj, ci * chunk, chunk, 0)
        dist_c = jax.lax.dynamic_slice_in_dim(dist, ci * chunk, chunk, 0)
        if heur:
            s, sd = _heur_select(space, corpus, adj_c, dist_c, m,
                                 exact_rule, fill)
        else:
            s, sd = adj_c[:, :m], dist_c[:, :m]
        sel = jax.lax.dynamic_update_slice_in_dim(sel, s, ci * chunk, 0)
        seld = jax.lax.dynamic_update_slice_in_dim(seld, sd, ci * chunk, 0)
        return sel, seld

    init = (jnp.full((adj.shape[0], m), NEG1),
            jnp.full((adj.shape[0], m), INF))
    return jax.lax.fori_loop(0, nc, body, init)


@partial(jax.jit, static_argnames=("krev", "count"))
def _rev_nearest(sel, seld, krev: int, count: int):
    """Nearest-``krev`` reverse sources per target: every forward edge
    (src -> tgt, d) competes for tgt's reverse-candidate slots by
    DISTANCE (stable-sorted (tgt, d, src) triples -> first krev per
    group), unlike _make_b's first-come-by-src slot race. Returns
    (rev i32[S, krev], revd f32[S, krev])."""
    s_rows, m = sel.shape
    src = jnp.broadcast_to(
        jnp.arange(s_rows, dtype=jnp.int32)[:, None], (s_rows, m)
    ).reshape(-1)
    tgt = sel.reshape(-1)
    d = seld.reshape(-1)
    valid = (tgt >= 0) & (src < count) & (d < INF)
    skey = jnp.where(valid, tgt, IDBIG)
    dkey = jnp.where(valid, d, INF)
    sn, sd, sp = jax.lax.sort((skey, dkey, src), num_keys=2)
    npairs = tgt.shape[0]
    # scatter-free grouped gather; see _make_b. Pairs sort by (target,
    # distance), so target t's nearest krev sources are the run prefix
    # at gstart[t] — gather them instead of scattering all S*m pairs.
    gstart = jnp.searchsorted(
        sn, jnp.arange(s_rows, dtype=sn.dtype)
    ).astype(jnp.int32)
    idx = gstart[:, None] + jnp.arange(krev, dtype=jnp.int32)[None, :]
    inb = idx < npairs
    idx = jnp.where(inb, idx, npairs - 1)
    hit = inb & (sn[idx] == jnp.arange(s_rows, dtype=sn.dtype)[:, None])
    rev = jnp.where(hit, sp[idx], NEG1)
    revd = jnp.where(hit, sd[idx], INF)
    return rev, revd


@partial(jax.jit, static_argnames=("space", "cap", "chunk", "nc",
                                   "exact_rule", "fill", "heur"))
def _shrink_sweep(space, corpus, sel, seld, rev, revd, *, cap: int,
                  chunk: int, nc: int, exact_rule: bool, fill: bool,
                  heur: bool):
    """Final adjacency in ONE dispatch: per node, heuristic shrink over
    [forward-selected | nearest reverse sources] with their exact
    distances — the batched equivalent of hnswlib's bidirectional-link
    overflow shrink (reference hnsw.h:258-314), replacing the slot-race
    reverse fill. A reverse edge competes by distance+diversity, so a
    node that forward-selects its true neighbors earns in-edges from
    them instead of losing a first-come race (in-degree starvation was
    measured to cap held-out recall at ~0.83 flat in ef at 300k)."""

    def body(ci, out):
        base = ci * chunk
        node = base + jnp.arange(chunk, dtype=jnp.int32)
        cand = jnp.concatenate([
            jax.lax.dynamic_slice_in_dim(sel, base, chunk, 0),
            jax.lax.dynamic_slice_in_dim(rev, base, chunk, 0),
        ], axis=1)
        d = jnp.concatenate([
            jax.lax.dynamic_slice_in_dim(seld, base, chunk, 0),
            jax.lax.dynamic_slice_in_dim(revd, base, chunk, 0),
        ], axis=1)
        d = jnp.where((cand < 0) | (cand == node[:, None]), INF, d)
        d, cand = _merge_dedup_sorted(d, cand, cand.shape[1])
        if heur:
            rows, _ = _heur_select(space, corpus, cand, d, cap,
                                   exact_rule, fill)
        else:
            rows = cand[:, :cap]
        return jax.lax.dynamic_update_slice_in_dim(out, rows, base, 0)

    init = jnp.full((sel.shape[0], cap), NEG1)
    return jax.lax.fori_loop(0, nc, body, init)


@partial(jax.jit, static_argnames=("cap", "count"))
def _reverse_fill(sel, cap: int, count: int):
    """Final adjacency: forward-selected edges + reverse edges packed to
    ``cap`` per row. Reference analog: the bidirectional link pass
    (hnsw.h:258-314); overflow here is impossible by construction
    (m forward + (cap-m) reverse slots), so no shrink scoring."""
    s_rows, m = sel.shape
    krev = max(cap - m, 0)
    if krev == 0:
        return sel[:, :cap]
    rev = _make_b(sel, krev, count)[:, m:]  # [S, krev]
    dup = jnp.any(rev[:, :, None] == sel[:, None, :], axis=2)
    rev = jnp.where(dup | (rev == jnp.arange(s_rows, dtype=jnp.int32)[:, None]), NEG1, rev)
    allx = jnp.concatenate([sel, rev], axis=1)
    return G.pack_selected(allx, allx >= 0, cap)


# ---------------- drivers ----------------


def build_knn_graph(
    space,
    corpus: dict,
    n: int,
    *,
    k: int,
    iters: int,
    krev: int,
    t_keep: int,
    chunk: int,
    seed: int,
    store_dtype: str = "int8",
    min_update_frac: float = 1e-3,
    n_random: int = 6,
    progress=None,
    mark=None,
):
    """Exact-rescored approximate k-NN graph. Returns (dist f32[S, k],
    adj i32[S, k]) on device, rows ascending by exact distance; S is n
    rounded up to the chunk size (rows >= n are all -1/INF)."""
    vecs = corpus["vecs"]
    n_pad = vecs.shape[0]
    c_eff = int(min(chunk, max(128, n_pad)))
    nc = (n_pad + c_eff - 1) // c_eff
    n_state = nc * c_eff

    # quantized scoring copy: int8 corpora (l2sqr_sift, already exact)
    # pass through; f32 corpora quantize symmetric-per-tensor (the int8
    # neighbor-store recipe, methods/hnsw.py _get_nbr_store)
    if vecs.dtype == jnp.int8 or store_dtype == "float32":
        xq, xscale = vecs, 1.0
    else:
        s = float(jnp.max(jnp.abs(vecs))) / 127.0
        xscale = s if s > 0 else 1.0
        xq = jnp.clip(jnp.round(vecs / xscale), -127, 127).astype(jnp.int8)

    # random init (seeded, self-free); pad-state rows stay empty
    rng = np.random.default_rng(seed)
    init = rng.integers(0, max(n, 1), size=(n_state, k), dtype=np.int64)
    init = np.where(init == (np.arange(n_state)[:, None]), (init + 1) % max(n, 1), init)
    init[n:] = -1
    adj = jnp.asarray(init.astype(np.int32))
    # exact-score the random init
    dist, adj = _exact_sweep(space, corpus, adj, count=n, chunk=c_eff, nc=nc)
    if mark:  # opt-in phase profiling (syncs — wall attribution only)
        mark("init_exact", dist)

    # wide-row mode: when one quantized row is already a >= 512 B HBM
    # granule (wide sketches / high-d corpora), the replicated store buys
    # nothing — each candidate ROW gather is sequential — and its n*kb*D
    # residency (6.6 GB at 100k x 96 x 1024 sparse sketches) is what
    # RESOURCE_EXHAUSTED the sparse NND build (batch37 2026-08-19).
    wide_rows = vecs.shape[1] * xq.dtype.itemsize >= 512

    store = None
    for it in range(iters):
        # free the PREVIOUS sweep's replicated store before gathering the
        # next: rebinding `store =` evaluates the gather while the old
        # 8+ GB buffer is still referenced, so two stores sit resident
        # (16+ GB at 1M x kb=64 x 128) — the measured RESOURCE_EXHAUSTED
        # on sweep 2 at 1M/GloVe scales. The int(ch) sync below means the
        # prior sweep has fully consumed it by the time we get here.
        store = None
        b = _make_b(adj, krev, n)
        if not wide_rows:
            store = _gather_store(xq, b)
        adj, dist, ch = _descent_sweep(
            space, adj, dist, b, store, xq, vecs,
            t_keep=t_keep, count=n, chunk=c_eff, xscale=xscale, nc=nc,
        )
        changed = int(ch)  # the one host sync per sweep
        if progress:
            progress(it, changed)
        if changed <= min_update_frac * n * k:
            break
    if mark:
        mark("descent_sweeps", dist)

    # free the neighborhood store (8.2 GB at 1M) before the final exact
    # pass — it is descent-only state
    b = store = None
    # final exact pass, with random long-link candidates appended so
    # the downstream heuristic has far edges to keep (see _exact_aug_body)
    r = max(n_random, 1)
    rnd = rng.integers(0, max(n, 1), size=(n_state, r)).astype(np.int32)
    rnd[n:] = -1
    rand = jnp.asarray(rnd)
    dist, adj = _exact_aug_sweep(space, corpus, adj, rand, count=n,
                                 chunk=c_eff, nc=nc)
    if mark:
        mark("final_exact", dist)
    return dist, adj


def prune_and_link(
    space,
    corpus: dict,
    dist,
    adj,
    n: int,
    *,
    m: int,
    cap: int,
    chunk: int,
    selection: str = "heur",
    fill: bool = True,
    rev_mode: str = "shrink",
    mark=None,
):
    """k-NN lists -> navigable adjacency: heuristic forward selection to
    m edges (pruned-fill per ``fill``), then reverse linking to ``cap``.
    Returns i32[S, cap].

    rev_mode="shrink" (default): gather each node's nearest-``cap``
    reverse sources and heuristic-shrink [forward | reverse] with exact
    distances — bidirectional-insertion semantics (hnsw.h:258-314).
    rev_mode="slots": the first-come reverse slot fill (A/B arm; caps
    recall via in-degree starvation on dense clusters)."""
    n_state = adj.shape[0]
    c_eff = int(min(chunk, n_state))
    nc = (n_state + c_eff - 1) // c_eff
    heur = selection != "none"
    exact_rule = selection != "rng"
    sel, seld = _prune_sweep(
        space, corpus, adj, dist, m=m, chunk=c_eff, nc=nc,
        exact_rule=exact_rule, fill=fill, heur=heur,
    )
    if mark:  # sub-phase sync points (profile-only fault localization)
        mark("pl_prune", sel)
    if rev_mode == "slots":
        return _reverse_fill(sel, cap, n)
    rev, revd = _rev_nearest(sel, seld, cap, n)
    if mark:
        mark("pl_rev", rev)
    out = _shrink_sweep(
        space, corpus, sel, seld, rev, revd, cap=cap, chunk=c_eff, nc=nc,
        exact_rule=exact_rule, fill=fill, heur=heur,
    )
    if mark:
        mark("pl_shrink", out)
    return out


# ---------------- beam polish ----------------


@partial(jax.jit, static_argnames=("space", "efc", "expand", "entry",
                                   "count", "chunk", "nc"))
def _polish_sweep(space, corpus, level0, uppers, dist, adj, store, *,
                  efc: int, expand: int, entry: int, count: int, chunk: int,
                  nc: int):
    """Batched re-insertion: run the QUERY search path (greedy upper
    descent + level-0 beam at efConstruction) for every corpus node over
    the built graph and merge the beam's candidates into its k-NN list.

    Rationale (measured, 300k): the NN-descent candidate pool is all-near
    (k-NN) plus all-far (uniform randoms — high-d concentration leaves
    nothing mid-range), so the pruned graph lacks the distance-halving
    edges greedy routing needs at every scale (Kleinberg) — recall
    plateaued at 0.86 FLAT in ef with healthy in-degree (self-hit ==
    held-out recall: whole regions unreachable from the entry). The
    wave build never has this problem because every node's candidates
    come from an efConstruction BEAM — path candidates at every
    distance scale. This pass reproduces exactly that candidate
    distribution for all nodes at once (Jacobi re-insertion); a node in
    an unreachable region gains edges to its beam PATH (and reverse
    edges from it via the shrink), splicing an improving path into its
    region. ONE dispatch per pass.
    """

    def body(ci, state):
        dist_new, adj_new = state
        base = ci * chunk
        nd, ni = _polish_chunk_math(
            space, corpus, level0, uppers, dist, adj, store, base,
            efc=efc, expand=expand, entry=entry, count=count, chunk=chunk,
        )
        dist_new = jax.lax.dynamic_update_slice_in_dim(dist_new, nd, base, 0)
        adj_new = jax.lax.dynamic_update_slice_in_dim(adj_new, ni, base, 0)
        return dist_new, adj_new

    w_out = dist.shape[1] + efc  # beam_search returns [B, ef]
    init = (jnp.full((dist.shape[0], w_out), INF),
            jnp.full((adj.shape[0], w_out), NEG1))
    return jax.lax.fori_loop(0, nc, body, init)


def _polish_chunk_math(space, corpus, level0, uppers, dist, adj, store,
                       base, *, efc: int, expand: int, entry: int,
                       count: int, chunk: int):
    """One polish chunk: query-path search for ``chunk`` nodes at
    ``base`` + untruncated dedup-merge into their k-NN lists. Shared by
    the fused fori_loop sweep and the host-chunked sweep."""
    node = base + jnp.arange(chunk, dtype=jnp.int32)
    vecs = corpus["vecs"]
    # clipped gather, NOT dynamic_slice: the graph state is padded to
    # a chunk multiple >= the corpus padding, and a clamped slice
    # would misalign q vs node for the whole last chunk
    q = vecs[jnp.clip(node, 0, vecs.shape[0] - 1)]
    qe = space.rows_as_queries(q)
    cur = jnp.full(chunk, entry, jnp.int32)
    cur_d = G.score_rows(space, qe, corpus, cur[:, None])[:, 0]
    for adj_u in reversed(uppers):
        cur, cur_d = G.greedy_descent(space, qe, corpus, adj_u, None,
                                      cur, cur_d)
    bd, bi, _ = G.beam_search(space, qe, corpus, level0, None, cur,
                              ef=efc, expand=expand, nbr_store=store)
    if store is not None:
        # the beam explored on int8 granules (ranking-only); the
        # merged distances feed the downstream selection heuristic,
        # so re-score the survivors exactly from f32 corpus rows —
        # same recipe as the query path and the wave cstore
        bd = G.score_rows(space, qe, corpus, bi)
    bd = jnp.where(
        (bi == node[:, None]) | (bi >= count) | (bi < 0)
        | (node[:, None] >= count),  # pad-state rows stay empty
        INF, bd,
    )
    adj_c = jax.lax.dynamic_slice_in_dim(adj, base, chunk, 0)
    dist_c = jax.lax.dynamic_slice_in_dim(dist, base, chunk, 0)
    cat_d = jnp.concatenate([dist_c, bd], axis=1)
    cat_i = jnp.concatenate([adj_c, bi], axis=1)
    # dedup WITHOUT truncation: a nearest-width cut would let the
    # beam's near candidates displace the list's far/random entries,
    # stripping exactly the diversity the selection heuristic needs
    # (measured: truncating here DROPPED 10k self-hit 0.990 -> 0.967)
    return _merge_dedup_sorted(cat_d, cat_i, cat_d.shape[1])


@partial(jax.jit, static_argnames=("space", "efc", "expand", "entry",
                                   "count", "chunk"),
         donate_argnums=(7, 8))
def _polish_chunk_step(space, corpus, level0, uppers, dist, adj, store,
                       dist_new, adj_new, ci, *, efc: int, expand: int,
                       entry: int, count: int, chunk: int):
    """Host-chunked polish step: same math as the fused sweep's body,
    one dispatch per chunk with the output state donated through."""
    base = ci * chunk
    nd, ni = _polish_chunk_math(
        space, corpus, level0, uppers, dist, adj, store, base,
        efc=efc, expand=expand, entry=entry, count=count, chunk=chunk,
    )
    dist_new = jax.lax.dynamic_update_slice_in_dim(dist_new, nd, base, 0)
    adj_new = jax.lax.dynamic_update_slice_in_dim(adj_new, ni, base, 0)
    return dist_new, adj_new


POLISH_FUSE_MAX = 500_000  # fused-sweep ceiling (see polish_knn_lists)


def polish_knn_lists(space, corpus, level0, uppers, dist, adj, n, *,
                     efc: int, expand: int, entry: int, chunk: int,
                     use_store: bool = False, fuse: bool | None = None,
                     progress=None):
    """One beam-polish pass over all nodes (see _polish_sweep). Returns
    the augmented-and-remerged (dist, adj), same width.

    ``use_store``: explore the polish beam on an int8 replicated-neighbor
    store gathered from the frozen level0 (one [cap, D] granule per
    parent expansion instead of cap row gathers — the beam's dominant,
    granule-count-bound cost), with the survivors re-scored exactly
    before the merge. The caller gates eligibility (dense rows whose
    space can score gathered rows; see methods/hnsw._cstore_ok).

    ``fuse``: None (auto) fuses the whole pass into ONE dispatch up to
    POLISH_FUSE_MAX state rows and host-chunks above it — the fused
    1M program FAULTED THE TPU WORKER (batch42 1mprof: every prior
    phase synced clean, crash surfaced at the polish mark) while the
    same per-chunk math runs standalone at 1M constantly (it IS the
    query path). Host-chunking costs one dispatch per chunk (~19 ms
    each over the tunnel, ~19 s at 1M) against a ~35 s+ phase.
    ``progress(ci, nc, state)``: optional host callback per dispatched
    chunk (profile-mode fault localization — sync ``state`` there to
    pin a faulting chunk range)."""
    n_state = adj.shape[0]
    c_eff = int(min(chunk, n_state))
    nc = (n_state + c_eff - 1) // c_eff
    store = None
    if use_store:
        vecs = corpus["vecs"]
        if vecs.dtype == jnp.int8:
            xq, xscale = vecs, 1.0
        else:
            s = float(jnp.max(jnp.abs(vecs))) / 127.0
            xscale = s if s > 0 else 1.0
            xq = jnp.clip(jnp.round(vecs / xscale), -127, 127).astype(jnp.int8)
        rows = xq[jnp.clip(level0, 0, xq.shape[0] - 1)]  # [S, cap, D]
        store = (rows, xscale)
    # the state must be a chunk multiple or the clamped dynamic slices
    # of the last chunk misalign against `node` — pad, sweep, slice back
    n2 = nc * c_eff
    if n2 != n_state:
        dist = jnp.concatenate([dist, jnp.full((n2 - n_state, dist.shape[1]), INF)])
        adj = jnp.concatenate([adj, jnp.full((n2 - n_state, adj.shape[1]), NEG1)])
    if fuse if fuse is not None else (n2 <= POLISH_FUSE_MAX):
        dist, adj = _polish_sweep(
            space, corpus, level0, tuple(uppers), dist, adj, store,
            efc=efc, expand=expand, entry=int(entry), count=n,
            chunk=c_eff, nc=nc,
        )
    else:
        w_out = dist.shape[1] + efc
        dist_new = jnp.full((n2, w_out), INF)
        adj_new = jnp.full((n2, w_out), NEG1)
        for ci in range(nc):
            dist_new, adj_new = _polish_chunk_step(
                space, corpus, level0, tuple(uppers), dist, adj, store,
                dist_new, adj_new, jnp.int32(ci),
                efc=efc, expand=expand, entry=int(entry), count=n,
                chunk=c_eff,
            )
            if progress is not None:
                progress(ci, nc, dist_new)
        dist, adj = dist_new, adj_new
    return dist[:n_state], adj[:n_state]


# ---------------- reachability repair ----------------


def _reach_from_host(adj_np: np.ndarray, entry: int) -> np.ndarray:
    """Directed-reachability mask from ``entry``: frontier BFS on host
    (each edge touched once). The earlier device formulation — a
    while_loop whose body scatter-maxed all S*cap messages — FAULTED THE
    TPU WORKER at 1M x 48 (48M-element scatter per iteration; fine at
    300k, crash at 1M/1.2M, batch37 2026-08-19). repair_reachability
    downloads the adjacency for its host link-writes anyway, so BFS on
    that same array costs one 192 MB transfer per round at 1M — noise
    next to the build."""
    reach = np.zeros(adj_np.shape[0], bool)
    entry = int(entry)
    if not (0 <= entry < adj_np.shape[0]):
        return reach
    reach[entry] = True
    frontier = np.array([entry], np.int64)
    while frontier.size:
        tgt = adj_np[frontier].reshape(-1)
        tgt = tgt[(tgt >= 0) & (tgt < adj_np.shape[0])]
        tgt = np.unique(tgt)
        new = tgt[~reach[tgt]]
        reach[new] = True
        frontier = new
    return reach


@partial(jax.jit, static_argnames=("space", "count", "csize"))
def _nearest_reached_chunk(space, corpus, u_ids, best_d, best_i, base, *,
                           count: int, csize: int):
    """One corpus chunk of the nearest-REACHED-node scan for the
    unreached batch u_ids (reached mask folded into ``best`` via the
    caller's pad argument ``reached_pad``)."""
    vecs = corpus["vecs"]
    q = vecs[jnp.clip(u_ids, 0, vecs.shape[0] - 1)]
    qe = space.rows_as_queries(q)
    x = jax.lax.dynamic_slice_in_dim(vecs, base, csize, 0)
    xc = {"x": x, "pad": jax.lax.dynamic_slice_in_dim(corpus["_reached_pad"], base, csize, 0)}
    tfr = getattr(space, "term_from_rows", None)
    t = tfr(x.astype(jnp.float32)) if tfr is not None else None
    if t is not None:
        xc["x_term"] = t
    d = space.block(qe, xc)  # [U, csize]
    cols = base + jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)
    d = jnp.where((cols == u_ids[:, None]) | (cols >= count), INF, d)
    better = d.min(axis=1) < best_d
    am = jnp.argmin(d, axis=1)
    nd = jnp.where(better, d.min(axis=1), best_d)
    ni = jnp.where(better, base + am.astype(jnp.int32), best_i)
    return nd, ni


def repair_reachability(space, corpus, adj, n, *, entry: int = 0,
                        chunk: int = 65536, max_rounds: int = 8):
    """Guarantee every real node is reachable from ``entry`` along
    directed level-0 edges — the invariant insertion-based construction
    provides for free and a refinement-built k-NN graph does not
    (clustered data fragments into per-cluster components; an
    unreachable node is invisible to every query at ANY ef). For each
    unreached node: link it from its exact nearest reached node
    (overwriting that node's last slot) and back, then re-propagate.
    Returns the repaired adjacency and the number of repaired nodes."""
    s_rows, cap = adj.shape
    repaired = 0
    for _ in range(max_rounds):
        host = np.array(adj)  # one writable download per round (BFS + links)
        reach = _reach_from_host(host, entry)
        un = np.where(~reach[:n])[0]
        if un.size == 0:
            break
        upad = int(np.ceil(un.size / 128)) * 128
        u_ids = jnp.asarray(
            np.concatenate([un, np.full(upad - un.size, n - 1)]).astype(np.int32)
        )
        # reached-only scoring mask rides the corpus dict as a pad row
        rp = np.full(corpus["vecs"].shape[0], np.float32(INF))
        rp[: n][reach[:n]] = 0.0
        c2 = dict(corpus)
        c2["_reached_pad"] = jnp.asarray(rp)
        best_d = jnp.full(upad, INF)
        best_i = jnp.full(upad, NEG1)
        csize = int(min(chunk, corpus["vecs"].shape[0]))
        nc = (corpus["vecs"].shape[0] + csize - 1) // csize
        for ci in range(nc):
            base = min(ci * csize, corpus["vecs"].shape[0] - csize)
            best_d, best_i = _nearest_reached_chunk(
                space, c2, u_ids, best_d, best_i, base, count=n, csize=csize
            )
        tgt = np.asarray(best_i)[: un.size]
        ok = tgt >= 0
        un, tgt = un[ok], tgt[ok]
        if un.size == 0:
            break
        # one link per reached anchor this round (collisions retry next
        # round against the freshly-reached set)
        _, first = np.unique(tgt, return_index=True)
        un, tgt = un[np.sort(first)], tgt[np.sort(first)]
        for u, t in zip(un, tgt):
            arow = host[t]  # anchor -> node: makes it reachable
            free = np.where(arow < 0)[0]
            arow[free[0] if free.size else cap - 1] = u
            row = host[u]  # node -> anchor: a way back out
            if t not in row:
                free = np.where(row < 0)[0]
                row[free[0] if free.size else cap - 1] = t
        adj = jnp.asarray(host)
        repaired += int(un.size)
    return adj, repaired


@partial(jax.jit, static_argnames=("space", "n_l", "k", "chunk"))
def _level_knn_chunk(space, corpus, rand, base, *, n_l: int, k: int, chunk: int):
    """Exact k-NN of member chunk [base, base+chunk) among members
    [0, n_l) (level-sorted order makes every level a prefix), plus the
    node's random long-link candidates (same rationale as
    _exact_aug_body — upper-level greedy routing needs far edges too).
    One full-width affine block + top-k — upper levels are small enough
    (N_l <= N/M) that brute force beats any index."""
    from .topk import smallest_k

    vecs = corpus["vecs"]
    node = base + jnp.arange(chunk, dtype=jnp.int32)
    q = vecs[jnp.clip(node, 0, vecs.shape[0] - 1)]
    qe = space.rows_as_queries(q)
    n_lp = min(((n_l + 127) // 128) * 128, vecs.shape[0])
    x = jax.lax.slice_in_dim(vecs, 0, n_lp, axis=0)
    xc = {"x": x, "pad": jnp.where(jnp.arange(n_lp) >= n_l, INF, 0.0)}
    tfr = getattr(space, "term_from_rows", None)
    t = tfr(x.astype(jnp.float32)) if tfr is not None else None
    if t is not None:
        xc["x_term"] = t
    d = space.block(qe, xc)  # [C, n_lp]
    cols = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)
    d = jnp.where(cols == node[:, None], INF, d)
    kk = min(k, n_lp)
    dk, ik = smallest_k(d, kk)
    rand_c = jax.lax.dynamic_slice_in_dim(rand, base, chunk, 0)
    rsafe = jnp.clip(rand_c, 0, n_lp - 1)
    rd = jnp.take_along_axis(d, rsafe, axis=1)
    rd = jnp.where((rand_c < 0) | (rand_c >= n_l), INF, rd)
    dk = jnp.concatenate([dk, rd], axis=1)
    ik = jnp.concatenate([ik, rand_c], axis=1)
    if kk < k:
        dk = jnp.concatenate([dk, jnp.full((chunk, k - kk), INF)], axis=1)
        ik = jnp.concatenate([ik, jnp.full((chunk, k - kk), NEG1)], axis=1)
    return _merge_dedup_sorted(dk, jnp.where(dk >= INF, NEG1, ik), dk.shape[1])


def build_level_exact(
    space, corpus: dict, n_l: int, *, m: int, cap: int, k_cand: int,
    chunk: int, selection: str = "heur", fill: bool = True,
    n_random: int = 6, seed: int = 0, rev_mode: str = "shrink",
):
    """One upper level: exact k-NN among the first n_l nodes + the same
    prune/reverse-fill as level 0. Returns i32[n_l, cap]."""
    c_eff = int(min(chunk, max(n_l, 1)))
    nc = (n_l + c_eff - 1) // c_eff
    rng = np.random.default_rng(seed + 7919 * n_l)
    rand = jnp.asarray(
        rng.integers(0, max(n_l, 1), size=(nc * c_eff, max(n_random, 1))).astype(np.int32)
    )
    parts = [
        _level_knn_chunk(
            space, corpus, rand, ci * c_eff, n_l=n_l, k=k_cand, chunk=c_eff
        )
        for ci in range(nc)
    ]
    dist = jnp.concatenate([p[0] for p in parts])
    adj = jnp.concatenate([p[1] for p in parts])
    out = prune_and_link(
        space, corpus, dist, adj, n_l, m=m, cap=cap, chunk=c_eff,
        selection=selection, fill=fill, rev_mode=rev_mode,
    )
    return out[:n_l]
