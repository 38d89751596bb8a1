"""HNSW — hierarchical navigable small-world graph, TPU-native.

Reference: include/method/hnsw.h, src/method/hnsw.cc (SURVEY.md §2.2).
What is preserved: the layered structure (geometric level sampling with
mult = 1/ln(M), hnsw.h:478-483), efConstruction-bounded candidate
search, neighbor-selection heuristic (delaunay_type=2, hnsw.h:129-168),
bidirectional linking with shrink-on-overflow (hnsw.h:258-314), maxM0 =
2M level-0 capacity, and the ef-bounded best-first query search.

What is redesigned for TPU (SURVEY.md §7):
  * The graph IS the reference's "optimized flat index" (hnsw.cc:353-470)
    made explicit: level-0 adjacency i32[N, maxM0], upper levels
    i32[N_l, maxM]. Insertion order is sorted by level (descending), so
    the nodes present on level l are exactly internal ids < N_l — no
    slot maps or per-node link-list allocations, and the global entry
    point is internal id 0.
  * Construction is *batched insertion waves*: a whole wave of points
    runs beam search against the frozen pre-wave graph at once, neighbor
    selection is vectorized, and reverse edges are applied with a
    sort/group/scatter pass instead of per-node mutexes
    (hnsw.cc:238-247). Within-wave connectivity is preserved by merging
    each point's nearest wave-mates into its candidate set.
  * Queries run as one batched beam search (ops/graph.py).

Parameter surface matches the reference (hnsw.cc:185-218, 472-507):
M, maxM, maxM0, efConstruction, mult, delaunay_type, post,
indexThreadQty, skip_optimized_index; query-time ef/efSearch, algoType.
Range search raises, as in the reference (hnsw.cc:710-715).
"""

from __future__ import annotations

import math
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..core.dataset import DataStore, round_up
from ..core.errors import IndexNotBuiltError, SpaceIncompatibleError
from ..core.params import ParamManager, Params
from ..core.registry import register_method
from ..ops import graph as G
from ..ops import qpack as Q
from ..ops.topk import INF
from ..utils.logging import log
from ..utils.rng import np_rng
from .base import Method

NEG1 = np.int32(-1)  # numpy, not jnp — no backend init at import (ops/sparse.py PAD_Q note)

#: Ramped head-wave schedule (see _run_waves). A/B harness flag: the
#: ramp fixed the small-corpus backbone collapse (0.53 -> 1.0 recall at
#: n=2048/waveSize=1024, round 4); False restores the fixed-width
#: schedule for order-sensitivity studies.
WAVE_RAMP = True


def _corpus_dict(space, data) -> dict:
    """Row-indexed corpus arrays for gather-based search (delegates to the
    space so sparse/string layouts provide their own keys)."""
    return space.corpus_dict(data)


def _gather_qenc(qenc_all: dict, ids, n_total: int):
    """Gather per-node query encodings at arbitrary node-id arrays."""
    out = {}
    for k, v in qenc_all.items():
        if hasattr(v, "ndim") and v.ndim >= 1 and v.shape[0] == n_total:
            out[k] = v[ids]
        else:
            out[k] = v
    return out


def _score_pairs(space, qenc_all, n_total, corpus, ids_a, ids_b):
    """d(a_i, b_j) for per-row candidate sets: ids_a [B, C], ids_b [B, C2]
    -> [B, C, C2]. Uses each candidate's own query encoding against
    gathered corpus rows, so it is valid for every space (including
    asymmetric divergences)."""
    from ..ops.graph import gather_rows, inject_term

    b = ids_a.shape[0]
    rows, pad, extra = gather_rows(corpus, ids_b)  # [B, C2, ...]
    extra = inject_term(space, rows, extra)

    qe = _gather_qenc(qenc_all, jnp.clip(ids_a, 0, n_total - 1), n_total)

    # sparse dot/jaccard family: per-candidate densified tables +
    # take_along_axis gathers (spaces/sparse.py pair_block) — the
    # searchsorted formulation below is a TPU-worker-fault suspect
    pb = getattr(space, "pair_block", None)
    vm = corpus.get("vocab_mark")
    if pb is not None and vm is not None:
        d = pb(qe, rows, pad, extra, vm.shape[0])
        if d is not None:
            return jnp.where(ids_a[:, :, None] < 0, INF, d)

    aff = space.pass1_affine() if hasattr(space, "pass1_affine") else None
    if aff is not None and hasattr(rows, "ndim") and rows.ndim == 3:
        from ..ops.distance import pair_dot

        scale, sq, sx = aff
        g = pair_dot(qe["q"], rows)
        s = scale * g
        if sq != 0.0 and "q_term" in qe:
            s = s + sq * qe["q_term"][:, :, None]
        if sx != 0.0 and "x_term" in extra:
            s = s + sx * extra["x_term"][:, None, :]
        d = space.pass1_post(s, qe) + pad[:, None, :]
        return jnp.where(ids_a[:, :, None] < 0, INF, d)

    def one(qe_row, r, p, ex):
        xc = {"x": r, "pad": p}
        xc.update(ex)
        return space.block(qe_row, xc)  # [C, C2]

    axes_q = {
        k: (0 if hasattr(v, "ndim") and v.ndim >= 2 and v.shape[0] == b else None)
        for k, v in qe.items()
    }

    def run(qe_b, rows_b, pad_b, extra_b):
        return jax.vmap(one, in_axes=(axes_q, 0, 0, {k: 0 for k in extra}))(
            qe_b, rows_b, pad_b, extra_b
        )

    # generic (lookup-scored) spaces materialize [b, C, C2, nnz]-sized
    # intermediates; one flat vmap over b=8192 reverse-update rows blew
    # the sparse wave program past the 16GB HBM compile estimate — run
    # in row blocks under lax.map instead
    blk = 512
    if b <= blk:
        d = run(qe, rows, pad, extra)
    else:
        bp = ((b + blk - 1) // blk) * blk

        def padb(v, is_rowed):
            if not is_rowed:
                return v
            padv = jnp.zeros((bp - b,) + v.shape[1:], v.dtype)
            return jnp.concatenate([v, padv], 0).reshape((bp // blk, blk) + v.shape[1:])

        qe_b = {k: padb(v, axes_q[k] == 0) for k, v in qe.items()}
        mapped = jax.lax.map(
            lambda a: run(
                {k: (a[0][k] if axes_q[k] == 0 else qe[k]) for k in qe},
                a[1], a[2], a[3],
            ),
            (
                {k: v for k, v in qe_b.items() if axes_q[k] == 0},
                padb(rows, True),
                padb(pad, True),
                {k: padb(v, True) for k, v in extra.items()},
            ),
        )
        d = mapped.reshape((bp,) + mapped.shape[2:])[:b]
    return jnp.where(ids_a[:, :, None] < 0, INF, d)


def make_wave_step(
    space,
    n_total: int,
    w: int,
    max_level: int,
    *,
    efc: int,
    m: int,
    m0cap: int,
    mcap: int,
    mates: int,
    expand: int,
    selection: str,  # "none" (delaunay_type=0: keep closest), "heur", "rng"
    exact_space=None,
    exact_pairs: bool = False,
    exact_base: bool = True,
    exact_shrink: bool = False,
    use_cstore: bool = False,
    merge_forward: bool = False,
):
    """Build the (unjitted) batched insertion wave step.

    Module-level so the corpus-sharded builder (parallel/hnsw_sharded.py)
    can run the same step for every shard at once under shard_map.

    NB: corpus/qenc_all are traced ARGUMENTS of the wave step, never
    closure constants — a closed-over corpus would be baked into the
    compiled program (512MB of constants at 1M rows, which also
    overflows remote-compile request limits).

    ``use_cstore``: maintain an int8 replicated-neighbor store aligned to
    the LEVEL-0 adjacency across waves and ride the level-0 construction
    beam on it (the query-time nbr_store trick applied at build time).
    Rationale: gathers are granule-count-bound (~45M/s on v5e), and the
    beam's candidate row gathers (w*expand*m0cap rows per iteration) are
    its dominant cost; the store turns them into w*expand granule reads.
    Maintenance is cheap — each wave rewrites only the rows its level-0
    scatters touched (wave rows + reverse targets, ~w*(M+1) granules).
    Selection stays exact: the beam's ef candidates are re-scored from
    f32 corpus rows before the heuristic, so quantization only perturbs
    which candidates the beam EXPLORES (same regime as the query-time
    int8 store, safe at ef >= 14; construction runs ef ~ 100)."""
    oob = jnp.int32(2**30)

    def wave_step(
        level0, upper, start, wl, entry, limit, corpus, qenc_all,
        ecorpus=None, eqenc_all=None, cstore=None, xq=None, xscale=None,
    ):
        """Insert/refresh points [start, start+w). ``limit`` bounds
        which graph nodes may be linked to: ``start`` during the
        initial build (frozen prefix), ``n`` during post passes
        (full visibility; reference: hnsw.cc:251-338)."""
        def level_candidates(adj, limit, wave_ids, wl, l, cur):
            """Beam over the frozen graph + nearest wave-mates, heuristic-
            selected down to M forward neighbors. Returns (sel [W,M],
            best_d [W], best_i [W]) where best_* trace the closest point
            seen (for entry hand-off to the next level)."""
            qe = _gather_qenc(qenc_all, wave_ids, n_total)
            qe = G.densify_queries(space, qe, corpus)
            nbr_store = (cstore, xscale) if (use_cstore and l == 0) else None
            beam_d, beam_i, _ = G.beam_search(
                space, qe, corpus, adj, None, cur, ef=efc, expand=expand,
                nbr_store=nbr_store,
            )
            frozen_ok = (beam_i < limit) & (beam_i >= 0) & (beam_i != wave_ids[:, None])
            beam_i = jnp.where(frozen_ok, beam_i, NEG1)
            beam_d = jnp.where(frozen_ok, beam_d, INF)

            mate_ids = jnp.broadcast_to(wave_ids[None, :], (w, w))
            # the mate row set is the SAME [w] rows for every wave point:
            # one [w, ...] gather + one [w, w] block, not a w*w*D gather
            from ..ops.graph import gather_rows, inject_term

            rows1, pad1, extras1 = gather_rows(corpus, wave_ids[None, :])
            extras1 = inject_term(space, rows1, extras1)
            xc_wave = {"x": rows1[0], "pad": pad1[0]}
            xc_wave.update({kk: vv[0] for kk, vv in extras1.items()})
            if "vocab_mark" in corpus:
                # route sparse mate scoring through the densified paths
                # (q_dense gather / dense-after-scatter), not searchsorted
                xc_wave["vocab_mark"] = corpus["vocab_mark"]
            mate_d = space.block(qe, xc_wave)  # [w, w]
            bad = (mate_ids == wave_ids[:, None]) | (wl[None, :] < l) | (wl[None, :] < 0)
            mate_d = jnp.where(bad, INF, mate_d)
            mneg, mpos = jax.lax.top_k(-mate_d, mates)
            mate_sel = jnp.take_along_axis(mate_ids, mpos, 1)
            mate_sel = jnp.where(mneg > -INF, mate_sel, NEG1)
            mate_dd = jnp.where(mneg > -INF, -mneg, INF)
            dup = jnp.any(mate_sel[:, :, None] == beam_i[:, None, :], axis=2)
            mate_sel = jnp.where(dup, NEG1, mate_sel)
            mate_dd = jnp.where(dup, INF, mate_dd)

            cand_i = jnp.concatenate([beam_i, mate_sel], axis=1)
            cand_d = jnp.concatenate([beam_d, mate_dd], axis=1)
            cand_d, cand_i = jax.lax.sort((cand_d, cand_i), num_keys=1)
            if exact_base and exact_space is not None and ecorpus is not None:
                # hybrid refinement (sketch-proxy builds): the beam found
                # the candidates with proxy scores; their base distances
                # are recomputed EXACTLY in the host space so neighbor
                # selection ranks true neighbors first. The proxy's
                # _sketch_post puts proxy pair values on the host
                # distance scale so pair-vs-base comparisons remain
                # consistent when exact_pairs is off.
                eqe = _gather_qenc(eqenc_all, wave_ids, n_total)
                eqe = G.densify_queries(exact_space, eqe, ecorpus)
                cand_d = G.score_rows(exact_space, eqe, ecorpus, cand_i)
                cand_d, cand_i = jax.lax.sort((cand_d, cand_i), num_keys=1)
            elif use_cstore and l == 0:
                # the beam ranked candidates by dequantized-int8 store
                # scores; re-score them from the f32 corpus rows so the
                # selection heuristic (and the stored edge distances the
                # reverse shrink competes on) stay exact
                cand_d = G.score_rows(space, qe, corpus, cand_i)
                cand_d, cand_i = jax.lax.sort((cand_d, cand_i), num_keys=1)
            if selection == "none":
                # delaunay_type=0 (reference hnsw.cc:581-586): keep the M
                # closest candidates, no pruning — and no pair scoring
                valid = cand_d < INF
                keep = valid & (jnp.cumsum(valid, axis=1) <= m)
            else:
                if exact_pairs and exact_space is not None and ecorpus is not None:
                    # exact pair distances for the selection heuristic: on
                    # near-tied data (true gaps below JL noise) proxy pair
                    # scores make the prune decisions random — measured 4k
                    # bag-of-words recall 0.92 -> matches the reference's
                    # 0.98 (ef=100) with exact construction scoring
                    pair_d = _score_pairs(
                        exact_space, eqenc_all, n_total, ecorpus, cand_i, cand_i
                    )
                else:
                    pair_d = _score_pairs(space, qenc_all, n_total, corpus, cand_i, cand_i)
                keep = G.select_neighbors_heuristic(
                    cand_d, pair_d, m, exact=selection != "rng"
                )
            sel = G.pack_selected(cand_i, keep, m)
            connect = (wl >= l) & (wl >= 0)
            sel = jnp.where(connect[:, None], sel, NEG1)
            # entry hand-off for the next level: the closest FROZEN beam
            # node only (the reference descends through inserted nodes,
            # hnsw.cc:593-599 "memorizing the closest"). A wave-mate may
            # score closer, but its lower-level adjacency rows are not
            # scattered yet — handing off to it would strand the next
            # level's beam on an empty row and degrade this point's
            # lower-level links to wave-mates only. beam_d/beam_i are
            # already frozen-masked (INF/-1) above. NB: with the hybrid
            # exact refinement, beam_d stays on the PROXY scale, matching
            # cur_d across levels.
            bpos = jnp.argmin(beam_d, axis=1)
            best_d = jnp.take_along_axis(beam_d, bpos[:, None], 1)[:, 0]
            best_i = jnp.take_along_axis(beam_i, bpos[:, None], 1)[:, 0]
            return sel, best_d, best_i

        def scatter_forward(adj, cap, sel, wave_ids, connect, qe):
            if not merge_forward:
                fwd = (
                    jnp.concatenate([sel, jnp.full((w, cap - m), NEG1)], axis=1)
                    if cap > m
                    else sel[:, :cap]
                )
                tgt = jnp.where(connect, wave_ids, oob)
                return adj.at[tgt].set(fwd, mode="drop")
            # post-pass merge: REPLACING the row with the fresh selection
            # wipes the reverse edges the row accumulated — processed in
            # reverse order, nodes whose wave runs late end the pass with
            # forward-only rows and hub in-degree collapses (measured:
            # the exact post pass DROPPED 100k sparse recall 0.978 ->
            # 0.516 with replace semantics). Merge old ∪ sel and shrink
            # to cap with the same heuristic the reverse path uses.
            old = adj[jnp.clip(wave_ids, 0, adj.shape[0] - 1)]  # [w, cap]
            dup = jnp.any(sel[:, :, None] == old[:, None, :], axis=2)
            selx = jnp.where(dup, NEG1, sel)
            cand = jnp.concatenate([old, selx], axis=1)  # [w, cap+m]
            cand = jnp.where(cand == wave_ids[:, None], NEG1, cand)
            if exact_shrink and exact_space is not None and ecorpus is not None:
                # exactShrink: prune decisions of the merge shrink run in
                # the exact host space (level_candidates' exact_pairs
                # branch mirrored; ADVICE r3 — with proxy scoring, near-
                # tied shrink decisions fall back to the JL-noise regime
                # exactPairs was added to fix)
                eqe_f = _gather_qenc(eqenc_all, wave_ids, n_total)
                eqe_f = G.densify_queries(exact_space, eqe_f, ecorpus)
                base_d = G.score_rows(exact_space, eqe_f, ecorpus, cand)
            else:
                base_d = G.score_rows(space, qe, corpus, cand)
            old_deg = jnp.sum(old >= 0, axis=1)
            add_cnt = jnp.sum(selx >= 0, axis=1)
            overflow = old_deg + add_cnt > cap
            appended = G.pack_selected(cand, cand >= 0, cap)
            sd, si = jax.lax.sort((base_d, cand), num_keys=1)
            if selection == "none":
                validr = sd < INF
                keep = validr & (jnp.cumsum(validr, axis=1) <= cap)
            elif exact_shrink and exact_space is not None and ecorpus is not None:
                pair_d = _score_pairs(exact_space, eqenc_all, n_total, ecorpus, si, si)
                keep = G.select_neighbors_heuristic(
                    sd, pair_d, cap, exact=selection != "rng"
                )
            else:
                pair_d = _score_pairs(space, qenc_all, n_total, corpus, si, si)
                keep = G.select_neighbors_heuristic(
                    sd, pair_d, cap, exact=selection != "rng"
                )
            shrunk = G.pack_selected(si, keep, cap)
            newrow = jnp.where(overflow[:, None], shrunk, appended)
            tgt = jnp.where(connect, wave_ids, oob)
            return adj.at[tgt].set(newrow, mode="drop")

        def reverse_update(adj, cap, sel, wave_ids, connect):
            """Insert each wave node into its selected neighbors' rows;
            overflowing rows are shrunk with the heuristic (reference:
            hnsw.h:258-314 link + addFriendlevel shrink)."""
            p_ids = jnp.broadcast_to(wave_ids[:, None], sel.shape).reshape(-1)
            n_ids = sel.reshape(-1)
            valid = (n_ids >= 0) & jnp.broadcast_to(connect[:, None], sel.shape).reshape(-1)
            npairs = n_ids.shape[0]
            skey = jnp.where(valid, n_ids, oob)
            order = jnp.argsort(skey)
            sn, sp, sv = skey[order], p_ids[order], valid[order]
            first = (jnp.concatenate([jnp.ones(1, bool), sn[1:] != sn[:-1]])) & sv
            gid = jnp.cumsum(first) - 1  # group index (valid rows only)
            gid = jnp.clip(gid, 0, npairs - 1)
            iar = jnp.arange(npairs, dtype=jnp.int32)
            gstart = (
                jnp.zeros(npairs, jnp.int32).at[gid].max(jnp.where(first, iar, 0))
            )
            pos = iar - gstart[gid]
            gcap = mates  # insertion cap per neighbor per wave
            okslot = sv & (pos < gcap)
            new_c = jnp.full((npairs, gcap), NEG1)
            new_c = new_c.at[
                jnp.where(okslot, gid, npairs), jnp.clip(pos, 0, gcap - 1)
            ].set(jnp.where(okslot, sp, NEG1), mode="drop")
            grp_n = jnp.full(npairs, NEG1).at[gid].max(jnp.where(first, sn, NEG1))
            grp_valid = grp_n >= 0
            base = jnp.where(grp_valid, grp_n, 0)

            old = adj[base]  # [P, cap]
            # drop inserts already present in the row (post passes re-insert)
            dup_old = jnp.any(new_c[:, :, None] == old[:, None, :], axis=2)
            new_c = jnp.where(dup_old, NEG1, new_c)
            cand = jnp.concatenate([old, new_c], axis=1)  # [P, cap+gcap]
            if exact_shrink and exact_space is not None and ecorpus is not None:
                # exactShrink: the reverse shrink competes stored edges
                # against the insert in the exact host space (see the
                # scatter_forward merge-path comment)
                qe = _gather_qenc(eqenc_all, base, n_total)
                qe = G.densify_queries(exact_space, qe, ecorpus)
                base_d = G.score_rows(exact_space, qe, ecorpus, cand)
            else:
                qe = _gather_qenc(qenc_all, base, n_total)
                base_d = G.score_rows(space, qe, corpus, cand)
            old_deg = jnp.sum(old >= 0, axis=1)
            add_cnt = jnp.sum(new_c >= 0, axis=1)
            overflow = old_deg + add_cnt > cap

            # append path: valid entries first, order preserved
            appended = G.pack_selected(cand, cand >= 0, cap)

            # shrink path over all candidates of the row owner: the
            # heuristic, or (delaunay_type=0) drop-the-farthest semantics
            # = keep the cap closest (reference hnsw.h:301-312)
            sd, si = jax.lax.sort((base_d, cand), num_keys=1)
            if selection == "none":
                validr = sd < INF
                keep = validr & (jnp.cumsum(validr, axis=1) <= cap)
            elif exact_shrink and exact_space is not None and ecorpus is not None:
                pair_d = _score_pairs(exact_space, eqenc_all, n_total, ecorpus, si, si)
                keep = G.select_neighbors_heuristic(
                    sd, pair_d, cap, exact=selection != "rng"
                )
            else:
                pair_d = _score_pairs(space, qenc_all, n_total, corpus, si, si)
                keep = G.select_neighbors_heuristic(
                    sd, pair_d, cap, exact=selection != "rng"
                )
            shrunk = G.pack_selected(si, keep, cap)

            newrow = jnp.where(overflow[:, None], shrunk, appended)
            tgt = jnp.where(grp_valid, base, oob)
            return adj.at[tgt].set(newrow, mode="drop")

        wave_ids = start + jnp.arange(w, dtype=jnp.int32)
        qe = _gather_qenc(qenc_all, wave_ids, n_total)
        qe = G.densify_queries(space, qe, corpus)
        cur = jnp.full(w, entry, jnp.int32)  # global entry point
        cur_d = G.score_rows(space, qe, corpus, cur[:, None])[:, 0]
        new_upper = list(upper)
        for l in range(max_level, 0, -1):
            adj = new_upper[l - 1]
            connect = (wl >= l) & (wl >= 0)
            sel, best_d, best_i = level_candidates(adj, limit, wave_ids, wl, l, cur)
            adj = scatter_forward(adj, mcap, sel, wave_ids, connect, qe)
            adj = reverse_update(adj, mcap, sel, wave_ids, connect)
            new_upper[l - 1] = adj
            better = (best_i >= 0) & (best_d < cur_d)
            cur = jnp.where(better, best_i, cur)
            cur_d = jnp.where(better, best_d, cur_d)
        connect0 = wl >= 0
        sel, _, _ = level_candidates(level0, limit, wave_ids, wl, 0, cur)
        level0 = scatter_forward(level0, m0cap, sel, wave_ids, connect0, qe)
        level0 = reverse_update(level0, m0cap, sel, wave_ids, connect0)
        if use_cstore:
            # refresh the store rows this wave's level-0 scatters touched:
            # the wave rows themselves (scatter_forward) and every
            # forward-selected target (reverse_update rewrites exactly the
            # rows grouped from sel). Duplicate ids in `ch` all write the
            # value derived from the same post-update level0 row, so the
            # unordered scatter is deterministic. ~w*(M+1) granules/wave.
            ch = jnp.concatenate([
                jnp.where(connect0, wave_ids, oob),
                jnp.where(sel >= 0, sel, oob).reshape(-1),
            ])
            rows_ids = level0[jnp.clip(ch, 0, level0.shape[0] - 1)]
            vr = xq[jnp.clip(rows_ids, 0, xq.shape[0] - 1)]
            cstore = cstore.at[ch].set(vr, mode="drop")
            return level0, new_upper, cstore
        return level0, new_upper

    return wave_step


# ---------------- jitted search ----------------


@partial(jax.jit, static_argnames=("space", "ef", "k", "expand"))
def _hnsw_search(
    space, qenc, data, level0, upper, entry, ef: int, k: int, expand: int,
    nbr_store=None,
):
    return _search_core(space, qenc, data, level0, upper, entry, ef, k,
                        expand, nbr_store)


@partial(jax.jit, static_argnames=("space", "qmeta", "entry", "ef", "k", "expand"))
def _hnsw_search_packed(
    space, qbuf, qmeta, data, level0, upper, entry: int, ef: int, k: int,
    expand: int, nbr_store=None,
):
    """Packed-transport variant (ops/qpack.py): ONE uploaded query
    buffer in, ONE packed [B, 2k] result array out. The unpack, the
    derived query terms (space.complete_queries) and the result pack
    all run inside this program, so a remote-device query batch costs
    one upload + one dispatch + one download instead of a round trip
    per query array / eager term / result array."""
    qenc = space.complete_queries(Q.unpack_device(qbuf, qmeta))
    d, ids, nd = _search_core(
        space, qenc, data, level0, upper, jnp.int32(entry), ef, k, expand,
        nbr_store,
    )
    return Q.pack_results(d, ids), nd


def _search_core(
    space, qenc, data, level0, upper, entry, ef: int, k: int, expand: int,
    nbr_store=None,
):
    corpus = _corpus_dict(space, data)
    b = next(v.shape[0] for v in qenc.values() if hasattr(v, "ndim") and v.ndim >= 1)
    cur = jnp.full(b, entry, jnp.int32)
    cur_d = G.score_rows(space, qenc, corpus, cur[:, None])[:, 0]
    for adj in reversed(upper):
        cur, cur_d = G.greedy_descent(space, qenc, corpus, adj, None, cur, cur_d)
    beam_d, beam_i, nd = G.beam_search(
        space, qenc, corpus, level0, None, cur, ef=ef, expand=expand,
        nbr_store=nbr_store,
    )
    if nbr_store is not None:
        # beam ordering used bf16-replicated rows; re-score a top slice
        # exactly and re-sort so reported distances/ids are exact
        kk = min(ef, k + 6)
        sl_i = beam_i[:, :kk]
        sl_d = G.score_rows(space, qenc, corpus, sl_i)
        sl_d = jnp.where(sl_i < 0, INF, sl_d)
        from ..ops.topk import smallest_k

        d, sel = smallest_k(sl_d, k)
        pos = jnp.take_along_axis(sl_i, sel, 1)
        pos = jnp.where(jnp.isinf(d), -1, pos)
    else:
        d, pos = beam_d[:, :k], beam_i[:, :k]
    ids = jnp.where(pos >= 0, data.ids[jnp.clip(pos, 0, data.ids.shape[0] - 1)], -1)
    return d, ids, nd


@partial(jax.jit, static_argnames=("pspace", "rspace", "ef", "k", "expand"))
def _hnsw_search_sketch(
    pspace, rspace, qenc_p, qenc_r, pdata, rdata, level0, upper, entry,
    ef: int, k: int, expand: int,
):
    """Beam search on the dense sketch proxy + exact host-space re-rank
    of the full beam (so reported distances/ids are exact; the proxy
    only steers traversal)."""
    pcorpus = pspace.corpus_dict(pdata)
    b = qenc_p["q"].shape[0]
    cur = jnp.full(b, entry, jnp.int32)
    cur_d = G.score_rows(pspace, qenc_p, pcorpus, cur[:, None])[:, 0]
    for adj in reversed(upper):
        cur, cur_d = G.greedy_descent(pspace, qenc_p, pcorpus, adj, None, cur, cur_d)
    _, beam_i, nd = G.beam_search(
        pspace, qenc_p, pcorpus, level0, None, cur, ef=ef, expand=expand
    )
    rcorpus = rspace.corpus_dict(rdata)
    ex_d = G.score_rows(rspace, qenc_r, rcorpus, beam_i)  # exact [B, ef]
    from ..ops.topk import smallest_k

    d, sel = smallest_k(ex_d, k)
    pos = jnp.take_along_axis(beam_i, sel, 1)
    pos = jnp.where(d >= INF, -1, pos)
    ids = jnp.where(pos >= 0, rdata.ids[jnp.clip(pos, 0, rdata.ids.shape[0] - 1)], -1)
    return d, ids, nd + jnp.sum(beam_i >= 0)


@register_method("hnsw")
class Hnsw(Method):
    name = "hnsw"
    supports_range = False

    def __init__(self, space, params: Params | None = None):
        super().__init__(space, params)
        pm = ParamManager(self.index_params)
        self.M = pm.get("M", 16, int)
        self.maxM = pm.get("maxM", self.M, int)
        self.maxM0 = pm.get("maxM0", 2 * self.M, int)
        self.ef_construction = pm.get("efConstruction", 200, int)
        self.mult = pm.get("mult", 1.0 / math.log(max(self.M, 2)), float)
        self.delaunay_type = pm.get("delaunay_type", 2, int)
        self.post = pm.get("post", 0, int)
        pm.get("indexThreadQty", 0, int)  # parity no-op: waves batch instead
        pm.get("skip_optimized_index", 0, int)  # flat layout is the only layout
        self.wave = pm.get("waveSize", 256, int)
        self.wave_mates = pm.get("waveMates", 8, int)
        self.expand = pm.get("searchExpand", 4, int)
        self._expand_default = self.expand  # restored by reset (None) below
        # construction beams run at efConstruction (~100-200). The round-1
        # expand=16 default was picked off UNSYNCED build walls (they
        # timed async dispatch only); the synced re-tune at 300k
        # (r2_btune.jsonl) measures expand=4 15% faster than 16 at
        # identical recall (208.7 s vs 244.5 s, recall@10 0.9848 both) —
        # same default as the query-side beam. waveSize=2048 regressed
        # both build time and recall and stays 1024.
        self.construction_expand = pm.get("constructionExpand", 4, int)
        # Construction algorithm: "waves" = batched insertion waves
        # (reference-faithful incremental semantics), "nndescent" =
        # whole-corpus NN-descent refinement + heuristic prune +
        # reverse-fill (ops/nndescent.py) — the matmul/granule-dense
        # build that attacks the gather-bound wave beam (~58% of build
        # device time, BASELINE.md). Falls back to waves with a WARN for
        # spaces without a symmetric affine row encode.
        self.build_algo = pm.get("buildAlgo", "auto", str)
        if self.build_algo not in ("auto", "waves", "nndescent"):
            raise ValueError(f"bad buildAlgo {self.build_algo!r}")
        # "auto" picks NN-descent at-or-above this corpus size when the
        # space is NND-eligible and no sketch proxy is in play, waves
        # otherwise. Measured: warm NND beats the wave build 84-94 s vs
        # 179 s at 300k and 253.7 s vs 593 s at 1M at equal-or-better
        # recall (BASELINE.md "1M NND construction"); at 100k the warm
        # builds tie (51.4 vs 57.3 s) but NND loses ~2pp recall at low
        # ef (r3_nnd.jsonl wave100k_r1 0.9917-1.0 vs nnd100k_r1
        # 0.9661-0.9927 at ef=10-50), so the threshold sits at the
        # smallest measured NND-winning size.
        self.build_algo_auto_n = pm.get("buildAlgoAutoN", 300_000, int)
        # NN-descent knobs: k-NN list width (CAGRA-style: build wider
        # than maxM0, prune down), reverse-edge cap per sweep, per-parent
        # candidates kept before the merge, sweep cap, scoring chunk
        self.nnd_k = pm.get("nndK", 48, int)
        self.nnd_krev = pm.get("nndKrev", 16, int)
        self.nnd_t = pm.get("nndT", 8, int)
        self.nnd_iters = pm.get("nndIters", 10, int)
        # 512 (was 1024): transients scale with the chunk and dispatches
        # no longer do (fused sweeps) — chunk=1024's candidate block
        # OOMed the 1M build next to the resident store
        self.nnd_chunk = pm.get("nndChunk", 512, int)
        self.nnd_level_k = pm.get("nndLevelK", 64, int)
        self.nnd_store = pm.get("nndStoreDtype", "int8", str)
        if self.nnd_store not in ("int8", "float32"):
            raise ValueError(f"bad nndStoreDtype {self.nnd_store!r}")
        # top pruned-but-near candidates back up to M forward edges
        # (hnswlib keepPrunedConnections): a k-NN candidate list is
        # all-near, so the bare domination rule underfills rows
        self.nnd_fill = pm.get("nndFillPruned", 1, int)
        # random long-link candidates appended before selection
        # (Kleinberg small-world routing; see ops/nndescent._exact_aug_body)
        self.nnd_random = pm.get("nndRandom", 8, int)
        self.nnd_rev = pm.get("nndRevMode", "shrink", str)
        if self.nnd_rev not in ("shrink", "slots"):
            raise ValueError(f"bad nndRevMode {self.nnd_rev!r}")
        self.nnd_polish = pm.get("nndPolish", 1, int)
        # polish-beam int8 neighbor store (exact re-score before merge);
        # opt-in until the chip A/B lands — polish is ~35 s of the 165 s
        # 300k NND build and the beam is granule-count-bound
        # default ON where dense-row eligible (_cstore_ok): recall was
        # IDENTICAL to exact-exploration polish at 300k AND 1M
        # (r2_nnd.jsonl ps300k/ps1m) with faster builds — the polish
        # beam explores int8 granules, selection re-scores exact
        self.nnd_polish_store = pm.get("nndPolishStore", 1, int)
        # opt-in build-phase wall attribution: sync + log after each
        # phase (init/descent/final exact, link, uppers, polish). The
        # syncs serialize dispatch, so profiled walls are upper bounds.
        self.nnd_profile = pm.get("nndProfile", 0, int)
        # DiskANN-style neighborhood replication: store each node's
        # neighbors' vectors contiguously so one beam expansion is one
        # sequential HBM granule instead of maxM0 row gathers. Costs
        # n*maxM0*d bytes/elem of HBM (8GB bf16 / 4GB int8 at
        # 1M x 32 x 128) — opt-in; the final top-k is re-scored exactly
        # either way.
        self.replicate_neighbors = pm.get("replicateNeighbors", 0, int)
        # JL-sketch width for the sparse CONSTRUCTION proxy (0 disables);
        # only consulted when the space provides sketch_proxy. Queries
        # traverse with exact host-space scoring by default: measured on
        # the 100k bag-of-words bench distribution, top-10 cosine gaps
        # (~0.03) sit below JL noise even at dsk=1024 (a full exact scan
        # in sketch space contains only ~86% of the true top-10 at
        # ef=200), so sketch traversal cannot reach high recall there.
        # 1024 measured best on the bag-of-words toy (recall 0.853 vs
        # 0.800 at 512 vs 0.877 for a fully-exact build); costs 4KB/row
        # of transient f32 during construction.
        self.sketch_dim = pm.get("sketchDim", 1024, int)
        # opt-in: sketch-scored query traversal + exact re-rank of the
        # beam (fast, recall-limited by sketch noise)
        self.sketch_query = pm.get("sketchQuery", 0, int)
        # hybrid construction: exact base distances for candidate
        # selection while beams stay on the proxy
        self.exact_base = pm.get("exactBase", 1, int)
        # exact pair distances inside the forward selection heuristic
        # (proxy pair scores are noise on near-tied data; see
        # make_wave_step). Costs one blocked pair_dots_qdense per wave.
        self.exact_pairs = pm.get("exactPairs", 1, int)
        # exact-space post passes after a sketch-proxy build: re-insert
        # every point through the built graph with the HOST space doing
        # the TRAVERSAL too (not just refinement) — merge semantics,
        # the hnsw.cc:183-470 exact-construction quality applied as a
        # repair pass. Measured at 100k (r3_sparse.jsonl proxy_ep1 vs
        # ep0): +0.001-0.012 recall for ~2x build wall — the proxy
        # build's exactBase/exactPairs refinement already captures
        # nearly all reachable quality, so this is OPT-IN; for maximum
        # construction fidelity use sketchDim=0 (full exact waves,
        # 0.9875 vs 0.9785 @ ef=100 at 100k). Needs the exact
        # corpus-as-query encodings (exactBase/exactPairs keep them).
        self.exact_post = pm.get("exactPost", 0, int)
        # route the merge/reverse SHRINK decisions (scatter_forward's
        # post-pass merge + reverse_update) through the exact host space
        # too — without it those prune decisions stay on proxy scores
        # even when exactBase/exactPairs refine the forward selection
        # (the pre-existing asymmetry, ADVICE r3). Opt-in pending an
        # on-chip recall/build A/B: it adds a per-wave exact gram matrix
        # in the reverse path (the exactPairs cost class, paid again).
        self.exact_shrink = pm.get("exactShrink", 0, int)
        self.nbr_store_dtype = pm.get("nbrStoreDtype", "bfloat16", str)
        if self.nbr_store_dtype not in ("bfloat16", "int8"):
            raise ValueError(f"bad nbrStoreDtype {self.nbr_store_dtype!r}")
        # construction-time replicated neighbor store (int8, level 0):
        # ride the wave build's level-0 beam on granule gathers — see
        # make_wave_step(use_cstore=...). Default ON where eligible
        # (_cstore_ok: dense f32/bf16 rows, no sketch proxy): the 1M
        # same-process A/B built 778 s vs 1941.7 s (2.5x) at IDENTICAL
        # recall@10 (.9686/.9857 vs .9685/.9857 at ef=14/20,
        # r2_cstore.jsonl) — selection re-scores candidates from f32
        # rows, so int8 only perturbs beam exploration. Set
        # constructionStore=0 to disable.
        self._cstore_explicit = pm.has("constructionStore")
        self.construction_store = pm.get("constructionStore", 1, int)
        self.seed = pm.get("seed", 0, int)
        pm.check_unused()
        self._nbr_store = None
        self._proxy = None  # (SketchProxySpace, DenseDeviceData, R) or None
        # host-side knobs set by the corpus-sharded builder (not params):
        # a global padded-vocabulary floor for sparse encodes and a shared
        # projection seed, so every shard's sketch proxy uses the SAME
        # R matrix (parallel/hnsw_sharded.py)
        self.vocab_floor = 0
        self.sketch_seed = None
        # query-time defaults (reference: ef/efSearch default 20, hnsw.cc:483)
        self.ef_search = 20
        self._entry = 0  # global entry point (internal id; updated on delete)
        self.graph = None
        self._upper: list = []
        self.levels = None
        self.order = None

    # ---------------- query-time params ----------------

    #: method default efSearch (reference: ef/efSearch default 20, hnsw.cc:483)
    DEFAULT_EF_SEARCH = 20

    def set_query_time_params(self, params: Params | None) -> None:
        if params is None:
            # ResetQueryTimeParams semantics (reference: index.h / hnsw.cc):
            # restore method defaults instead of keeping previous values
            self.ef_search = self.DEFAULT_EF_SEARCH
            self.expand = self._expand_default
            super().set_query_time_params(None)
            return
        pm = ParamManager(Params.of(params))
        self.ef_search = pm.get_synonym(["ef", "efSearch"], self.ef_search, int)
        pm.get("algoType", "hybrid", str)  # parity no-op: single search algo
        if pm.has("searchExpand"):
            self.expand = pm.get("searchExpand", self.expand, int)
        pm.check_unused()
        super().set_query_time_params(params)

    def _effective_expand(self, ef: int) -> int:
        """Fixed expansion width. An ef-scaled width (expand = ef//16)
        was measured NEUTRAL-to-worse at 100k/ef=100..200: total
        candidate work is ~2*ef regardless of the split, and the wider
        per-iteration frontier's gather/dedup/sort growth cancels the
        saved fixed per-iteration cost. searchExpand remains the manual
        override."""
        return self.expand

    # ---------------- construction ----------------

    def _sample_levels(self, n: int, rng) -> np.ndarray:
        """Geometric level sampling (reference: hnsw.h:478-483)."""
        u = rng.random(max(n, 1))
        return np.minimum(
            np.floor(-np.log(np.maximum(u, 1e-12)) * self.mult), 32
        ).astype(np.int32)[:n]

    #: SwGraph keeps the wave encodings after the build: its delete path
    #: re-scores pairs with them (sw_graph._patch_links). Plain HNSW is
    #: immutable once built, so construction-only state is dropped.
    KEEP_WAVE_STATE = False

    def create_index(self, store: DataStore, params: Params | None = None) -> None:
        n = self._prepare(store)
        if n == 0:
            return
        algo = self.build_algo
        if algo == "auto":
            # sketch-proxy (sparse) builds stay on waves: NND-over-proxy
            # quality at scale is unmeasured; explicit buildAlgo=
            # nndescent still routes them through NND for A/Bs.
            algo = (
                "nndescent"
                if n >= self.build_algo_auto_n and self._proxy is None
                else "waves"
            )
        if algo == "nndescent" and self._build_nndescent(n):
            pass
        else:
            if algo == "nndescent" and self.build_algo == "nndescent":
                log("WARNING", "hnsw: buildAlgo=nndescent needs a symmetric "
                               "affine row encode; falling back to waves")
            self._run_waves(0, n)
        self._drop_wave_state()
        log("DEBUG", f"{self.name} built: n={n} max_level={self._max_level}")

    # ----- NN-descent construction (ops/nndescent.py) -----

    def _will_use_nnd(self, n: int) -> bool:
        """Resolve the buildAlgo routing ahead of encoding (create_index
        applies the same rule) so _encode_store can skip construction
        encodings an NND build never reads. Methods that keep wave state
        for post-build maintenance (sw_graph delete patching) still need
        the slab regardless of build algorithm."""
        if self.KEEP_WAVE_STATE:
            return False
        algo = self.build_algo
        if algo == "auto":
            algo = (
                "nndescent"
                if n >= self.build_algo_auto_n and self._proxy is None
                else "waves"
            )
        return algo == "nndescent" and self._nnd_eligible()

    def _nnd_eligible(self) -> bool:
        sp = self._graph_space
        aff = getattr(sp, "pass1_affine", None)
        if aff is None or aff() is None:
            return False
        raq = getattr(sp, "rows_as_queries", None)
        if raq is None:
            return False
        corpus = _corpus_dict(sp, self._graph_data)
        vecs = corpus.get("vecs")
        if getattr(vecs, "ndim", 0) != 2 or "row_mask" in corpus or "term" in corpus:
            return False
        return raq(vecs[:1]) is not None

    def _build_nndescent(self, n: int) -> bool:
        """Level 0 via NN-descent + heuristic prune + reverse-fill;
        upper levels via exact per-level k-NN (each level is a prefix of
        the level-sorted order). Replaces the insertion waves wholesale;
        ``post`` passes don't apply (the final exact re-score + prune
        already sees the full graph)."""
        if not self._nnd_eligible():
            return False
        from ..ops import nndescent as ND

        sp = self._graph_space
        corpus = _corpus_dict(sp, self._graph_data)
        # construction scores both sides from corpus rows — the second
        # encoded-corpus copy from _encode_store is dead weight; free it
        # (unless the method keeps wave state for post-build maintenance:
        # sw_graph's delete patching scores pairs with _qenc_all)
        if not self.KEEP_WAVE_STATE:
            self._qenc_all = None
        selection = "none" if self.delaunay_type == 0 else "heur"
        prof = bool(self.nnd_profile)
        _pt = [time.perf_counter()]

        def mark(name, arr):
            """Sync the phase output and log its wall (profile only)."""
            import jax.numpy as jnp

            float(jnp.sum(jnp.asarray(arr, jnp.float32)[:1, :1]))
            now = time.perf_counter()
            log("INFO", f"hnsw nnd phase {name}: {now - _pt[0]:.1f}s")
            _pt[0] = now

        prog = (
            (lambda it, ch: log("INFO", f"hnsw nnd sweep {it + 1}: {ch} updates"))
            if (getattr(self, "progress", False) or prof) else None
        )
        dist, adj = ND.build_knn_graph(
            sp, corpus, n,
            k=self.nnd_k, iters=self.nnd_iters, krev=self.nnd_krev,
            t_keep=self.nnd_t, chunk=self.nnd_chunk, seed=self.seed,
            store_dtype=self.nnd_store, n_random=self.nnd_random,
            progress=prog, mark=mark if prof else None,
        )
        n_pad = self.data.ids.shape[0]

        def link():
            """k-NN lists -> level-0 adjacency (+ reachability repair)."""
            lv0 = ND.prune_and_link(
                sp, corpus, dist, adj, n,
                m=self.M, cap=self.maxM0, chunk=self.nnd_chunk,
                selection=selection, fill=bool(self.nnd_fill),
                rev_mode=self.nnd_rev, mark=mark if prof else None,
            )[:n_pad]
            # a refinement-built graph has no insertion-time reachability
            # guarantee: link stranded components back to the entry's
            # (see ops/nndescent.repair_reachability)
            lv0, fixed = ND.repair_reachability(
                sp, corpus, lv0, n, entry=self._entry
            )
            if fixed:
                log("INFO", f"hnsw nnd: repaired reachability of {fixed} nodes")
            return lv0

        level0 = link()
        if prof:
            mark("link0", level0)
        new_upper = []
        for l in range(1, self._max_level + 1):
            n_l = self._upper[l - 1].shape[0]
            k_cand = min(self.nnd_level_k, max(n_l - 1, 1))
            new_upper.append(
                ND.build_level_exact(
                    sp, corpus, n_l,
                    m=self.M, cap=self.maxM, k_cand=k_cand,
                    chunk=min(2048, max(n_l, 1)), selection=selection,
                    fill=bool(self.nnd_fill), n_random=self.nnd_random,
                    seed=self.seed, rev_mode=self.nnd_rev,
                )
            )
        self._upper = new_upper
        if prof and new_upper:
            mark("uppers", new_upper[0])
        # beam-polish passes: batched re-insertion of every node through
        # the built graph — the beam's path candidates restore the
        # mid-range (distance-halving) edges the k-NN + uniform-random
        # candidate pool lacks (ops/nndescent._polish_sweep rationale)
        polish_store = bool(self.nnd_polish_store) and self._cstore_ok()

        def polish_prog(ci, nc, state):
            # profile mode: sync every 64 chunks so a host-chunked-sweep
            # worker fault names its chunk range instead of the phase
            if prof and ci % 64 == 63:
                import jax.numpy as jnp

                float(jnp.sum(state[:1, :1]))
                log("INFO", f"hnsw nnd polish chunk {ci + 1}/{nc}")

        for p in range(self.nnd_polish):
            dist, adj = ND.polish_knn_lists(
                sp, corpus, level0, self._upper, dist, adj, n,
                efc=self.ef_construction, expand=self.construction_expand,
                entry=self._entry, chunk=min(2048, self.nnd_chunk * 2),
                use_store=polish_store,
                progress=polish_prog if prof else None,
            )
            if prof:
                mark(f"polish{p}", dist)
            level0 = link()
            if prof:
                mark(f"link{p + 1}", level0)
        self.graph = {"level0": level0}
        del dist, adj, level0
        return True

    def _drop_wave_state(self) -> None:
        """Free construction-only device state: the corpus-as-queries
        encodings (a second full copy of the corpus — ~512MB at 1M x 128
        f32) and, unless sketchQuery traverses it, the JL sketch proxy
        (~4GB at 1M x dsk=1024). Queries run on self.space/self.data."""
        if self.KEEP_WAVE_STATE:
            return
        self._qenc_all = None
        self._exact_qenc_all = None
        if not self.sketch_query:
            self._proxy = None
            self._graph_space, self._graph_data = self.space, self.data

    def _prepare(self, store: DataStore) -> int:
        """Everything before the insertion waves: level sampling, level-
        descending reorder, corpus/query encoding, empty graph allocation.
        Returns the point count (0 = nothing to insert). Split out so the
        corpus-sharded parallel builder (parallel/hnsw_sharded.py) can
        prepare every shard, stack the states, and run the waves for all
        shards at once under shard_map."""
        self.store = store
        n = len(store)
        rng = np_rng(self.seed)
        levels = self._sample_levels(n, rng)
        order = np.argsort(-levels, kind="stable")
        self.order = order
        self.levels = levels[order]
        self._encode_store(store, n)
        if n == 0:
            return 0
        max_level = int(self.levels.max(initial=0))
        self._max_level = max_level
        n_pad = self.data.ids.shape[0]
        self.graph = {"level0": jnp.full((n_pad, self.maxM0), NEG1)}
        self._upper = [
            jnp.full((max(int(np.sum(self.levels >= l)), 1), self.maxM), NEG1)
            for l in range(1, max_level + 1)
        ]
        return n

    def _encode_store(self, store: DataStore, n: int,
                      skip_construction: bool = False) -> None:
        """Encode + level-sorted reorder of the corpus, and all corpus
        points as query encodings (used to score point-point pairs
        during construction).

        Sparse dot-family spaces additionally get a dense JL-sketch
        *proxy* (spaces/sparse.py SketchProxySpace): the graph is built
        and traversed entirely on the dense MXU path over sketches, and
        the host space re-ranks the final beam exactly. sketchDim=0
        disables the proxy (the raw sparse wave program is ~200x slower
        on TPU and faulted the worker at 100k in round 1)."""
        if self.vocab_floor:
            self.data = self.space.encode_dataset(
                store, row_multiple=8, vocab_floor=self.vocab_floor
            )
        else:
            self.data = self.space.encode_dataset(store, row_multiple=8)
        self._proxy = None
        n_pad = self.data.ids.shape[0]
        if n == 0:
            self.graph = {"level0": jnp.full((n_pad, self.maxM0), NEG1)}
            self._upper = []
            self._graph_space, self._graph_data = self.space, self.data
            return
        self.data = self._reorder_data(self.data, self.order, n)
        mk = getattr(self.space, "sketch_proxy", None)
        if mk is not None and self.sketch_dim > 0:
            sseed = self.seed if self.sketch_seed is None else self.sketch_seed
            self._proxy = mk(self.data, self.sketch_dim, sseed)
        self._exact_qenc_all = None
        if self._proxy is not None:
            pspace, pdata, _ = self._proxy
            self._graph_space, self._graph_data = pspace, pdata
            # corpus points as construction queries ARE the sketches
            self._qenc_all = None if skip_construction else {"q": pdata.vecs[:n]}
            # exactPairs also needs the host-space encodings — without
            # them it would silently fall back to proxy pair scores
            if not skip_construction and (
                self.exact_base or self.exact_pairs or self.exact_post
                or self.exact_shrink
            ):
                self._exact_qenc_all = self.space.encode_queries(
                    self.space.store_as_query_points(store)[self.order]
                )
        else:
            # index-time scoring may differ from query-time scoring
            # (sparse_dense_fusion's indexWeights); for every other space
            # construction_space() is the space itself
            self._graph_space = self.space.construction_space()
            self._graph_data = self.data
            # a restore with the graph already built never runs waves:
            # skip encoding a second full corpus copy it would drop.
            # Same for NND-routed builds (decided here, before the waves
            # would need it): NND scores both sides from corpus rows and
            # immediately freed this slab — at 1M x 128 the dead encode
            # cost a full second corpus upload over the tunnel (~140 s,
            # r4_buildprof silent-gap attribution) inside the pre-init
            # window the r4 VERDICT flags.
            self._qenc_all = (
                None
                if skip_construction or self._will_use_nnd(n)
                else self.space.encode_queries(
                    self.space.store_as_query_points(store)[self.order]
                )
            )
        # row count of the per-node query encodings (unpadded)
        self._n_total = n

    def _run_waves(self, lo: int, hi: int) -> None:
        """Insert points [lo, hi) in batched waves against the frozen
        prefix graph (the wave step only links to ids < wave start)."""
        n = hi - lo
        if n <= 0:
            return
        w = int(min(self.wave, n))
        # Wave schedule. The FIRST wave of an initial build inserts into
        # an empty graph — its nodes get mates-only links and become the
        # routing backbone every later insertion descends through. When
        # that wave is a large fraction of the corpus the graph never
        # recovers (measured on clustered SIFT-like data: waveSize=1024
        # at n=2048 -> recall@10 0.53 vs 1.0 at waveSize<=256; still
        # 0.69 at n=8192 where the first wave is only 12.5%). Ramp the
        # head — 128, 128, 256, 512, ... — so every wave after the
        # first links into a frozen prefix at least its own size; the
        # steady-state wave width (and its compiled program) is
        # unchanged, costing only ~log2(w/128) extra cached compiles.
        # THRESHOLDED: when the first wave is already a tiny corpus
        # fraction (w <= n/64) the mates-only set is harmless and the
        # ramp measurably HURTS near-tied sparse construction order
        # (100k exact waves: ramped 0.9775 vs un-ramped 0.9875 @ ef=100,
        # r4_sparse.jsonl rampab — reproduces r3's fidelity), so large
        # corpora keep the fixed-width schedule.
        schedule: list[tuple[int, int]] = []
        pos = 0
        if lo == 0 and w > 128 and w > n // 64 and WAVE_RAMP:
            ramp = [128, 128]  # two 128s: wave 2's frozen prefix == its size
            s = 256
            while s <= w // 2:
                ramp.append(s)
                s *= 2
            for s in ramp:  # sums to ~w; bounds the mates-only set to 128
                s = min(s, n - pos)
                if s <= 0:
                    break
                schedule.append((pos, s))
                pos += s
        while pos < n:
            schedule.append((pos, w))
            pos += w
        num_waves = len(schedule)
        use_cstore = bool(self.construction_store) and self._cstore_ok()
        steps: dict[int, Any] = {}

        def get_step(width: int):
            if width not in steps:
                steps[width] = self._make_wave_step(width, self._max_level, use_cstore)
            return steps[width]

        # post passes re-run every point against the FULL graph and never
        # need the ramp: they iterate a uniform width-w grid. When the
        # ramp fired, num_waves > num_post and wi*w indexing into the
        # ramped schedule would overrun the corpus (ADVICE r4: crash at
        # n=2048/waveSize=1024/post=1) — so size wl_all for whichever
        # loop reaches further.
        num_post = (n + w - 1) // w
        total = lo + max(schedule[-1][0], (num_post - 1) * w) + w
        wl_all = np.full(total, -1, np.int32)
        wl_all[: len(self.levels)] = self.levels
        corpus = _corpus_dict(self._graph_space, self._graph_data)
        qenc_all = self._qenc_all
        ecorpus = eqenc = None
        if self._exact_qenc_all is not None:
            ecorpus = _corpus_dict(self.space, self.data)
            eqenc = self._exact_qenc_all
        level0, upper = self.graph["level0"], self._upper
        cstore = xqc = xsc = None
        if use_cstore:
            # quantize the corpus FIRST so the [S, m0cap, d] replication
            # gather lands in int8 (the f32-first ordering materializes
            # 16 GB at 1M — same lesson as _get_nbr_store)
            vecs = corpus["vecs"]
            s = float(jnp.max(jnp.abs(vecs))) / 127.0
            xsc = jnp.float32(s if s > 0 else 1.0)
            xqc = jnp.clip(jnp.round(vecs / xsc), -127, 127).astype(jnp.int8)
            cstore = xqc[jnp.clip(level0, 0, xqc.shape[0] - 1)]
        # ProgressDisplay analog (reference: hnsw.cc:236): one INFO line
        # per ~10% of waves when build_index(print_progress=True)
        every = max(1, num_waves // 10) if getattr(self, "progress", False) else 0
        # perf-attribution hook: (first_wave, last_wave, trace_dir) set by
        # profiling scripts (scripts/r2_build_prof.py) — traces exactly
        # the waves in the window with drained queues on both edges so
        # device_duration_ps attributes only those wave steps.
        prof = getattr(self, "profile_wave_window", None)
        prof_started = False
        for wi in range(num_waves):
            if prof and wi == prof[0]:
                float(jnp.sum(level0[0]))  # drain in-flight dispatches
                import time as _time

                self._prof_t0 = _time.perf_counter()
                jax.profiler.start_trace(prof[2])
                prof_started = True
            if every and wi % every == 0:
                # sync before logging so the line reflects true device
                # progress (dispatch is async and the host loop races
                # ahead until the in-flight queue throttles) — and so a
                # deferred worker fault surfaces HERE with a wave number
                # instead of at the final sync. ~10 syncs per build.
                float(jnp.sum(level0[0]))
                log("INFO", f"hnsw build: wave {wi + 1}/{num_waves}")
            off, width = schedule[wi]
            start = lo + off
            out = get_step(width)(
                level0,
                upper,
                jnp.int32(start),
                jnp.asarray(wl_all[start : start + width]),
                jnp.int32(self._entry),
                jnp.int32(start),  # frozen-prefix limit during the build
                corpus,
                qenc_all,
                ecorpus,
                eqenc,
                cstore,
                xqc,
                xsc,
            )
            if use_cstore:
                level0, upper, cstore = out
            else:
                level0, upper = out
            if prof and wi == min(prof[1], num_waves - 1):
                float(jnp.sum(level0[0]))  # window complete on device
                jax.profiler.stop_trace()
                import time as _time

                self._prof_wall_s = _time.perf_counter() - self._prof_t0
                self.profile_wave_window = None
                prof = None
        if prof and prof_started:
            # window start fired but the end wave was never reached
            # (short build): stop the trace so the profiler isn't left
            # armed for the rest of the process
            jax.profiler.stop_trace()
            self.profile_wave_window = None
        # post passes: re-run every point against the FULL graph, merging
        # new neighborhoods into existing rows (reference: hnsw.cc:251-338
        # builds a second reverse-order graph and UNION-merges per-node
        # friend lists, heuristic-shrunk at post=2 — so the pass must
        # merge, never replace: replace semantics wipe accumulated
        # reverse edges and collapse hub in-degree, measured -0.46
        # recall on 100k sparse)
        n_total = len(self.levels)
        if self.post and hi >= n_total:
            step = self._make_wave_step(w, self._max_level, use_cstore,
                                        merge_forward=True)
        for _ in range(self.post if hi >= n_total else 0):
            for wi in range(num_post - 1, -1, -1):
                start = lo + wi * w
                out = step(
                    level0,
                    upper,
                    jnp.int32(start),
                    jnp.asarray(wl_all[start : start + w]),
                    jnp.int32(self._entry),
                    jnp.int32(n_total),  # full visibility
                    corpus,
                    qenc_all,
                    ecorpus,
                    eqenc,
                    cstore,
                    xqc,
                    xsc,
                )
                if use_cstore:
                    level0, upper, cstore = out
                else:
                    level0, upper = out
        # exact-space post passes (sketch-proxy builds only): the same
        # rebuild-and-merge loop, but the wave step traverses + selects
        # with the EXACT host space — sketch noise steered the original
        # beams, so their candidate sets miss true near-ties that only
        # exact scoring can rank (the 1M sparse recall collapse)
        if (
            self._proxy is not None
            and self.exact_post
            and eqenc is not None
            and hi >= n_total
        ):
            estep = jax.jit(
                make_wave_step(
                    self.space,
                    self._n_total,
                    w,
                    self._max_level,
                    efc=self.ef_construction,
                    m=self.M,
                    m0cap=self.maxM0,
                    mcap=self.maxM,
                    mates=min(self.wave_mates, w),
                    expand=self.construction_expand,
                    selection="none" if self.delaunay_type == 0 else "heur",
                    merge_forward=True,
                )
            )
            for _ in range(self.exact_post):
                for wi in range(num_post - 1, -1, -1):
                    start = lo + wi * w
                    level0, upper = estep(
                        level0,
                        upper,
                        jnp.int32(start),
                        jnp.asarray(wl_all[start : start + w]),
                        jnp.int32(self._entry),
                        jnp.int32(n_total),  # full visibility
                        ecorpus,
                        eqenc,
                    )
        # the construction store is build-only state: drop it before the
        # final sync so its 4.3 GB (1M x 32 x 128) never coexists with
        # query-time allocations
        cstore = xqc = None
        self.graph = {"level0": level0}
        self._upper = upper

    def _reorder_data(self, data, order, n):
        n_pad = data.ids.shape[0]
        perm = np.concatenate([order, np.arange(n, n_pad)]).astype(np.int32)
        p = jnp.asarray(perm)
        return jax.tree_util.tree_map(
            lambda a: a[p]
            if hasattr(a, "ndim") and a.ndim >= 1 and a.shape[0] == n_pad
            else a,
            data,
        )

    # ----- the batched insertion wave -----

    def _make_wave_step(self, w: int, max_level: int, use_cstore: bool = False,
                        merge_forward: bool = False):
        return jax.jit(
            make_wave_step(
                self._graph_space,
                self._n_total,
                w,
                max_level,
                efc=self.ef_construction,
                m=self.M,
                m0cap=self.maxM0,
                mcap=self.maxM,
                mates=min(self.wave_mates, w),
                expand=self.construction_expand,
                selection="none" if self.delaunay_type == 0 else "heur",
                exact_space=self.space if self._exact_qenc_all is not None else None,
                exact_pairs=bool(self.exact_pairs),
                exact_base=bool(self.exact_base),
                exact_shrink=bool(self.exact_shrink),
                use_cstore=use_cstore,
                merge_forward=merge_forward,
            ),
            # alias the store through the step: without donation every
            # wave holds old+new copies (2 x 4.3 GB at 1M x 32 x 128)
            donate_argnums=(10,) if use_cstore else (),
        )

    def _cstore_ok(self) -> bool:
        """constructionStore needs the same shape of corpus the query-time
        nbr store does — dense f32/bf16 rows whose per-row term is
        recomputable — on the GRAPH space (sketch-proxy builds excluded:
        their beam already scores proxy rows and refines exactly)."""
        if self._exact_qenc_all is not None:
            return False
        corpus = _corpus_dict(self._graph_space, self._graph_data)
        vecs = corpus.get("vecs")
        # the store's gathered scorer reconstructs ONLY {x, pad}: any
        # extra layout key (sparse 'cols'/'len', fusion components, a
        # gathered 'term' or dynamic 'row_mask') means rows alone don't
        # determine distances — stand down (round-2 regression e22103b:
        # sparse val matrices are f32 2-D too, so dtype checks alone
        # wrongly admitted sparse/fusion wave builds)
        ok = (
            set(corpus) <= {"vecs", "count"}
            and hasattr(vecs, "dtype")
            and vecs.dtype in (jnp.float32, jnp.bfloat16)
            and getattr(vecs, "ndim", 0) == 2
        )
        if not ok and self.construction_store and getattr(
                self, "_cstore_explicit", False):
            # warn only on explicit opt-in: the store defaults ON and
            # silently stands down for non-dense-row encodings
            log("WARN", "hnsw: constructionStore ignored (space/encoding "
                        "not dense-row eligible)")
        return ok


    # ---------------- search ----------------

    def _nbr_store_ok(self) -> bool:
        """Neighborhood replication needs dense float rows whose per-row
        term is recomputable (or absent): corpus_dict must carry neither
        a gathered 'term' nor a dynamic 'row_mask'."""
        if not hasattr(self.data, "vecs"):
            # sparse/string encodings expose a 'vecs'-named matrix via
            # corpus_dict but carry no .vecs row store to replicate
            return False
        corpus = _corpus_dict(self.space, self.data)
        vecs = corpus.get("vecs")
        return (
            "term" not in corpus
            and "row_mask" not in corpus
            and hasattr(vecs, "dtype")
            and vecs.dtype in (jnp.float32, jnp.bfloat16)
            and getattr(vecs, "ndim", 0) == 2
        )

    def aux_device_arrays(self):
        out = list(self._upper)
        if self._nbr_store is not None:
            out.append(self._nbr_store[1])
        if self._proxy is not None:
            # resident when sketchQuery=1 (or on SwGraph): sketch corpus
            # + projection count toward memory_usage_bytes
            out.append(self._proxy[1].vecs)
            out.append(self._proxy[2])
        return out

    def _get_nbr_store(self):
        """Lazy [n_pad, maxM0, d] replicated neighbor rows (level 0), in
        bf16 or symmetric per-tensor int8 (nbrStoreDtype). Cached keyed
        on the adjacency array's identity, so any graph mutation
        (rebuild, sw-graph add/delete) rebuilds it. Returns
        (rows, scale) — scale is 1.0 for bf16."""
        if not self.replicate_neighbors or not self._nbr_store_ok():
            return None
        adj = self.graph["level0"]
        if self._nbr_store is None or self._nbr_store[0] is not adj:
            vecs = self.data.vecs
            safe = jnp.clip(adj, 0, vecs.shape[0] - 1)
            # quantize the CORPUS before the neighbor gather so the
            # [n_pad, maxM0, d] gather lands directly in the narrow
            # dtype: gathering f32 first materializes n_pad*maxM0*d*4
            # bytes (16GB at 1M x 32 x 128) and RESOURCE_EXHAUSTs —
            # measured on v5e next to a resident exact index.
            if self.nbr_store_dtype == "int8":
                s = float(jnp.max(jnp.abs(vecs))) / 127.0
                s = s if s > 0 else 1.0
                xq = jnp.clip(jnp.round(vecs / s), -127, 127).astype(jnp.int8)
                self._nbr_store = (adj, xq[safe], s)
            else:
                self._nbr_store = (adj, vecs.astype(jnp.bfloat16)[safe], 1.0)
        return self._nbr_store[1], self._nbr_store[2]

    def knn(self, points, k: int):
        if self.graph is None:
            raise IndexNotBuiltError("hnsw: index not built")
        ef = max(self.ef_search, k)
        if Q.PACKED_QUERIES and not (self._proxy is not None and self.sketch_query):
            out = self._knn_packed(points, k, ef)
            if out is not None:
                return out
        qenc = self.space.encode_queries(points)
        if self._proxy is not None and self.sketch_query:
            pspace, pdata, r_mat = self._proxy
            qenc_p = self.space.sketch_queries(qenc, r_mat)
            d, ids, nd = _hnsw_search_sketch(
                pspace, self.space, qenc_p, qenc, pdata, self.data,
                self.graph["level0"], tuple(self._upper),
                jnp.int32(self._entry), ef, k, self._effective_expand(ef),
            )
            self._add_dist_comps(nd)
            return self._finalize_knn(d, ids)
        d, ids, nd = _hnsw_search(
            self.space, qenc, self.data, self.graph["level0"], tuple(self._upper),
            jnp.int32(self._entry), ef, k, self._effective_expand(ef),
            nbr_store=self._get_nbr_store(),
        )
        self._add_dist_comps(nd)
        return self._finalize_knn(d, ids)

    def _packed_dispatch(self, points, k: int, ef: int):
        """Enqueue the one-upload packed search; returns the on-device
        packed result, or None when the space can't express its query
        encode as host arrays + in-jit completion."""
        qhost = self.space.encode_queries_host(points)
        if qhost is None:
            return None
        buf, meta = Q.pack_host(qhost)
        packed, nd = _hnsw_search_packed(
            self.space, jnp.asarray(buf), meta, self.data,
            self.graph["level0"], tuple(self._upper), int(self._entry),
            ef, k, self._effective_expand(ef),
            nbr_store=self._get_nbr_store(),
        )
        self._add_dist_comps(nd)
        return packed

    def _knn_packed(self, points, k: int, ef: int):
        packed = self._packed_dispatch(points, k, ef)
        if packed is None:
            return None
        return self._finalize_knn(*Q.unpack_results(packed, k))

    def knn_async(self, points, k: int):
        if self.graph is None:
            raise IndexNotBuiltError("hnsw: index not built")
        ef = max(self.ef_search, k)
        if Q.PACKED_QUERIES and not (self._proxy is not None and self.sketch_query):
            packed = self._packed_dispatch(points, k, ef)
            if packed is not None:
                return lambda: self._finalize_knn(*Q.unpack_results(packed, k))
        return super().knn_async(points, k)

    def range(self, points, radius):
        raise SpaceIncompatibleError("Range search is not supported!")

    # ---------------- graph sanity checkers (test infra) ----------------

    def check_graph(self) -> dict:
        """Duplicate/self-link detector (reference: checkList1,
        hnsw.cc:125-148). Returns counts; all zero for a healthy graph."""
        if self.graph is None:
            raise IndexNotBuiltError("hnsw: index not built")
        n = self._n_total
        out = {"self_links": 0, "dup_links": 0, "oob_links": 0}
        adjs = [np.asarray(self.graph["level0"])[:n]] + [
            np.asarray(u) for u in self._upper
        ]
        for adj in adjs:
            rows = np.arange(adj.shape[0])[:, None]
            valid = adj >= 0
            out["self_links"] += int(np.sum((adj == rows) & valid))
            out["oob_links"] += int(np.sum(valid & (adj >= n)))
            s = np.sort(np.where(valid, adj, -np.arange(adj.size).reshape(adj.shape) - 1), axis=1)
            out["dup_links"] += int(np.sum((s[:, 1:] == s[:, :-1]) & (s[:, 1:] >= 0)))
        return out

    def degree_distribution(self) -> np.ndarray:
        """Level-0 out-degree histogram (reference: getDegreeDistr,
        hnsw.cc:150-181). Returns counts indexed by degree 0..maxM0."""
        if self.graph is None:
            raise IndexNotBuiltError("hnsw: index not built")
        deg = np.sum(np.asarray(self.graph["level0"])[: self._n_total] >= 0, axis=1)
        return np.bincount(deg, minlength=self.maxM0 + 1)

    # ---------------- persistence ----------------

    def state_arrays(self) -> dict:
        out = {
            "level0": np.asarray(self.graph["level0"]),
            "levels": np.asarray(self.levels),
            "order": np.asarray(self.order),
            "meta": np.asarray(
                [self.M, self.maxM, self.maxM0, self.ef_construction, self._entry]
            ),
        }
        for i, u in enumerate(self._upper):
            out[f"upper_{i}"] = np.asarray(u)
        return out

    def restore(self, store: DataStore, state: dict, params: Params | None = None) -> None:
        if not state:
            self.create_index(store, params)
            return
        self.store = store
        self.levels = np.asarray(state["levels"])
        self.order = np.asarray(state["order"])
        meta = np.asarray(state["meta"])
        self._entry = int(meta[4]) if meta.shape[0] > 4 else 0
        n = len(store)
        if not self.KEEP_WAVE_STATE and not self.sketch_query:
            # the graph arrays are already built: skip the JL projection
            # (construction-only; minutes of device work at 1M)
            keep_dsk, self.sketch_dim = self.sketch_dim, 0
            try:
                self._encode_store(store, n, skip_construction=True)
            finally:
                self.sketch_dim = keep_dsk
        elif not self.KEEP_WAVE_STATE:
            self._encode_store(store, n, skip_construction=True)
        else:
            self._encode_store(store, n)
        self._drop_wave_state()
        self._max_level = int(self.levels.max(initial=0)) if n else 0
        self.graph = {"level0": jnp.asarray(state["level0"])}
        ups = sorted(
            (k for k in state if k.startswith("upper_")),
            key=lambda s: int(s.split("_")[1]),
        )
        self._upper = [jnp.asarray(state[k]) for k in ups]
