"""Inverted-index (term-at-a-time) sparse scoring — the TPU rebuild of
the reference's posting-list engines (simple_inverted_index.cc:47-260
DAAT heap merge; space_sparse_scalar_fast.h:45-71 posting views).

Why this exists: the gather-based exact scan is granule-count-bound at
the v5e gather engine's ~54M granules/s and touches ALL C*nnz corpus
postings per sweep regardless of batch size (BASELINE.md round-3
roofline) — a single query pays the same 1.19 s as 512. A posting-list
engine touches only sum_{t in batch terms} |P_t| postings, which on the
benchmark distribution is ~75x fewer for one query (85k vs 64M at 1M)
and ~6x fewer at nq=32; by nq=512 the batch union covers ~70% of all
postings and the advantage is gone (scripts/r4_taat_stats.py). So this
engine owns the SMALL-BATCH / latency regime — the regime where the
reference's DAAT lives — and the batched gather scan stays the
large-batch throughput path.

TPU shape of the classic algorithm:
  * postings are stored per-term, 128-aligned, as [PB, 128] doc/value
    BLOCK arrays — term slices become whole-block row gathers (512B
    granules, ~128x fewer granules than per-posting gathers; the
    contiguous-group-gather speedup measured in round 1).
  * the host plans a batch: union of query terms -> block list + a
    dense per-union-term query-weight table W [U, nq] (tiny uploads:
    ints per BLOCK, not per posting).
  * the device gathers posting blocks, forms contributions
    val[p] * W[term(p), q] (VPU outer product per block), and
    scatter-ADDS them into a [N, nq] score accumulator (unhinted —
    scatter hints miscompile on this backend, CLAUDE.md). Scores of
    docs sharing no term with the query stay exactly 0, like a DAAT
    heap that never sees them.
  * top-k runs as the usual streaming chunk merge over the accumulator
    with untouched docs masked out (reference DAAT returns only
    accumulated docs).

Accumulation order differs from the row-major dot, so scores match the
blocked scan to f32 reduction tolerance, not bit-exactly.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from . import topk as T
from .topk import INF

BLOCK = 128


def _round_pow2(n: int, lo: int = 16) -> int:
    v = lo
    while v < n:
        v *= 2
    return v


@dataclass
class InvertedPostings:
    """128-aligned CSC posting blocks (device) + host slice directory."""

    pdoc_blocks: Any  # jnp i32[PB+1, 128]; doc row index, -1 pad (last block all-pad)
    pval_blocks: Any  # jnp f32[PB+1, 128]; 0 pad
    blk_start: np.ndarray  # host i64[V]: first block of term t (0-based terms)
    blk_count: np.ndarray  # host i64[V]: blocks of term t
    vocab: int
    n_rows: int  # padded corpus row count (scatter target height)
    total_postings: int


def build_postings(col: np.ndarray, val: np.ndarray, count: int,
                   n_rows: int) -> InvertedPostings:
    """Host-side CSC build from the padded-CSR corpus arrays.

    ``col`` [N_pad, nnz] holds 1-based term ids with val==0 padding
    (spaces/sparse._pack_csr). Postings keep doc order ascending within
    each term (stable sort of the doc-major ravel), matching the
    reference's sorted posting lists (simple_inverted_index.cc:96-118).
    """
    cols = col[:count].ravel().astype(np.int64)
    vals = val[:count].ravel()
    docs = np.repeat(np.arange(count, dtype=np.int32), col.shape[1])
    keep = vals != 0
    cols, vals, docs = cols[keep] - 1, vals[keep], docs[keep]
    vocab = int(cols.max()) + 1 if cols.size else 1
    order = np.argsort(cols, kind="stable")
    cols, vals, docs = cols[order], vals[order], docs[order]
    plen = np.bincount(cols, minlength=vocab).astype(np.int64)
    blk_count = (plen + BLOCK - 1) // BLOCK
    blk_start = np.concatenate([[0], np.cumsum(blk_count)])[:-1]
    pb = int(blk_count.sum())
    pdoc = np.full((pb + 1) * BLOCK, -1, np.int32)  # +1: dead pad block
    pval = np.zeros((pb + 1) * BLOCK, np.float32)
    src_off = np.concatenate([[0], np.cumsum(plen)])[:-1]
    within = np.arange(cols.size, dtype=np.int64) - src_off[cols]
    dst = blk_start[cols] * BLOCK + within
    pdoc[dst] = docs
    pval[dst] = vals
    return InvertedPostings(
        pdoc_blocks=jnp.asarray(pdoc.reshape(-1, BLOCK)),
        pval_blocks=jnp.asarray(pval.reshape(-1, BLOCK)),
        blk_start=blk_start,
        blk_count=blk_count,
        vocab=vocab,
        n_rows=n_rows,
        total_postings=int(cols.size),
    )


def plan_batch(qcol: np.ndarray, qval: np.ndarray, inv: InvertedPostings):
    """Host-side batch plan: (block_ids [NB_pad], ublock [NB_pad],
    W [U_pad, nq]) — the only per-batch uploads, sized per BLOCK/term.
    Shapes are padded to power-of-two buckets so the jit cache stays
    small across batches."""
    nq = qcol.shape[0]
    valid = qval != 0
    terms = qcol[valid].astype(np.int64) - 1
    qidx = np.broadcast_to(np.arange(nq)[:, None], qcol.shape)[valid]
    inrange = (terms >= 0) & (terms < inv.vocab)
    terms, qidx, tvals = terms[inrange], qidx[inrange], qval[valid][inrange]
    union, uinv = np.unique(terms, return_inverse=True)
    nonempty = inv.blk_count[union] > 0
    # remap to the non-empty union only
    new_id = np.cumsum(nonempty) - 1
    u_terms = union[nonempty]
    u = int(u_terms.size)
    w = np.zeros((_round_pow2(u + 1), nq), np.float32)
    ok = nonempty[uinv]
    np.add.at(w, (new_id[uinv[ok]], qidx[ok]), tvals[ok])
    nb_u = inv.blk_count[u_terms]
    nb = int(nb_u.sum())
    nb_pad = _round_pow2(max(nb, 1))
    dead_blk = inv.pdoc_blocks.shape[0] - 1
    block_ids = np.full(nb_pad, dead_blk, np.int32)
    ublock = np.full(nb_pad, w.shape[0] - 1, np.int32)  # pad -> zero W row
    if nb:
        boff = np.concatenate([[0], np.cumsum(nb_u)])[:-1]
        flat = np.arange(nb, dtype=np.int64)
        seg = np.searchsorted(np.cumsum(nb_u), flat, side="right")
        block_ids[:nb] = (inv.blk_start[u_terms[seg]] + flat - boff[seg]).astype(np.int32)
        ublock[:nb] = seg.astype(np.int32)  # seg IS the compact union index
    return block_ids, ublock, w


@partial(jax.jit, static_argnames=("k", "chunk"))
def taat_topk(pdoc_blocks, pval_blocks, block_ids, ublock, w, corpus_ids,
              k: int, chunk: int):
    """Score the planned posting blocks and return (dists [nq,k],
    ids [nq,k], touched [nq]) with dist = -accumulated dot (negdotprod
    convention; untouched docs are +inf like a DAAT heap that never saw
    them)."""
    return _taat_topk_core(pdoc_blocks, pval_blocks, block_ids, ublock, w,
                           corpus_ids, k, chunk)


@partial(jax.jit, static_argnames=("meta", "k", "chunk"))
def taat_topk_packed(pdoc_blocks, pval_blocks, buf, meta, corpus_ids,
                     k: int, chunk: int):
    """Packed-transport variant (ops/qpack): the batch plan
    (block_ids/ublock/w) arrives as ONE uint32 upload and the (dists,
    ids) result leaves as ONE [nq, 2k] int32 download — at nq=1 on 1M
    the eager path's three plan uploads + two result downloads are ~90%
    of the 99 ms wall vs the ~5-10 ms device dispatch (VERDICT r4 item
    6; reference latency regime: simple_inverted_index.cc:47-260 DAAT).
    Returns (packed_result, touched)."""
    from . import qpack as Q

    plan = Q.unpack_device(buf, meta)
    cd, ids, nd = _taat_topk_core(
        pdoc_blocks, pval_blocks, plan["block_ids"], plan["ublock"],
        plan["w"], corpus_ids, k, chunk,
    )
    return Q.pack_results(cd, ids), nd


def _taat_topk_core(pdoc_blocks, pval_blocks, block_ids, ublock, w, corpus_ids,
                    k: int, chunk: int):
    nq = w.shape[1]
    n_rows = corpus_ids.shape[0]
    nb_pad = block_ids.shape[0]
    # accumulate in block slices: materializing all [NB, 128, nq]
    # contributions at once is 16 GB at NB=64k/nq=512 (measured OOM);
    # nb_pad and the slice width are both powers of two, so they divide
    nbc = min(2048, nb_pad)

    def acc_step(scores, i):
        bl = jax.lax.dynamic_slice_in_dim(block_ids, i * nbc, nbc)
        ub = jax.lax.dynamic_slice_in_dim(ublock, i * nbc, nbc)
        doc = pdoc_blocks[bl]  # [nbc, 128] row gathers
        valb = pval_blocks[bl]
        wb = w[ub]  # [nbc, nq]
        contrib = valb[:, :, None] * wb[:, None, :]  # [nbc, 128, nq]
        tgt = jnp.where(doc >= 0, doc, n_rows).reshape(-1)  # pads -> OOB drop
        # UNHINTED scatter-add (hinted scatters miscompile on TPU)
        return scores.at[tgt].add(contrib.reshape(-1, nq), mode="drop"), None

    scores = jnp.zeros((n_rows, nq), jnp.float32)
    scores, _ = jax.lax.scan(acc_step, scores, jnp.arange(nb_pad // nbc))

    num_chunks = n_rows // chunk

    def step(carry, ci):
        cd, cidx, nacc = carry
        s = jax.lax.dynamic_slice_in_dim(scores, ci * chunk, chunk, 0)  # [C, nq]
        st = s.T  # [nq, C]
        touched = st != 0.0
        d = jnp.where(touched, -st, INF)
        cols = ci * chunk + jax.lax.broadcasted_iota(jnp.int32, (nq, chunk), 1)
        nd_, ni_ = T.merge_topk(cd, cidx, d, cols, k)
        return (nd_, ni_, nacc + jnp.sum(touched, axis=1, dtype=jnp.int32)), None

    init = (
        jnp.full((nq, k), INF, jnp.float32),
        jnp.full((nq, k), -1, jnp.int32),
        jnp.zeros(nq, jnp.int32),
    )
    (cd, cpos, nd), _ = jax.lax.scan(step, init, jnp.arange(num_chunks))
    ids = jnp.where(cpos >= 0, corpus_ids[jnp.clip(cpos, 0, n_rows - 1)], -1)
    return cd, ids, nd
