"""Blocked sparse distance primitives (padded-CSR, TPU-native).

The reference computes sparse distances by merge-style traversal of two
sorted (id, value) arrays per pair (reference:
include/space/space_sparse_vector.h, src/distcomp_sparse_scalar_fast.cc
— the SSE4.2 ``_mm_cmpistrm`` block intersection). Neither translates to
TPU. Here the corpus is padded CSR (``cols`` i32[N, nnz], ``vals``
f32[N, nnz], sorted ascending per row) and the core primitive is a
*batched sorted lookup*: for every (query, corpus-row) pair, find the
query's value at each of the corpus row's column ids via vectorized
binary search (``jnp.searchsorted``) — O(nnz * log nnz) VPU work per
pair, memory-bounded by chunking the corpus axis.

Every sparse distance factors through that lookup:

  dot(q, x)        = sum_t  qval_at(x.col[t]) * x.val[t]
  |A ∩ B|          = sum_t  found(x.col[t])
  sum_U |q-x|^p    = sum_t (|x.val[t] - qát|^p - |qát|^p) + sum_s |q.val[s]|^p
                     (U = union of supports; qát = query value at x.col[t])

Column-id padding contract: query rows pad with PAD_Q, corpus rows pad
with PAD_X (PAD_Q != PAD_X, both larger than any real 32-bit element id
in practice), so padded slots never produce a spurious id match.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

#: Column padding sentinels (see module docstring). numpy scalars, NOT
#: jnp: a module-level jnp constant initializes the JAX backend at
#: import time, before callers can pin the platform (on this image the
#: axon site hook then dials the TPU tunnel from every process).
PAD_Q = np.int32(2**31 - 1)
PAD_X = np.int32(2**31 - 2)


def _bsearch_first_geq(sorted_ids: jax.Array, targets: jax.Array) -> jax.Array:
    """Index of the first element of ``sorted_ids`` >= each target.
    (An explicitly unrolled binary search was tried here while chasing
    the 100k sparse-scan worker crash; the true culprit was dispatch
    runtime — fixed by dot_blocked_dense — and the unroll's 7
    materialized gather steps blew the wave-program HBM estimate to
    >30GB, so the searchsorted lowering stays.)"""
    return jnp.searchsorted(sorted_ids, targets).astype(jnp.int32)


def lookup_query_vals(qcol: jax.Array, qval: jax.Array, xcol: jax.Array):
    """Batched sorted lookup.

    qcol i32[Q, nq] ascending (padded with PAD_Q), qval f32[Q, nq]
    (padded 0), xcol i32[C, nx] (padded with PAD_X).

    Returns (vals f32[Q, C, nx], found bool[Q, C, nx]): the query's value
    at each corpus column id (0 where the query has no such id).
    """
    nq = qcol.shape[1]

    def per_query(qc, qv):
        def per_row(xc):
            pos = _bsearch_first_geq(qc, xc)
            posc = jnp.clip(pos, 0, nq - 1)
            found = qc[posc] == xc
            return jnp.where(found, qv[posc], 0.0), found

        return jax.vmap(per_row)(xcol)

    return jax.vmap(per_query)(qcol, qval)


def dot_blocked(qcol, qval, xcol, xval):
    """Sparse scalar product block f32[Q, C] (reference:
    SparseScalarProductFast, src/distcomp_sparse_scalar_fast.cc)."""
    vals, _ = lookup_query_vals(qcol, qval, xcol)
    return jnp.einsum(
        "qcn,cn->qc", vals, xval,
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )


def _densify(col: jax.Array, val: jax.Array, v_pad: int) -> jax.Array:
    """Scatter padded-CSR rows into a dense [rows, v_pad] block.
    Column ids are 1-based; padding slots scatter out of range and are
    dropped (sentinel ids PAD_Q/PAD_X remap to v_pad + slot_position:
    still dropped, but distinct per slot and ascending).

    NO scatter hints, deliberately. The hinted form
    (unique_indices=True, indices_are_sorted=True) MISCOMPILES on
    XLA:TPU even with honest hints — measured on-device against
    host-oracle tables (scripts/r2_sparse_scan_diag4.py): the hinted
    scatter returned wrong table entries in 16-row bands (20k bad
    entries on a 2048-row corpus chunk, maxabs ~3) for both query and
    corpus tables, deterministically, after the duplicate-sentinel UB
    was already fixed. The unhinted scatter is exact and only ~6%
    slower in the same program (92.7 vs 87.2 ms). Do not reintroduce
    the hints without re-running diag4 on the chip."""
    r, nnz = col.shape
    rows = jax.lax.broadcasted_iota(jnp.int32, (r, nnz), 0)
    slot = jax.lax.broadcasted_iota(jnp.int32, (r, nnz), 1)
    cols0 = jnp.where(col > v_pad, v_pad + 1 + slot, col) - 1
    return jnp.zeros((r, v_pad), jnp.float32).at[rows, cols0].add(
        val, mode="drop"
    )


def dot_blocked_dense(qcol, qval, xcol, xval, v_pad: int, precision="float32"):
    """Sparse scalar product via dense-after-scatter: densify both sides
    over the (bounded, padded) vocabulary and take ONE MXU matmul with a
    deep contraction — ~100x faster than the per-pair sorted lookup at
    benchmark scales, and it keeps per-dispatch runtime bounded (the
    lookup formulation's scalar-gather storm ran long enough at 100k
    corpora to trip the TPU worker watchdog). Exact: scatter-add of
    disjoint ids + f32-HIGHEST matmul. Used when the corpus vocabulary
    fits the gate (spaces/sparse.py VOCAB_DENSE_MAX); the lookup path
    remains for unbounded/hashed id spaces and the union-Lp distances."""
    from .distance import matmul

    xd = _densify(xcol, xval, v_pad)
    qd = _densify(qcol, qval, v_pad)  # loop-invariant: XLA hoists out of scans
    return matmul(qd, xd, precision)


def dot_qdense(qd, xcol, xval):
    """Sparse dot of densified queries against CSR rows: f32[Q, C].

    qd f32[Q, V] (densified query table), xcol i32[C, nnz], xval
    f32[C, nnz]. One gather into the table per corpus element instead of
    a binary search — padded cols (PAD_X) clip in-range but their xval
    is 0, so they contribute nothing. This is the non-searchsorted dot
    used everywhere a densified query side exists (the
    searchsorted-under-big-program formulation faulted the TPU worker).
    """
    v = qd.shape[1]
    c, nnz = xcol.shape
    idx = jnp.clip(xcol.reshape(-1) - 1, 0, v - 1)
    qvals = jnp.take(qd, idx, axis=1).reshape(qd.shape[0], c, nnz)
    return jnp.einsum(
        "qcn,cn->qc", qvals, xval,
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )


def intersect_count_qdense(qd, xcol):
    """|A ∩ B| against a densified query *presence* table: f32[Q, C].

    qd f32[Q, V] holds 1.0 at the query's column ids; corpus padding
    (PAD_X) clips in-range so it is masked explicitly (unlike dot_qdense,
    where the zero xval kills it)."""
    v = qd.shape[1]
    c, nnz = xcol.shape
    idx = jnp.clip(xcol.reshape(-1) - 1, 0, v - 1)
    hits = jnp.take(qd, idx, axis=1).reshape(qd.shape[0], c, nnz)
    real = ((xcol >= 1) & (xcol <= v)).astype(jnp.float32)[None, :, :]
    return jnp.sum(hits * real, axis=2)


#: Pairwise-dot engine for the construction heuristic:
#:   "mxu"    = densify BOTH candidate sides over the padded vocabulary
#:              and contract them with one batched matmul — no gathers at
#:              all. ~v_pad/nnz more FLOPs than needed, but they land on
#:              the MXU (milliseconds per wave at bench scales), and it
#:              avoids the giant take_along_axis the gather backend runs.
#:   "gather" = densify the a-side only and take_along_axis b-elements
#:              from the tables. Fewer FLOPs, but the [bk, C, C2*nnz]
#:              table gather is the isolated remaining suspect for the
#:              100k sparse wave-program TPU worker fault (every
#:              exactPairs variant crashed at the same early-wave sync
#:              while exactPairs-off builds completed —
#:              scripts/r2_sparse_crash_bisect.py, 2026-08-18).
#: Correctness of the both-sides-densify formulation on TPU was
#: re-proven after the scatter-hint fix (blocked_vs_gather maxabs ~1e-5
#: on-device, standalone and under lax.map — r2_sparse_scan_speed.py).
#: Pairwise candidate-gram formulation (pair_dots_qdense): "mxu"
#: densifies both candidate sides to [bk, C, v_pad] tables and runs one
#: matmul per block; "support" matches column ids by equality and never
#: densifies — a fori_loop over the a-side nnz with a [B, C, C2, nnz_b]
#: compare+reduce fusion per step (the pair-wise analog of the
#: support_dots query-side win). The round-4 wave-window trace
#: attributes ~31% of the exact sparse wave build's device time to the
#: mxu path's densify scatters (bench_results/r4_sparse.jsonl
#: wave_window, ops/sparse.py:253 while-loops), which scale with
#: C*v_pad cells; the support path scales with C*C2*nnz^2 compares.
#: Same-session A/B on chip (r4_sparse.jsonl pairab, 50k exact waves,
#: waveSize=512): support builds in 268.6 s vs mxu's 483.2 s (1.8x) at
#: IDENTICAL recall (0.9539/0.9924 at ef=50/100 — same selections), so
#: support is the default; mxu/gather stay as A/B arms.
PAIR_BACKEND = "support"

#: Beam-traversal candidate scoring formulation (SparseDotBase
#: .gathered_block): "support" matches candidate column ids against the
#: query's own <=nnz-wide support by equality (support_dots below);
#: "qdense" looks each candidate element up in the densified [B, v_pad]
#: query table (take_along_axis). Measured on chip (r2_travprof.jsonl,
#: 100k docs, 512 queries, exact traversal): support 2,988 qps at
#: ef=100 / 3,540 at ef=50 vs qdense's 176 / 297 — the q_dense
#: take_along_axis inside the beam while_loop compiled to a 2.6 s
#: fusion (spaces/sparse.py gathered_block) while the equality-match
#: reduce fusion costs ~20 ms for the same batch. Both are exact
#: (unique column ids per row; padding sentinels disjoint), so this is
#: purely a formulation choice; "qdense" stays as the A/B arm.
GATHER_SCORING = "support"


def support_dots(qcol, qval, cols, vals):
    """Per-candidate dots WITHOUT the densified-query table:

        dot[b, k] = sum_j vals[b,k,j] * qval[b, t : qcol[b,t] == cols[b,k,j]]

    qcol i32[B, T] ascending (PAD_Q padding), qval f32[B, T] (0 at
    padding), cols i32[B, K, nnz] (PAD_X padding), vals f32[B, K, nnz].
    Column ids are unique per row, so at most one t matches each (b,k,j)
    and the sum over t is exact; both padding sentinels are distinct
    and qval is 0 at padded slots, so padding contributes nothing.

    The [B, K, nnz, T] equality mask is generated inside the reduce
    fusion (VPU compare/select/add) rather than materialized — this
    trades the q_dense table's element-granular HBM gathers for
    B*K*nnz*T on-core flops.
    """
    eq = cols[:, :, :, None] == qcol[:, None, None, :]  # [B, K, nnz, T]
    qmatch = jnp.sum(jnp.where(eq, qval[:, None, None, :], 0.0), axis=-1)
    return jnp.sum(qmatch * vals, axis=-1)


def support_found(qcol, cols):
    """Membership counterpart of support_dots: for each candidate
    element, whether its column id appears in the query's support —
    the intersection primitive for the binary/jaccard family.
    Returns f32[B, K, nnz] of 0/1."""
    eq = cols[:, :, :, None] == qcol[:, None, None, :]
    return jnp.any(eq, axis=-1).astype(jnp.float32)


def pair_dots_qdense(acol, aval, bcol, bval, v_pad: int, budget: int = 1 << 26):
    """Pairwise dots of per-row candidate sets: [B, C, C2].

    acol/aval [B, C, nnz_a] are the "query-side" CSR rows, bcol/bval
    [B, C2, nnz_b] the scored rows (typically the same gathered
    candidate set — a gram matrix for the HNSW neighbor-selection
    heuristic, reference hnsw.h:129-168). Densified per PAIR_BACKEND
    (see above), blocked over B with lax.map so the [bk, *, v_pad]
    tables stay within ``budget`` f32 elements.
    """
    b, c, nnz_a = acol.shape
    c2, nnz_b = bcol.shape[1], bcol.shape[2]
    if PAIR_BACKEND == "support":
        return _pair_dots_support(acol, aval, bcol, bval)
    mxu = PAIR_BACKEND == "mxu"
    per_row = (c + c2 if mxu else c) * v_pad
    block = _pair_dots_block_mxu if mxu else _pair_dots_block
    bk = max(1, min(b, budget // max(per_row, 1)))
    if bk == b:
        return block(acol, aval, bcol, bval, v_pad)
    bp = ((b + bk - 1) // bk) * bk

    def padb(x):
        if bp != b:
            x = jnp.concatenate(
                [x, jnp.zeros((bp - b,) + x.shape[1:], x.dtype)], 0
            )
        return x.reshape((bp // bk, bk) + x.shape[1:])

    out = jax.lax.map(
        lambda a: block(a[0], a[1], a[2], a[3], v_pad),
        (padb(acol), padb(aval), padb(bcol), padb(bval)),
    )
    return out.reshape(bp, c, c2)[:b]


def _pair_dots_support(acol, aval, bcol, bval):
    """[B, C, C2] pairwise dots by column-equality match — no densify.

    dot(a, b) = sum_i aval_i * (bval at the b-element whose column
    equals acol_i, else 0); column ids are unique within a row and
    padding slots carry val 0, so the match is exact. One fori_loop
    step per a-side nnz: a [B, C, C2, nnz_b] compare + masked reduce
    that XLA fuses without materializing the full mask."""
    c2 = bcol.shape[1]

    def step(i, acc):
        ac = jax.lax.dynamic_slice_in_dim(acol, i, 1, 2)  # [B, C, 1]
        av = jax.lax.dynamic_slice_in_dim(aval, i, 1, 2)[..., 0]  # [B, C]
        eq = bcol[:, None, :, :] == ac[:, :, None, :]  # [B, C, C2, nnz_b]
        contrib = jnp.sum(jnp.where(eq, bval[:, None, :, :], 0.0), axis=-1)
        return acc + av[:, :, None] * contrib

    acc = jnp.zeros((acol.shape[0], acol.shape[1], c2), jnp.float32)
    return jax.lax.fori_loop(0, acol.shape[2], step, acc)


def _pair_dots_block_mxu(ac, av, bc, bv, v_pad: int):
    bk, c, nnz_a = ac.shape
    c2, nnz_b = bc.shape[1], bc.shape[2]
    ad = _densify(ac.reshape(bk * c, nnz_a), av.reshape(bk * c, nnz_a), v_pad)
    bd = _densify(bc.reshape(bk * c2, nnz_b), bv.reshape(bk * c2, nnz_b), v_pad)
    return jnp.einsum(
        "bcv,bdv->bcd",
        ad.reshape(bk, c, v_pad),
        bd.reshape(bk, c2, v_pad),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )


def _pair_dots_block(ac, av, bc, bv, v_pad: int):
    bk, c, nnz_a = ac.shape
    c2, nnz_b = bc.shape[1], bc.shape[2]
    ad = _densify(ac.reshape(bk * c, nnz_a), av.reshape(bk * c, nnz_a), v_pad)
    ad = ad.reshape(bk, c, v_pad)
    idx = jnp.clip(bc.reshape(bk, c2 * nnz_b) - 1, 0, v_pad - 1)
    idx = jnp.broadcast_to(idx[:, None, :], (bk, c, c2 * nnz_b))
    qvals = jnp.take_along_axis(ad, idx, axis=2).reshape(bk, c, c2, nnz_b)
    return jnp.einsum(
        "bcdn,bdn->bcd", qvals, bv,
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )


def intersect_count_blocked_dense(qcol, xcol, v_pad: int, precision="float32"):
    """|A ∩ B| via dense indicator matmul (ids are unique per row)."""
    from .distance import matmul

    qd = _densify(qcol, jnp.ones(qcol.shape, jnp.float32), v_pad)
    xd = _densify(xcol, jnp.ones(xcol.shape, jnp.float32), v_pad)
    return matmul(qd, xd, precision)


def intersect_count_blocked(qcol, xcol):
    """|A ∩ B| per pair as f32[Q, C] (the binary-sparse backbone;
    reference: space_sparse_bin_common.h, distcomp.h:253-262)."""
    qdummy = jnp.ones(qcol.shape, jnp.float32)
    vals, found = lookup_query_vals(qcol, qdummy, xcol)
    real = found & (xcol != PAD_X)[None, :, :]
    return jnp.sum(real.astype(jnp.float32), axis=2)


def lp_union_blocked(qcol, qval, xcol, xval, p: float, q_pterm: jax.Array):
    """sum over the union of supports of |q_t - x_t|^p, f32[Q, C].

    ``q_pterm`` f32[Q] = sum_s |q.val[s]|^p precomputed over real query
    entries. Padded corpus slots contribute |0 - 0|^p = 0 because their
    looked-up query value and x value are both 0.
    """
    vals, found = lookup_query_vals(qcol, qval, xcol)
    ax = jnp.abs(xval[None, :, :] - vals)
    d = jnp.where(ax > 0, ax**p, 0.0)  # avoid 0^p grad/NaN edge for p<1
    # remove double-counted |q|^p for matched ids, then add the full q term
    qq = jnp.where(found, jnp.abs(vals) ** p, 0.0)
    return jnp.sum(d - qq, axis=2) + q_pterm[:, None]


def linf_union_blocked(qcol, qval, xcol, xval):
    """max over the union of supports of |q_t - x_t|, f32[Q, C].

    Ids in x's support are covered by the forward lookup; ids only in
    q's support contribute |q_t| exactly, found with a reverse
    membership test (does x contain q's column).
    """
    vals, found = lookup_query_vals(qcol, qval, xcol)
    m_x = jnp.max(jnp.abs(xval[None, :, :] - vals), axis=2)  # covers x's support
    # ids present in q but not in x contribute |q_t| exactly
    _, rfound = _reverse_found(qcol, xcol)
    q_only = jnp.where(~rfound, jnp.abs(qval)[:, None, :], 0.0)  # [Q, C, nq]
    m_q = jnp.max(q_only, axis=2)
    return jnp.maximum(m_x, m_q)


def _reverse_found(qcol, xcol):
    """found[i, j, s] = does corpus row j contain query i's column s."""
    nx = xcol.shape[1]

    def per_row(xc):
        def per_query(qc):
            pos = _bsearch_first_geq(xc, qc)
            posc = jnp.clip(pos, 0, nx - 1)
            return xc[posc] == qc

        return jax.vmap(per_query)(qcol)

    found = jax.vmap(per_row)(xcol)  # [C, Q, nq]
    return None, jnp.moveaxis(found, 0, 1)  # [Q, C, nq]


def sketch_matrix(v_pad: int, dsk: int, seed: int) -> jax.Array:
    """Seeded Gaussian random-projection matrix f32[v_pad, dsk], scaled
    1/sqrt(dsk) so E[<Rq, Rx>] = <q, x> (Johnson-Lindenstrauss). Fully
    deterministic from (v_pad, dsk, seed): persistence stores only the
    seed and regenerates the matrix on load."""
    key = jax.random.PRNGKey(jnp.uint32(seed))
    return jax.random.normal(key, (v_pad, dsk), jnp.float32) * (1.0 / dsk**0.5)


#: sketch projection engine: "densify" = per-chunk scatter + deep MXU
#: matmul; "gather" = sum of R's rows at each element's column id
#: (scatter-free — exactly nnz*dsk FLOPs/row instead of v_pad*dsk, and
#: immune to any scatter-lowering defect inside mapped programs).
SKETCH_BACKEND = "densify"


@partial(jax.jit, static_argnames=("v_pad", "chunk"))
def _sketch_chunks(col, val, R, v_pad: int, chunk: int):
    n = col.shape[0]
    nc = n // chunk

    def one(args):
        c, v = args
        if SKETCH_BACKEND == "gather":
            keep = (c >= 1) & (c <= v_pad)
            rows = R[jnp.clip(c - 1, 0, v_pad - 1)]  # [chunk, nnz, dsk]
            w = jnp.where(keep, v, 0.0)
            return jnp.einsum(
                "cn,cnd->cd", w, rows,
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32,
            )
        # explicit precision: a bare @ runs at TPU default (bf16 passes)
        # — caught by the round-5 on-chip suite as a 5e-3 drift against
        # the gather backend (verify-skill gotcha: distance/projection
        # kernels must pass precision explicitly)
        return jnp.dot(
            _densify(c, v, v_pad), R,
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )

    out = jax.lax.map(
        one,
        (
            col.reshape(nc, chunk, col.shape[1]),
            val.reshape(nc, chunk, val.shape[1]),
        ),
    )
    return out.reshape(n, R.shape[1])


def sketch_csr(col, val, R, chunk: int = 2048) -> jax.Array:
    """Project padded-CSR rows through R: f32[N, dsk]. Each chunk is
    densified over the padded vocabulary and hits the MXU once — the
    transient [chunk, v_pad] block bounds memory. ``val`` carries any
    per-space normalization (rows pre-normalized for the cosine family,
    presence indicators for jaccard)."""
    n = col.shape[0]
    v_pad = R.shape[0]
    if SKETCH_BACKEND == "gather":
        # transient is [chunk, nnz, dsk] f32 — bound it (~128MB at
        # nnz=64, dsk=1024) instead of the densify path's [chunk, v_pad]
        chunk = min(chunk, 512)
    chunk = min(chunk, max(n, 1))
    n_pad = ((n + chunk - 1) // chunk) * chunk
    if n_pad != n:
        col = jnp.concatenate(
            [col, jnp.full((n_pad - n, col.shape[1]), PAD_X, col.dtype)], 0
        )
        val = jnp.concatenate(
            [val, jnp.zeros((n_pad - n, val.shape[1]), val.dtype)], 0
        )
    return _sketch_chunks(col, val, R, v_pad, chunk)[:n]


def norms_from_vals(vals: jax.Array) -> jax.Array:
    """Row L2 norms of padded CSR values (padding is 0)."""
    return jnp.sqrt(jnp.sum(vals * vals, axis=-1))


def jaccard_blocked(qcol, xcol, qlen, xlen):
    """1 - |A∩B| / |A∪B| (reference: space_sparse_jaccard.h,
    distcomp.h:253-262). qlen/xlen are true support sizes."""
    inter = intersect_count_blocked(qcol, xcol)
    union = qlen[:, None] + xlen[None, :] - inter
    return jnp.where(union > 0, 1.0 - inter / jnp.maximum(union, 1.0), 0.0)
