"""Round-3 sparse exact-scan formulation A/B (VERDICT r2 item 6).

The 1M sparse scan (dot_qdense: one 4B gather into the densified
query table per corpus element) runs at 401 qps — granule-count-bound
on C*nnz tiny gathers, INDEPENDENT of Q. Candidate reformulations that
attack the granule count / granule size before any Pallas work:

  qdense  — the shipped formulation (control).
  qT      — transposed query table qdT f32[V, Q]: per corpus element
            gather a CONTIGUOUS [Q]-row (4*Q-byte granule instead of
            4B) and segment-sum: out[c, :] = sum_j qdT[xcol[c,j]] *
            xval[c,j]. Same granule count, 2048x the useful bytes per
            granule; amortizes over the query batch.
  head    — Zipf dense-head hybrid: vocab sorted by corpus frequency;
            the top-H terms live in a dense bf16 [N, H] matrix (pure
            MXU matmul), the tail stays CSR via dot_qdense with its
            granule count cut by the head's nnz coverage.

Each arm is checked exact against a small host-f64 oracle slice before
timing. Sweeps Q in (512, 2048) at 100k and 1M.

Durable: bench_results/r3_sscan.jsonl. Usage: r3_sparse_scan.py [n]
"""

import json
import os
import sys
import time
import traceback

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LOG = os.path.join(REPO, "bench_results", "r3_sscan.jsonl")
K = 10


def emit(**kw):
    os.makedirs(os.path.dirname(LOG), exist_ok=True)
    kw["t"] = round(time.time(), 1)
    with open(LOG, "a") as f:
        f.write(json.dumps(kw) + "\n")
    print(json.dumps(kw), flush=True)


def pad_csr(pts, nnz, pad_id):
    n = len(pts)
    col = np.full((n, nnz), pad_id, np.int32)
    val = np.zeros((n, nnz), np.float32)
    for i, (c, v) in enumerate(pts):
        m = len(c)
        col[i, :m] = c
        val[i, :m] = v / max(np.sqrt((np.asarray(v) ** 2).sum()), 1e-30)
    return col, val


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    chunk_override = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    vocab = 30_000 if n <= 100_000 else 60_000
    import jax

    plat = os.environ.get("JAX_PLATFORMS", "")
    if plat:  # the axon site hook ignores the env var alone (CLAUDE.md)
        jax.config.update("jax_platforms", plat.split(",")[0])
    import jax.numpy as jnp

    from tpu_knn.ops.sparse import dot_qdense, _densify
    from tpu_knn.utils.jitcache import enable_persistent_cache
    from tpu_knn.eval.datasets import sparse_like

    enable_persistent_cache()
    nq_max = 2048
    pts = sparse_like(n + nq_max, vocab=vocab, nnz=64, seed=0)
    nnz = max(len(c) for c, _ in pts)
    v_pad = ((vocab + 127) // 128) * 128
    ccol_np, cval_np = pad_csr(pts[:n], nnz, v_pad + 1)
    qcol_np, qval_np = pad_csr(pts[n:], nnz, v_pad + 1)
    # pad the corpus to a chunk-multiple: pad rows carry val=0 so
    # they score 0 everywhere and only feed the discarded row-min
    pad_to = max(2048, chunk_override)
    npad = ((n + pad_to - 1) // pad_to) * pad_to
    if npad > n:
        ccol_np = np.vstack([ccol_np, np.full((npad - n, nnz), v_pad + 1, np.int32)])
        cval_np = np.vstack([cval_np, np.zeros((npad - n, nnz), np.float32)])
    emit(event="encoded", n=n, npad=npad, nnz=nnz, v_pad=v_pad)

    ccol = jnp.asarray(ccol_np)
    cval = jnp.asarray(cval_np)

    # host-f64 oracle on a tiny slice (64 q x first 4096 rows)
    def host_dots(qi, ci):
        qd = np.zeros((len(qi), vocab), np.float64)
        for r, i in enumerate(qi):
            qd[r, qcol_np[i, qval_np[i] != 0] - 1] = qval_np[i][qval_np[i] != 0]
        xd = np.zeros((len(ci), vocab), np.float64)
        for r, i in enumerate(ci):
            xd[r, ccol_np[i, cval_np[i] != 0] - 1] = cval_np[i][cval_np[i] != 0]
        return qd @ xd.T

    oracle = host_dots(range(64), range(4096))

    def chunks_of(nn, c):
        return (nn + c - 1) // c

    def run_arm(tag, fn, nq, chunk, err, extra=None):
        t0 = time.perf_counter()
        float(jnp.sum(fn()))
        cold = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(jnp.sum(fn()))
        dt = time.perf_counter() - t0
        emit(arm=tag, n=n, nq=nq, chunk=chunk, oracle_maxerr=float(err),
             wall_s=round(dt, 3), qps=round(nq / dt, 1),
             cold_s=round(cold, 2), **(extra or {}))

    from functools import partial

    # ---- arm 1: qdense (control) ----
    # only a reduction leaves the loop (row-min of negated dots) — keeps
    # all work live with an O(Q) carry
    @partial(jax.jit, static_argnames=("chunk",))
    def scan_qdense(qd, ccol, cval, chunk):
        nc = ccol.shape[0] // chunk

        def body(ci, acc):
            xc = jax.lax.dynamic_slice_in_dim(ccol, ci * chunk, chunk, 0)
            xv = jax.lax.dynamic_slice_in_dim(cval, ci * chunk, chunk, 0)
            d = dot_qdense(qd, xc, xv)
            return jnp.minimum(acc, jnp.min(-d, 1))

        acc = jnp.full((qd.shape[0],), np.inf, jnp.float32)
        return jax.lax.fori_loop(0, nc, body, acc)

    # ---- arm 2: transposed query table ----
    @partial(jax.jit, static_argnames=("chunk",))
    def scan_qt(qdT, ccol, cval, chunk):
        nc = ccol.shape[0] // chunk
        v = qdT.shape[0]

        def body(ci, acc):
            xc = jax.lax.dynamic_slice_in_dim(ccol, ci * chunk, chunk, 0)
            xv = jax.lax.dynamic_slice_in_dim(cval, ci * chunk, chunk, 0)
            idx = jnp.clip(xc - 1, 0, v - 1)
            rows = qdT[idx]  # [chunk, nnz, Q] contiguous Q-rows
            d = jnp.einsum("cnq,cn->qc", rows, xv,
                           precision=jax.lax.Precision.HIGHEST,
                           preferred_element_type=jnp.float32)
            return jnp.minimum(acc, jnp.min(-d, 1))

        acc = jnp.full((qdT.shape[1],), np.inf, jnp.float32)
        return jax.lax.fori_loop(0, nc, body, acc)

    # corpus arrays padded to a 2048 multiple (zero rows score 0 and
    # only affect the discarded row-min sentinel, not timings materially)
    # ---- arm 3: dense-head hybrid ----
    # vocab frequency order from the corpus
    freq = np.bincount(ccol_np[cval_np != 0].ravel() - 1, minlength=v_pad + 2)

    def make_head(H):
        order = np.argsort(-freq[:vocab], kind="stable")
        head_terms = order[:H]  # 0-based
        is_head = np.zeros(v_pad + 2, bool)
        is_head[head_terms] = True
        headpos = np.full(v_pad + 2, 0, np.int32)
        headpos[head_terms] = np.arange(H, dtype=np.int32)
        # corpus head-dense matrix + tail CSR (over the padded rows)
        chead = np.zeros((npad, H), np.float32)
        mask_h = is_head[np.clip(ccol_np - 1, 0, v_pad + 1)] & (cval_np != 0)
        rows_i, slots_i = np.nonzero(mask_h)
        chead[rows_i, headpos[ccol_np[rows_i, slots_i] - 1]] = cval_np[rows_i, slots_i]
        tcol = np.where(mask_h, v_pad + 1, ccol_np)
        tval = np.where(mask_h, 0.0, cval_np)
        # compact tails left (stable argsort pushes nonzeros first) and
        # truncate to the max residual width (rounded up to 8)
        m = tval != 0
        ordidx = np.argsort(~m, axis=1, kind="stable")
        tcol = np.take_along_axis(tcol, ordidx, 1)
        tval = np.take_along_axis(tval, ordidx, 1)
        tn = max(8, ((int(m.sum(1).max()) + 7) // 8) * 8)
        ncol = np.where(tval[:, :tn] != 0, tcol[:, :tn], v_pad + 1).astype(np.int32)
        nval = tval[:, :tn].astype(np.float32)
        cover = float(mask_h.sum()) / max(float((cval_np != 0).sum()), 1.0)
        return headpos, is_head, chead, ncol, nval, tn, cover

    @partial(jax.jit, static_argnames=("chunk",))
    def scan_head(qhead, qd, chead_bf, tcol, tval, chunk):
        nc = tcol.shape[0] // chunk

        def body(ci, acc):
            xh = jax.lax.dynamic_slice_in_dim(chead_bf, ci * chunk, chunk, 0)
            g = jnp.dot(qhead.astype(jnp.bfloat16), xh.T,
                        preferred_element_type=jnp.float32)
            xc = jax.lax.dynamic_slice_in_dim(tcol, ci * chunk, chunk, 0)
            xv = jax.lax.dynamic_slice_in_dim(tval, ci * chunk, chunk, 0)
            d = g + dot_qdense(qd, xc, xv)
            return jnp.minimum(acc, jnp.min(-d, 1))

        acc = jnp.full((qhead.shape[0],), np.inf, jnp.float32)
        return jax.lax.fori_loop(0, nc, body, acc)

    # head-hybrid encodings (shared across nq arms)
    H = 1024
    headpos_np, is_head_np, chead_np, tcol_np, tval_np, tn, cover = make_head(H)
    emit(event="head_encoded", H=H, tail_nnz=tn, head_cover=round(cover, 4))
    chead_bf = jnp.asarray(chead_np, jnp.bfloat16)
    tcol = jnp.asarray(tcol_np)
    tval = jnp.asarray(tval_np)
    headpos = jnp.asarray(headpos_np)
    is_head = jnp.asarray(is_head_np)

    try:
        for nq in (512, 2048):
            qcol = jnp.asarray(qcol_np[:nq])
            qval = jnp.asarray(qval_np[:nq])
            qd = _densify(qcol, qval, v_pad)
            chunk = chunk_override or (2048 if n <= 100_000 else 1024)

            # oracle errors (distance blocks on the 64x4096 slice)
            dd = np.asarray(dot_qdense(qd[:64], ccol[:4096], cval[:4096]))
            err_qd = np.abs(dd - oracle).max()
            run_arm("qdense", lambda: scan_qdense(qd, ccol, cval, chunk),
                    nq, chunk, err_qd)

            qdT = jnp.asarray(np.ascontiguousarray(np.asarray(qd).T))
            idx64 = jnp.clip(ccol[:4096] - 1, 0, v_pad - 1)
            rows64 = qdT[idx64]
            dT = np.asarray(jnp.einsum(
                "cnq,cn->qc", rows64[:, :, :64], cval[:4096],
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32))
            err_qt = np.abs(dT - oracle).max()
            run_arm("qT", lambda: scan_qt(qdT, ccol, cval, chunk),
                    nq, chunk, err_qt)

            # head arm: query split (head positions densified separately)
            qhead = np.zeros((nq, H), np.float32)
            mh = is_head_np[np.clip(qcol_np[:nq] - 1, 0, v_pad + 1)] & (qval_np[:nq] != 0)
            ri, si = np.nonzero(mh)
            qhead[ri, headpos_np[qcol_np[:nq][ri, si] - 1]] = qval_np[:nq][ri, si]
            qtailcol = np.where(mh, v_pad + 1, qcol_np[:nq])
            qtailval = np.where(mh, 0.0, qval_np[:nq])
            qd_tail = _densify(jnp.asarray(qtailcol), jnp.asarray(qtailval), v_pad)
            qhead_j = jnp.asarray(qhead)
            gh = np.asarray(jnp.dot(
                qhead_j[:64].astype(jnp.bfloat16), chead_bf[:4096].T,
                preferred_element_type=jnp.float32))
            dh = gh + np.asarray(dot_qdense(qd_tail[:64], tcol[:4096], tval[:4096]))
            err_head = np.abs(dh - oracle).max()  # bf16 head: expect ~1e-2
            run_arm("head", lambda: scan_head(qhead_j, qd_tail, chead_bf,
                                              tcol, tval, chunk),
                    nq, chunk, err_head, extra={"H": H, "cover": round(cover, 4)})
    except Exception:
        emit(event="crash", err=traceback.format_exc()[-900:])
        raise SystemExit(2)


if __name__ == "__main__":
    main()
