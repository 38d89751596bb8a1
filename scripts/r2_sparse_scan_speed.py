"""Sparse exact-scan speed attribution. The corpus-densify MXU
formulation has a FLOP bound of ~123ms per 512x100k sweep
([512, 30080] x [30080, 100k] f32 at ~25 TF/s) = ~4.2k qps — yet it
measured 95 qps wall (40x off) before being retired for wrongness,
while the shipped qdense gather does 652 qps (its bill is HBM:
corpus_nnz x Q gathered values). If densify-under-scan can be made
correct (see diag3) and fast, the MXU path is ~6x the gather path.

Times each stage standalone ON DEVICE (fori_loop-wrapped, per
CLAUDE.md dispatch-latency rules): corpus-chunk densify alone, dense
matmul alone (pre-densified chunk), the fused scan pipeline, and the
qdense gather pipeline. Appends JSON to /tmp/r2_sscan_speed.jsonl.
"""

import functools
import json
import time

import numpy as np

LOG = "/tmp/r2_sscan_speed.jsonl"
N, NQ = 100_000, 512


def emit(**kw):
    with open(LOG, "a") as f:
        f.write(json.dumps(kw) + "\n")
    print(json.dumps(kw), flush=True)


def main():
    import jax
    import jax.numpy as jnp

    import tpu_knn.ops.sparse as S
    from tpu_knn import Index
    from tpu_knn.core.dataset import DataKind
    from tpu_knn.eval.datasets import sparse_like

    pts = sparse_like(N + NQ, vocab=30_000, nnz=64, seed=0)
    idx = Index("cosinesimil_sparse", method="seq_search",
                data_type=DataKind.SPARSE)
    idx.add_sparse_batch(pts[:N])
    idx.build_index()
    data = idx.method.data
    qenc = idx.method._scan_queries(pts[N:N + NQ])
    v_pad = data.extra["vocab_mark"].shape[0]
    qd = qenc["q_dense"]
    n_pad = data.col.shape[0]
    CH = 2048
    nch = n_pad // CH
    cols = data.col[: nch * CH].reshape(nch, CH, -1)
    vals = data.val[: nch * CH].reshape(nch, CH, -1)

    def timeit(fn, *args, reps=3):
        out = fn(*args)
        float(jnp.sum(out[0] if isinstance(out, tuple) else out))
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        float(jnp.sum(out[0] if isinstance(out, tuple) else out))
        return (time.perf_counter() - t0) / reps

    # 1. densify all corpus chunks under lax.map, summed to a scalar
    @jax.jit
    def densify_all(c, v):
        def one(a):
            return jnp.sum(S._densify(a[0], a[1], v_pad), dtype=jnp.float32)
        return jnp.sum(jax.lax.map(one, (c, v)))

    emit(kind="densify_only", ms=round(timeit(densify_all, cols, vals) * 1e3, 1))

    # 2. dense matmul alone: one pre-densified chunk x nch repeats
    xd0 = S._densify(cols[0], vals[0], v_pad)

    @jax.jit
    def matmul_rep(qdv, xdv):
        def body(i, acc):
            g = jax.lax.dot_general(
                qdv, xdv, (((1,), (1,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32)
            return acc + jnp.sum(g)
        return jax.lax.fori_loop(0, nch, body, jnp.float32(0))

    dt = timeit(matmul_rep, qd, xd0)
    emit(kind="matmul_only", ms=round(dt * 1e3, 1),
         tfs=round(2.0 * NQ * v_pad * CH * nch / dt / 1e12, 2))

    # 3. fused densify+matmul scan (the retired blocked pipeline)
    @jax.jit
    def blocked_pipeline(qdv, c, v):
        def one(a):
            xd = S._densify(a[0], a[1], v_pad)
            g = jax.lax.dot_general(
                qdv, xd, (((1,), (1,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32)
            return jnp.min(g, axis=1)
        return jax.lax.map(one, (c, v))

    emit(kind="blocked_pipeline",
         ms=round(timeit(blocked_pipeline, qd, cols, vals) * 1e3, 1))

    # 4. qdense gather pipeline (shipped)
    @jax.jit
    def qdense_pipeline(qdv, c, v):
        def one(a):
            return jnp.min(S.dot_qdense(qdv, a[0], a[1]), axis=1)
        return jax.lax.map(one, (c, v))

    emit(kind="qdense_pipeline",
         ms=round(timeit(qdense_pipeline, qd, cols, vals) * 1e3, 1))

    # 5. gather-formulated corpus densify (scatter-free): R=I trick is
    # too wide; instead time the einsum dot with bf16 inputs (is the
    # HIGHEST-precision einsum the gather path's real cost?)
    @jax.jit
    def qdense_bf16(qdv, c, v):
        qb = qdv.astype(jnp.bfloat16)

        def one(a):
            cc, vv = a
            cnn = cc.shape[0]
            idx = jnp.clip(cc.reshape(-1) - 1, 0, v_pad - 1)
            qvals = jnp.take(qb, idx, axis=1).reshape(NQ, cnn, -1)
            d = jnp.einsum("qcn,cn->qc", qvals, vv.astype(jnp.bfloat16),
                           preferred_element_type=jnp.float32)
            return jnp.min(d, axis=1)
        return jax.lax.map(one, (c, v))

    emit(kind="qdense_bf16_pipeline",
         ms=round(timeit(qdense_bf16, qd, cols, vals) * 1e3, 1))

    # 6. post-hint-fix correctness: does the blocked MXU formulation now
    # agree with the verified gather path on device? (The hinted-scatter
    # miscompile was the prime suspect for its 0.84-recall wrongness;
    # commit 958dea3 dropped the hints.) Compare raw dots on head/mid/
    # tail chunks — agreement here re-opens the ~6x MXU path.
    @jax.jit
    def both_dots(qdv, c, v):
        xd = S._densify(c, v, v_pad)
        g_mxu = jax.lax.dot_general(
            qdv, xd, (((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)
        g_gather = S.dot_qdense(qdv, c, v)
        return jnp.max(jnp.abs(g_mxu - g_gather))

    for tag, j in (("head", 0), ("mid", nch // 2), ("tail", nch - 1)):
        emit(kind="blocked_vs_gather", chunk=tag,
             maxabs=float(both_dots(qd, cols[j], vals[j])))

    # same check inside lax.map (the miscompile was context-dependent)
    @jax.jit
    def both_dots_mapped(qdv, c, v):
        def one(a):
            xd = S._densify(a[0], a[1], v_pad)
            g_mxu = jax.lax.dot_general(
                qdv, xd, (((1,), (1,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32)
            return jnp.max(jnp.abs(g_mxu - S.dot_qdense(qdv, a[0], a[1])))
        return jnp.max(jax.lax.map(one, (c, v)))

    emit(kind="blocked_vs_gather_mapped",
         maxabs=float(both_dots_mapped(qd, cols, vals)))


if __name__ == "__main__":
    main()
