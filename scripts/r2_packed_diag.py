"""Diagnose the batch19 packed-transport recall collapse ON THE CHIP.

batch19 (first on-chip correctness check after e508241/bbe2a02): every
query path through ops/qpack.py returns wrong results on the TPU while
the CPU suite pins packed == eager — SIFT-1M l2 HNSW converges to
recall 0.40 vs a cached known-good gold (was 0.9999), the sparse exact
scan disagrees with host f64 at 0.40, glove caps at 0.50. The qps
roughly doubled at the same time, i.e. garbage fast. This backend has
one proven miscompile class already (hinted scatters, CLAUDE.md), so
each transport primitive is tested in isolation before the end-to-end
A/Bs — all hypotheses in ONE script per the crash economics.

Stages (each emits JSON to /tmp/r2_pdiag.jsonl):
  rt:    raw upload/download byte-exactness per dtype x size
  echo:  pack_host -> jit(unpack_device) -> host, exact compare per key
  res:   jit(pack_results) -> host unpack_results, exact compare
  e2e:   packed vs eager seq_search/hnsw on 10k l2 / cosine-d100 /
         sparse-cosine, per-query mismatch masks
"""

import json
import time
import traceback

import numpy as np

LOG = "/tmp/r2_pdiag.jsonl"


def emit(**kw):
    with open(LOG, "a") as f:
        f.write(json.dumps(kw) + "\n")
    print(json.dumps(kw), flush=True)


def cmp_bits(name, host, back):
    back = np.asarray(back)
    if host.shape != back.shape or host.dtype != back.dtype:
        emit(stage=name, ok=False, why="shape/dtype",
             want=str((host.shape, str(host.dtype))),
             got=str((back.shape, str(back.dtype))))
        return False
    a = np.ascontiguousarray(host).view(np.uint8).reshape(-1)
    b = np.ascontiguousarray(back).view(np.uint8).reshape(-1)
    bad = np.nonzero(a != b)[0]
    if bad.size == 0:
        emit(stage=name, ok=True)
        return True
    emit(stage=name, ok=False, nbad=int(bad.size), total=int(a.size),
         first_bad_byte=int(bad[0]), last_bad_byte=int(bad[-1]),
         frac=round(bad.size / a.size, 4))
    return False


def main():
    import jax
    import jax.numpy as jnp

    import tpu_knn.ops.qpack as QP

    rng = np.random.default_rng(7)
    try:
        # ---- stage rt: raw transfer byte-exactness ----
        for dt, code in ((np.uint32, "u32"), (np.int32, "i32"),
                         (np.float32, "f32"), (np.uint8, "u8")):
            for size in (1024, 1 << 18, 1 << 21):
                a = rng.integers(0, 255, size=size * 4, dtype=np.uint8)
                a = np.ascontiguousarray(a).view(dt)
                if dt is np.float32:  # avoid NaN-payload ambiguity
                    a = rng.standard_normal(size).astype(np.float32)
                d = jnp.asarray(a)
                back = np.asarray(d)
                cmp_bits(f"rt:{code}:{a.nbytes}", a, back)

        # ---- stage echo: the actual pack/unpack pipeline ----
        arrays = {
            "q": rng.standard_normal((2048, 128)).astype(np.float32),
            "qcol": rng.integers(0, 60000, (512, 64)).astype(np.int32),
            "qval": rng.standard_normal((512, 64)).astype(np.float32),
            "qlen": rng.integers(1, 64, 512).astype(np.int32),
            "qu8": rng.integers(0, 255, (300, 13)).astype(np.uint8),
        }
        buf, meta = QP.pack_host(arrays)

        @jax.jit
        def echo(b):
            return QP.unpack_device(b, meta)

        out = echo(jnp.asarray(buf))
        for k in arrays:
            cmp_bits(f"echo:{k}", arrays[k], out[k])

        # echo through a second jit that ALSO consumes the arrays (the
        # real programs never return the unpacked buffers raw — XLA may
        # compile the pure-echo differently)
        @jax.jit
        def echo_used(b):
            d = QP.unpack_device(b, meta)
            s = jnp.sum(d["q"]) + jnp.sum(d["qval"])
            return d["q"] + 0.0 * s, d["qcol"] + jnp.int32(0) * jnp.sum(d["qlen"])

        q2, c2 = echo_used(jnp.asarray(buf))
        cmp_bits("echo_used:q", arrays["q"], q2)
        cmp_bits("echo_used:qcol", arrays["qcol"], c2)

        # ---- stage res: result pack / host unpack ----
        dists = np.sort(rng.standard_normal((2048, 10)).astype(np.float32), 1)
        ids = rng.integers(-1, 1_000_000, (2048, 10)).astype(np.int32)

        @jax.jit
        def respack(d, i):
            return QP.pack_results(d, i)

        packed = np.asarray(respack(jnp.asarray(dists), jnp.asarray(ids)))
        d2, i2 = QP.unpack_results(packed, 10)
        cmp_bits("res:d", dists, np.ascontiguousarray(d2))
        cmp_bits("res:ids", ids, np.ascontiguousarray(i2))

        # ---- stage e2e: packed vs eager on small corpora ----
        from tpu_knn import Index, Params
        from tpu_knn.core.dataset import DataKind
        from tpu_knn.eval.datasets import sift_like, glove_like, sparse_like

        def ab(tag, idx, q, k=10):
            t0 = time.perf_counter()
            QP.PACKED_QUERIES = False
            de, ie = idx.knn_query_batch(q, k)
            QP.PACKED_QUERIES = True
            dp, ip = idx.knn_query_batch(q, k)
            QP.PACKED_QUERIES = False
            row_ok = np.all(np.asarray(ie) == np.asarray(ip), axis=1) & np.all(
                (np.asarray(de) == np.asarray(dp))
                | (np.abs(np.asarray(de) - np.asarray(dp)) <= 5e-3 * np.abs(np.asarray(de)) + 1e-5),
                axis=1,
            )
            nbad = int((~row_ok).sum())
            kw = dict(stage=f"e2e:{tag}", ok=bool(nbad == 0), nbad=nbad,
                      nq=int(len(row_ok)), s=round(time.perf_counter() - t0, 1))
            if nbad:
                badrows = np.nonzero(~row_ok)[0]
                kw["bad_rows_head"] = badrows[:16].tolist()
                kw["bad_row_frac"] = round(nbad / len(row_ok), 3)
                b0 = int(badrows[0])
                kw["row0_eager_ids"] = np.asarray(ie)[b0].tolist()
                kw["row0_packed_ids"] = np.asarray(ip)[b0].tolist()
                kw["row0_eager_d"] = [float(x) for x in np.asarray(de)[b0]]
                kw["row0_packed_d"] = [float(x) for x in np.asarray(dp)[b0]]
            emit(**kw)

        N, NQ = 10_000, 512
        pts = sift_like(N + NQ, 128, seed=0)

        ix = Index("l2", Params(dim=128), method="seq_search")
        ix.add_dense_batch(pts[:N])
        ix.build_index()
        ab("ss_l2", ix, pts[N:])

        gl = glove_like(N + NQ, 100, seed=0)
        ixc = Index("cosinesimil", Params(dim=100), method="seq_search")
        ixc.add_dense_batch(gl[:N])
        ixc.build_index()
        ab("ss_cos100", ixc, gl[N:])

        ixh = Index("l2", Params(dim=128), method="hnsw")
        ixh.add_dense_batch(pts[:N])
        ixh.build_index(Params(M=16, efConstruction=100))
        ixh.set_query_time_params(Params(efSearch=50))
        ab("hnsw_l2", ixh, pts[N:])

        sp = sparse_like(N + NQ, vocab=30_000, nnz=64, seed=0)
        ixs = Index("cosinesimil_sparse", method="seq_search",
                    data_type=DataKind.SPARSE)
        ixs.add_sparse_batch(sp[:N])
        ixs.build_index()
        ab("ss_sparse", ixs, sp[N:])

        ixsh = Index("cosinesimil_sparse", method="hnsw",
                     data_type=DataKind.SPARSE)
        ixsh.add_sparse_batch(sp[:N])
        ixsh.build_index(Params(M=16, efConstruction=50))
        ixsh.set_query_time_params(Params(efSearch=50))
        ab("hnsw_sparse", ixsh, sp[N:])
    except Exception:
        emit(stage="crash", err=traceback.format_exc()[-1200:])
        raise SystemExit(2)


if __name__ == "__main__":
    main()
