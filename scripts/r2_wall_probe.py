"""Attribute HNSW query WALL overhead over the axon tunnel.

batch16's dense profile: device executes the 100k/ef=20 2048-query
batch in ~30 ms while the wall is ~190 ms — ~160 ms is host/tunnel.
This names the components so the fix (packed single-upload qenc,
in-jit derived terms, packed download) is built only if the round
trips actually dominate:

  rt:        sync latency on a cached tiny device scalar
  upload:    one 1MB array vs three 1MB arrays + one sync (pipelining?)
  download:  [2048,10] f32 + i32 separately vs one packed [2048,20] f32
  dense:     encode_queries | search dispatch+sync | finalize downloads
  sparse:    same decomposition (512 queries, support scoring)

Appends JSON to /tmp/r2_wall.jsonl.
"""

import json
import time
import traceback

import numpy as np

LOG = "/tmp/r2_wall.jsonl"
N, NQ, K = 100_000, 2048, 10


def emit(**kw):
    with open(LOG, "a") as f:
        f.write(json.dumps(kw) + "\n")
    print(json.dumps(kw), flush=True)


def t_ms(fn, reps=5):
    fn()  # warm
    t0 = time.perf_counter()
    for _ in range(reps):
        fn()
    return round((time.perf_counter() - t0) / reps * 1e3, 2)


def main():
    import jax
    import jax.numpy as jnp

    from tpu_knn import Index, Params
    from tpu_knn.core.dataset import DataKind
    from tpu_knn.eval.datasets import sift_like, sparse_like

    try:
        # --- primitives ---
        tiny = jnp.zeros(8, jnp.float32) + 1.0
        float(jnp.sum(tiny))
        emit(kind="rt_sync_ms", ms=t_ms(lambda: float(jnp.sum(tiny)), reps=10))
        one_mb = np.random.default_rng(0).standard_normal((2048, 128)).astype(np.float32)
        emit(kind="upload_1x1MB_ms",
             ms=t_ms(lambda: float(jnp.sum(jnp.asarray(one_mb)))))
        def up3():
            a = jnp.asarray(one_mb)
            b = jnp.asarray(one_mb)
            c = jnp.asarray(one_mb)
            float(jnp.sum(a) + jnp.sum(b) + jnp.sum(c))
        emit(kind="upload_3x1MB_ms", ms=t_ms(up3))

        dev = jax.jit(lambda x: (x[:, :10], x[:, :10].astype(jnp.int32)))(
            jnp.asarray(one_mb))
        float(jnp.sum(dev[0]))
        emit(kind="download_2_arrays_ms",
             ms=t_ms(lambda: (np.asarray(dev[0]), np.asarray(dev[1]))))
        packed = jax.jit(
            lambda d, i: jnp.concatenate(
                [d, jax.lax.bitcast_convert_type(i, jnp.float32)], 1)
        )(dev[0], dev[1])
        float(jnp.sum(packed[:, :10]))
        emit(kind="download_packed_ms", ms=t_ms(lambda: np.asarray(packed)))

        # --- dense hnsw decomposition ---
        pts = sift_like(N + NQ, d=128, seed=0)
        corpus, q = pts[:N], pts[N : N + NQ]
        idx = Index("l2", Params(dim=128), method="hnsw")
        idx.add_dense_batch(corpus)
        idx.build_index(Params(M=16, replicateNeighbors=1, nbrStoreDtype="int8"))
        idx.set_query_time_params(Params(efSearch=20, searchExpand=4))
        m = idx.method

        def enc():
            e = m.space.encode_queries(q)
            float(jnp.sum(e["q"]))
            return e

        emit(kind="dense_encode_ms", ms=t_ms(enc))
        qenc = m.space.encode_queries(q)
        float(jnp.sum(qenc["q"]))
        from tpu_knn.methods.hnsw import _hnsw_search

        def search():
            d, ids, nd = _hnsw_search(
                m.space, qenc, m.data, m.graph["level0"], tuple(m._upper),
                jnp.int32(m._entry), 20, K, m._effective_expand(20),
                nbr_store=m._get_nbr_store(),
            )
            float(jnp.sum(d))
            return d, ids

        emit(kind="dense_search_ms", ms=t_ms(search))
        d_dev, i_dev = search()
        emit(kind="dense_download_ms",
             ms=t_ms(lambda: (np.asarray(d_dev), np.asarray(i_dev))))
        emit(kind="dense_full_wall_ms",
             ms=t_ms(lambda: idx.knn_query_batch(q, K), reps=3))

        # --- sparse decomposition (512 queries) ---
        spts = sparse_like(N + 512, vocab=30_000, nnz=64, seed=0)
        sc, sq = spts[:N], spts[N:]
        sidx = Index("cosinesimil_sparse", method="hnsw", data_type=DataKind.SPARSE)
        sidx.add_sparse_batch(sc)
        sidx.build_index(Params(M=16, efConstruction=50, waveSize=1024,
                                sketchQuery=1, exactBase=0, exactPairs=0))
        sidx.method.sketch_query = 0
        sidx.set_query_time_params(Params(efSearch=100))
        sm = sidx.method

        def senc():
            e = sm.space.encode_queries(sq)
            float(jnp.sum(e["qval"]))
            return e

        emit(kind="sparse_encode_ms", ms=t_ms(senc))
        sqenc = sm.space.encode_queries(sq)
        float(jnp.sum(sqenc["qval"]))

        def ssearch():
            d, ids, nd = _hnsw_search(
                sm.space, sqenc, sm.data, sm.graph["level0"], tuple(sm._upper),
                jnp.int32(sm._entry), 100, K, sm._effective_expand(100),
                nbr_store=None,
            )
            float(jnp.sum(d))
            return d, ids

        emit(kind="sparse_search_ms", ms=t_ms(ssearch))
        sd, si = ssearch()
        emit(kind="sparse_download_ms",
             ms=t_ms(lambda: (np.asarray(sd), np.asarray(si))))
        emit(kind="sparse_full_wall_ms",
             ms=t_ms(lambda: sidx.knn_query_batch(sq, K), reps=3))
    except Exception:
        emit(kind="crash", err=traceback.format_exc()[-800:])
        raise


if __name__ == "__main__":
    main()
