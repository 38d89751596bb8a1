"""Attribute the 100k sparse-build TPU worker crash (wave-1 sync) to a
phase and a formulation. Dispatch is async, so the crash surfacing at
the first wave sync can live in ANY earlier queued program: the sketch
projection (densify+matmul chunks), the exact query encodings, or the
wave step itself (exactBase qdense scoring / exactPairs pair dots).

One variant per PROCESS (a worker crash poisons the client): the shell
driver runs `python r2_sparse_crash_bisect.py <variant>` per variant.

Variants:
  phases      default flags, sync after every phase (locate the site)
  sk_gather   SKETCH_BACKEND="gather" (scatter-free sketch projection)
  no_pairs    exactPairs=0 (drop pair-dot densify from the wave step)
  proxy_only  exactBase=0 exactPairs=0 (pure proxy build, no exact
              scoring anywhere in the waves)
  dens_c      _densify monkeypatched to the in-bounds val-0 scatter
              (diag4 variant C: exact on device, no OOB drops)

Appends JSON to /tmp/r2_scrash.jsonl.
"""

import json
import sys
import time
import traceback

import numpy as np

LOG = "/tmp/r2_scrash.jsonl"
N, NQ = 100_000, 512


def emit(**kw):
    with open(LOG, "a") as f:
        f.write(json.dumps(kw) + "\n")
    print(json.dumps(kw), flush=True)


def main():
    variant = sys.argv[1]
    import jax
    import jax.numpy as jnp

    import tpu_knn.ops.sparse as S
    from tpu_knn import Index, Params
    from tpu_knn.core.dataset import DataKind
    from tpu_knn.eval.datasets import sparse_like

    def sync(x):
        return float(jnp.sum(x))

    if variant == "sk_gather":
        S.SKETCH_BACKEND = "gather"
    if variant == "dens_c":
        def dens_c(col, val, v_pad):
            r, nnz = col.shape
            rows = jax.lax.broadcasted_iota(jnp.int32, (r, nnz), 0)
            pad = (col < 1) | (col > v_pad)
            cols0 = jnp.where(pad, v_pad, col) - 1
            v = jnp.where(pad, 0.0, val)
            return jnp.zeros((r, v_pad), jnp.float32).at[rows, cols0].add(v)
        S._densify = dens_c

    pts = sparse_like(N + NQ, vocab=30_000, nnz=64, seed=0)
    corpus = pts[:N]

    flags = {}
    if variant == "no_pairs":
        flags["exactPairs"] = 0
    if variant == "proxy_only":
        flags["exactPairs"] = 0
        flags["exactBase"] = 0

    idx = Index("cosinesimil_sparse", method="hnsw", data_type=DataKind.SPARSE)
    idx.add_sparse_batch(corpus)
    params = Params(M=16, efConstruction=100, waveSize=1024,
                    sketchQuery=1, **flags)
    idx._index_params = params

    t0 = time.perf_counter()
    phase = "make_method"
    try:
        m = idx._make_method(params)
        m.progress = True

        phase = "prepare_host"  # encodes + sketch projection are QUEUED here
        n = m._prepare(idx.store)
        emit(variant=variant, phase=phase, ok=True,
             s=round(time.perf_counter() - t0, 1))

        phase = "sync_encode"  # forces the corpus CSR encode
        sync(m.data.val)
        emit(variant=variant, phase=phase, ok=True,
             s=round(time.perf_counter() - t0, 1))

        phase = "sync_sketch"  # forces the JL sketch projection
        if m._proxy is not None:
            sync(m._graph_data.vecs)
        emit(variant=variant, phase=phase, ok=True,
             s=round(time.perf_counter() - t0, 1))

        phase = "sync_exact_qenc"  # forces the exact query encodings
        if m._exact_qenc_all is not None:
            for v in m._exact_qenc_all.values():
                if hasattr(v, "dtype"):
                    sync(v)
        emit(variant=variant, phase=phase, ok=True,
             s=round(time.perf_counter() - t0, 1))

        phase = "waves"  # per-wave progress syncs attribute wave faults
        m._run_waves(0, n)
        sync(m.graph["level0"])
        m._drop_wave_state()
        idx.method, idx.built = m, True
        emit(variant=variant, phase=phase, ok=True,
             s=round(time.perf_counter() - t0, 1))

        # quick quality probe so a surviving variant doubles as data
        phase = "query"
        gold = np.load(f"/tmp/sparse_gold_{N}.npz")["ids"]
        q = pts[N:N + NQ]
        idx.set_query_time_params(Params(efSearch=100))
        d, i = idx.knn_query_batch(q, 10)
        sync(d)
        t1 = time.perf_counter()
        d, i = idx.knn_query_batch(q, 10)
        sync(d)
        rec = float(np.mean([
            len(set(a[a >= 0]) & set(b)) / 10
            for a, b in zip(np.asarray(i), gold)
        ]))
        emit(variant=variant, phase="query", ok=True, ef=100,
             qps=round(NQ / (time.perf_counter() - t1), 1),
             recall_at_10=round(rec, 4))
    except Exception:
        emit(variant=variant, phase=phase, ok=False,
             s=round(time.perf_counter() - t0, 1),
             err=traceback.format_exc()[-600:])
        sys.exit(2)


if __name__ == "__main__":
    main()
