"""Profile the HNSW query traversal on the chip — the two remaining
perf targets after the scan work:

  dense:  100k SIFT-like l2, M=16, int8 neighbor store, ef=20 expand=4
          (the flagship low-ef operating point; VERDICT target is 30k
          device-side qps, beamx measured ~10.5k wall). Attribute the
          per-iteration cost: BASELINE round-1 profiling said fused
          elementwise + loop overhead, sorts 2.8% — re-attribute after
          the round-2 beam changes (postmerge dedup default, expand=4,
          int8 store).
  sparse: 100k cosinesimil_sparse, pure-proxy build (build quality is
          irrelevant for timing), EXACT traversal ef=100 — measured
          162 qps vs the exact scan's 3.5k: name what binds the
          [B, K, nnz] q_dense lookup scoring inside the beam loop.

Usage: python scripts/r2_traversal_prof.py dense|sparse
Appends JSON to /tmp/r2_travprof.jsonl. One stage per process.
"""

import glob
import gzip
import json
import os
import sys
import time
import traceback
from collections import defaultdict

import numpy as np

LOG = "/tmp/r2_travprof.jsonl"
N, NQ, K = 100_000, 2048, 10


def emit(**kw):
    with open(LOG, "a") as f:
        f.write(json.dumps(kw) + "\n")
    print(json.dumps(kw), flush=True)


def parse_trace(tdir):
    paths = sorted(glob.glob(os.path.join(tdir, "plugins/profile/*/*.trace.json.gz")))
    if not paths:
        return None
    with gzip.open(paths[-1], "rt") as f:
        tr = json.load(f)
    by_op = defaultdict(float)
    srcs = {}
    total = 0.0
    for ev in tr.get("traceEvents", []):
        args = ev.get("args") or {}
        dur = args.get("device_duration_ps")
        if dur is None:
            continue
        ms = float(dur) / 1e9
        total += ms
        name = ev.get("name", "?")[:70]
        by_op[name] += ms
        for key in ("source", "tf_op", "long_name", "hlo_category"):
            if key in args and name not in srcs:
                srcs[name] = str(args[key])[:120]
    top = sorted(by_op.items(), key=lambda kv: -kv[1])[:18]
    return {
        "total_device_ms": round(total, 2),
        "top_ops": [(k, round(v, 2), srcs.get(k, "")) for k, v in top],
    }


def timed_batch(idx, q, tag, **emit_kw):
    import jax.numpy as jnp

    # knn_query_batch returns host numpy (already blocked): no extra
    # sync — re-uploading the result biased walls ~80 ms low (r2_wall)
    d, i = idx.knn_query_batch(q, K)
    t0 = time.perf_counter()
    d, i = idx.knn_query_batch(q, K)
    dt = time.perf_counter() - t0
    emit(kind=tag, wall_ms=round(dt * 1e3, 1), qps=round(len(q) / dt, 1),
         **emit_kw)
    return d, i


def trace_batch(idx, q, tdir, tag, **emit_kw):
    import jax
    import jax.numpy as jnp

    os.system(f"rm -rf {tdir}")
    with jax.profiler.trace(tdir):
        d, i = idx.knn_query_batch(q, K)
        float(jnp.sum(jnp.asarray(d)))
    emit(kind=tag, **emit_kw, **(parse_trace(tdir) or {}))


def main():
    stage = sys.argv[1]
    from tpu_knn import Index, Params
    from tpu_knn.core.dataset import DataKind
    from tpu_knn.eval.datasets import sift_like, sparse_like

    try:
        if stage == "dense":
            pts = sift_like(N + NQ, d=128, seed=0)
            corpus, q = pts[:N], pts[N : N + NQ]
            idx = Index("l2", Params(dim=128), method="hnsw")
            idx.add_dense_batch(corpus)
            t0 = time.perf_counter()
            idx.build_index(Params(M=16, replicateNeighbors=1,
                                   nbrStoreDtype="int8"))
            emit(kind="dense_build_ok", s=round(time.perf_counter() - t0, 1))
            for ef in (20, 50):
                idx.set_query_time_params(Params(efSearch=ef, searchExpand=4))
                timed_batch(idx, q, "dense_wall", ef=ef)
            idx.set_query_time_params(Params(efSearch=20, searchExpand=4))
            trace_batch(idx, q, "/tmp/trace_beam_dense", "dense_profile", ef=20)
        else:
            pts = sparse_like(N + NQ, vocab=30_000, nnz=64, seed=0)
            corpus, q = pts[:N], pts[N : N + NQ // 4]  # 512 queries
            idx = Index("cosinesimil_sparse", method="hnsw",
                        data_type=DataKind.SPARSE)
            idx.add_sparse_batch(corpus)
            t0 = time.perf_counter()
            idx.build_index(Params(M=16, efConstruction=50, waveSize=1024,
                                   sketchQuery=1, exactBase=0, exactPairs=0),
                            print_progress=True)
            emit(kind="sparse_build_ok", s=round(time.perf_counter() - t0, 1))
            idx.method.sketch_query = 0  # EXACT traversal
            import jax

            from tpu_knn.ops import sparse as S

            for mode in ("qdense", "support"):
                S.GATHER_SCORING = mode
                jax.clear_caches()
                for ef in (50, 100):
                    idx.set_query_time_params(Params(efSearch=ef))
                    timed_batch(idx, q, "sparse_wall", ef=ef, scoring=mode)
                idx.set_query_time_params(Params(efSearch=100))
                trace_batch(idx, q, f"/tmp/trace_beam_sparse_{mode}",
                            "sparse_profile", ef=100, scoring=mode)
            S.GATHER_SCORING = "qdense"
            # the sketch traversal for contrast (same graph)
            idx.method.sketch_query = 1
            idx.set_query_time_params(Params(efSearch=100))
            timed_batch(idx, q, "sparse_wall_sketch", ef=100)
    except Exception:
        emit(kind="crash", stage=stage, err=traceback.format_exc()[-700:])
        sys.exit(2)


if __name__ == "__main__":
    main()
