"""Attribute the sparse exact-scan wall cost at 100k (shipped: 652 qps
wall for 512 queries = ~785 ms/batch, while the qdense distance core
measures 49.7 ms on device — r2_sscan_speed.jsonl). Suspects: the
two-pass candidate gather/re-score (CSR row gathers + per-pair
scoring), group top-k, the query densify, host transfers.

Times the production knn() wall, then profiles one batch and dumps
top device ops; also times _knn_device (single-pass merge) vs
_knn_device_twopass directly. Appends JSON to /tmp/r2_sprof.jsonl.
"""

import glob
import gzip
import json
import os
import time
from collections import defaultdict

import numpy as np

LOG = "/tmp/r2_sprof.jsonl"
N, NQ, K = 100_000, 512, 10


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
    total = 0.0
    for ev in tr.get("traceEvents", []):
        args = ev.get("args") or {}
        dur = args.get("device_duration_ps")
        if dur is None:
            continue
        ms = float(dur) / 1e9
        total += ms
        by_op[ev.get("name", "?")[:70]] += ms
    top = sorted(by_op.items(), key=lambda kv: -kv[1])[:16]
    return {"total_device_ms": round(total, 2),
            "top_ops": [(k, round(v, 2)) for k, v in top]}


def main():
    import jax
    import jax.numpy as jnp

    import tpu_knn.methods.seq_search as SS
    from tpu_knn import Index
    from tpu_knn.core.dataset import DataKind
    from tpu_knn.eval.datasets import sparse_like

    def sync(x):
        return float(jnp.sum(x))

    pts = sparse_like(N + NQ, vocab=30_000, nnz=64, seed=0)
    idx = Index("cosinesimil_sparse", method="seq_search",
                data_type=DataKind.SPARSE)
    idx.add_sparse_batch(pts[:N])
    idx.build_index()
    q = pts[N:N + NQ]
    m = idx.method

    # production wall
    d, i = idx.knn_query_batch(q, K)
    sync(jnp.asarray(d))
    t0 = time.perf_counter()
    d, i = idx.knn_query_batch(q, K)
    sync(jnp.asarray(d))
    emit(kind="production_wall", ms=round((time.perf_counter() - t0) * 1e3, 1),
         qps=round(NQ / (time.perf_counter() - t0), 1))

    # device-only: the jitted two-pass program, result left on device
    qenc = m._scan_queries(q)
    dd, ii, _, _ = SS._knn_device_twopass(
        m.space, qenc, m.data, K, m._chunk, m.precision, m.pass1_precision)
    sync(dd)
    t0 = time.perf_counter()
    dd, ii, _, _ = SS._knn_device_twopass(
        m.space, qenc, m.data, K, m._chunk, m.precision, m.pass1_precision)
    sync(dd)
    emit(kind="twopass_device", ms=round((time.perf_counter() - t0) * 1e3, 1))

    # single-pass merge for comparison
    d1, i1, _ = SS._knn_device(m.space, qenc, m.data, K, m._chunk, m.precision)
    sync(d1)
    t0 = time.perf_counter()
    d1, i1, _ = SS._knn_device(m.space, qenc, m.data, K, m._chunk, m.precision)
    sync(d1)
    emit(kind="singlepass_device", ms=round((time.perf_counter() - t0) * 1e3, 1))

    # query-encode cost alone (includes the densify_queries table build)
    t0 = time.perf_counter()
    qe2 = m._scan_queries(q)
    sync(qe2["q_dense"] if "q_dense" in qe2 else next(iter(qe2.values())))
    emit(kind="query_encode", ms=round((time.perf_counter() - t0) * 1e3, 1))

    # profile the two-pass program
    tdir = "/tmp/trace_sparse_scan"
    os.system(f"rm -rf {tdir}")
    with jax.profiler.trace(tdir):
        dd, ii, _, _ = SS._knn_device_twopass(
            m.space, qenc, m.data, K, m._chunk, m.precision, m.pass1_precision)
        sync(dd)
    emit(kind="twopass_profile", **(parse_trace(tdir) or {}))


if __name__ == "__main__":
    main()
