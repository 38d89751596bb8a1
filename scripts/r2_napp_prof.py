"""Attribute the sparse NAPP query cost at 1M (81 qps vs the exact
scan's 401 — the index is 5x SLOWER than brute force at scale, while
dense NAPP at 1M runs 676 qps). Candidates: the fused ScanCount pass
([Q, N] counters in chunks), the candidate top-k, or the exact
re-scoring of candidates through the sparse gather path. Profiles one
512-query batch (jax.profiler, device_duration_ps + source lines).

Appends JSON to /tmp/r2_nprof.jsonl.
"""

import glob
import gzip
import json
import os
import time
import traceback
from collections import defaultdict

import numpy as np

LOG = "/tmp/r2_nprof.jsonl"
N, NQ, K, VOCAB = 1_000_000, 512, 10, 60_000
TDIR = "/tmp/jax_trace_napp"


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
    top = sorted(by_op.items(), key=lambda kv: -kv[1])[:16]
    return {
        "total_device_ms": round(total, 2),
        "top_ops": [(k, round(v, 2), srcs.get(k, "")) for k, v in top],
    }


def main():
    import jax
    import jax.numpy as jnp

    from tpu_knn import Index, Params
    from tpu_knn.core.dataset import DataKind
    from tpu_knn.eval.datasets import sparse_like

    pts = sparse_like(N + NQ, vocab=VOCAB, nnz=64, seed=0)
    corpus, q = pts[:N], pts[N : N + NQ]
    try:
        idx = Index("cosinesimil_sparse", method="napp",
                    data_type=DataKind.SPARSE)
        idx.add_sparse_batch(corpus)
        t0 = time.perf_counter()
        idx.build_index(Params(numPivot=512, numPivotIndex=32))
        emit(event="build_ok", build_s=round(time.perf_counter() - t0, 1))
        idx.set_query_time_params(Params(minTimes=2))
        d, i = idx.knn_query_batch(q, K)  # warm/compile
        t0 = time.perf_counter()
        d, i = idx.knn_query_batch(q, K)
        wall = time.perf_counter() - t0
        emit(event="wall", ms=round(wall * 1e3, 1), qps=round(NQ / wall, 1))
        with jax.profiler.trace(TDIR):
            d, i = idx.knn_query_batch(q, K)
            float(jnp.sum(jnp.zeros(8)))  # drain
        prof = parse_trace(TDIR)
        if prof:
            emit(kind="napp_query", **prof)
    except Exception:
        emit(event="crash", err=traceback.format_exc()[-900:])
        raise SystemExit(2)


if __name__ == "__main__":
    main()
