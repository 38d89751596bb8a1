"""Beam-search per-iteration overhead experiment (VERDICT item 5).

One TPU session: build a 100k dense HNSW once, then measure every
(dedup, merge) beam-body combination at ef=20/50 — wall qps over 2048
queries plus a profiler trace per combination at ef=20 so device time
is attributable per op. Appends JSON lines to /tmp/r2_beam.jsonl.
"""

import glob
import gzip
import json
import os
import time
from collections import defaultdict

import numpy as np

LOG = "/tmp/r2_beam.jsonl"
N, D, Q, K = 100_000, 128, 2048, 10


def emit(**kw):
    with open(LOG, "a") as f:
        f.write(json.dumps(kw) + "\n")
    print(json.dumps(kw), flush=True)


def sync(x):
    # knn_query_batch returns HOST numpy (already blocked): re-wrapping
    # it in jnp.asarray re-uploads over the tunnel (~80 ms/batch, wall
    # probe r2_wall.jsonl) and biased every qps row measured through
    # this helper LOW. Only sync genuine device arrays.
    import numpy as np

    if isinstance(x, np.ndarray):
        return float(x.reshape(-1)[:1].sum())
    import jax.numpy as jnp

    return float(jnp.sum(jnp.asarray(x)))


def parse_trace(tdir):
    """Total + top-op device time from the newest vm.trace.json.gz."""
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
        by_op[ev.get("name", "?")[:60]] += ms
    top = sorted(by_op.items(), key=lambda kv: -kv[1])[:12]
    return {"total_device_ms": round(total, 2), "top_ops": [(k, round(v, 2)) for k, v in top]}


def main():
    import jax

    import tpu_knn.ops.graph as G
    from tpu_knn import Index, Params
    from tpu_knn.eval.datasets import sift_like

    pts = sift_like(N + Q, D, seed=0)
    x, q = pts[:N], pts[N : N + Q]

    gold_path = f"/tmp/gold_beam_{N}.npz"
    if os.path.exists(gold_path):
        gold = np.load(gold_path)["ids"]
    else:
        ex = Index("l2", Params(dim=D), method="seq_search")
        ex.add_dense_batch(x)
        _, gold = ex.knn_query_batch(q, K)
        gold = np.asarray(gold)
        np.savez(gold_path, ids=gold)

    idx = Index("l2", Params(dim=D), method="hnsw")
    idx.add_dense_batch(x)
    t0 = time.perf_counter()
    idx.build_index(Params(M=16, efConstruction=200, waveSize=1024))
    sync(idx.method.graph["level0"])
    emit(event="build_ok", build_s=round(time.perf_counter() - t0, 1))

    def run(tag, ef, trace=False):
        idx.set_query_time_params(Params(efSearch=ef))
        d, i = idx.knn_query_batch(q, K)  # compile + warm at the real shape
        sync(d)
        t0 = time.perf_counter()
        d, i = idx.knn_query_batch(q, K)
        sync(d)
        dt = time.perf_counter() - t0
        rec = float(np.mean([len(set(a[a >= 0]) & set(b)) / K for a, b in zip(np.asarray(i), gold)]))
        row = {"tag": tag, "ef": ef, "qps": round(Q / dt, 1), "recall_at_10": round(rec, 4)}
        if trace:
            tdir = f"/tmp/trace_beam_{tag}_{ef}"
            os.system(f"rm -rf {tdir}")
            with jax.profiler.trace(tdir):
                d, i = idx.knn_query_batch(q, K)
                sync(d)
            row["profile"] = parse_trace(tdir)
        emit(**row)

    for dd in ("broadcast", "postmerge"):
        for mm in ("sort", "topk"):
            G.BEAM_DEDUP, G.BEAM_MERGE = dd, mm
            jax.clear_caches()
            tag = f"{dd}-{mm}"
            run(tag, 20, trace=True)
            run(tag, 50)


if __name__ == "__main__":
    main()
