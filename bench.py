"""Benchmark driver: prints ONE JSON line.

Primary metric: exact-kNN throughput on a SIFT-1M-style workload
(1M x 128-d corpus, k=10, clustered synthetic data with realistic
intrinsic dimensionality ~14 — eval/datasets.py) on one chip —
BASELINE.md config 2 ("seq_search brute-force exact kNN ... GFLOP/s").
The baseline denominator is the REFERENCE's own seq_search scan on the
bit-identical dataset, compiled from source and measured on this
machine's CPU core (scripts/ref_baseline; 13.3 qps — BASELINE.md
"Measured (reference)"). An in-process CPU BLAS scan (an upper bound
on the reference's per-pair SIMD scan) is also measured and reported
on stderr as a cross-check.

Flagship stage (full mode): SIFT-1M HNSW at the measured-best shipped
operating point (buildAlgo=auto -> NN-descent at 1M, efConstruction=100,
int8 replicated neighbor store — BASELINE.md round-2/3 sweeps) — build
wall-clock plus a recall-vs-QPS ef sweep, and the
best qps at recall@10 >= 0.95 goes INTO the JSON line
(hnsw1m_qps_at_recall95 / hnsw1m_build_s), matching BASELINE.json's
north-star metric. Reference anchors: 17.9k qps @ 0.970 (ef=20) and
231 s build, one core (BASELINE.md "Measured (reference)").

All rows are also appended to bench_results/bench_runs.jsonl (repo-local
— survives VM restarts, unlike /tmp).

Run: python bench.py            (real TPU chip)
     python bench.py --quick    (100k shapes, smoke test)
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

_RESULTS = os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench_results")


def _log_row(row: dict) -> None:
    try:
        os.makedirs(_RESULTS, exist_ok=True)
        with open(os.path.join(_RESULTS, "bench_runs.jsonl"), "a") as f:
            f.write(json.dumps(row) + "\n")
    except OSError:
        pass


def _sync(x):
    # block_until_ready is unreliable over the axon tunnel; a host read of
    # a scalar is the dependable sync.
    import jax.numpy as jnp

    return float(jnp.sum(x[0]) if isinstance(x, tuple) else jnp.sum(x))


def _dataset(n, d, q, seed=0):
    from tpu_knn.eval.datasets import sift_like

    x = sift_like(n + q, d, seed=seed)
    return x[:n], x[n : n + q]


def bench_exact_knn(n=1_000_000, d=128, q=2048, k=10, chunk=16384, iters=5):
    from tpu_knn.core.dataset import DataKind, DataStore
    from tpu_knn.core.params import Params
    from tpu_knn.core.registry import create_space
    from tpu_knn.methods.seq_search import _knn_device_twopass as _knn_device

    x, queries = _dataset(n, d, q)
    space = create_space("l2", Params(dim=d))
    store = DataStore(DataKind.DENSE)
    store.add_dense_batch(x)
    data = space.encode_dataset(store, row_multiple=chunk)
    qenc = space.encode_queries(queries)

    # pass-1 at f32 (fastest measured end-to-end; the certified reduced-
    # precision tiers are opt-in — see methods/seq_search.py)
    out = _knn_device(space, qenc, data, k, chunk, "float32", "float32")  # compile
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = _knn_device(space, qenc, data, k, chunk, "float32", "float32")
    _sync(out)
    dt = (time.perf_counter() - t0) / iters
    gold_ids = np.asarray(out[1])[:, :k]  # exact scan ids double as gold
    return q / dt, 2.0 * q * n * d / dt / 1e9, dt, gold_ids


def bench_cpu_baseline(n=100_000, d=128, q=256, k=10):
    """CPU BLAS equivalent of the reference's seq_search scan."""
    x, queries = _dataset(n, d, q, seed=1)
    xs = (x * x).sum(1)
    t0 = time.perf_counter()
    g = queries @ x.T
    dd = (queries * queries).sum(1)[:, None] + xs[None, :] - 2 * g
    idx = np.argpartition(dd, k, axis=1)[:, :k]
    _ = np.take_along_axis(dd, idx, axis=1)
    dt = time.perf_counter() - t0
    return q / dt


def bench_hnsw(n=100_000, d=128, q=2048, k=10, efs=(10, 14, 20, 50, 100, 200),
               gold_ids=None, build_params=None):
    # ef=10/14 points: the reference's pointer-chasing search is
    # strongest at low ef (17.9k qps @ recall 0.970 on SIFT-1M, one
    # core) — the Pareto comparison at MATCHED recall needs points
    # below our ef=20 (which already sits at ~0.99 recall).
    """HNSW build wall-clock + recall-vs-QPS sweep at shipped defaults."""
    from tpu_knn import Index, Params

    x, queries = _dataset(n, d, q)
    if gold_ids is None:
        ex = Index("l2", Params(dim=d), method="seq_search")
        ex.add_dense_batch(x)
        _, gold_ids = ex.knn_query_batch(queries, k)

    idx = Index("l2", Params(dim=d), method="hnsw")
    idx.add_dense_batch(x)
    t0 = time.perf_counter()
    # buildAlgo=auto routes >=auto-threshold corpora to NN-descent;
    # waves below. constructionStore / polish-store defaults. The 1M
    # caller passes the measured-best operating point (Params1M); the
    # in-round warm runs populate the persistent executable cache so the
    # driver's round-end run compiles nothing (a cold 1M NND-polish
    # compile over the tunnel is 5-12 min).
    idx.build_index(build_params or Params(M=16, efConstruction=200, waveSize=1024))
    build_s = time.perf_counter() - t0
    rows = []
    for ef in efs:
        idx.set_query_time_params(Params(efSearch=ef))
        idx.knn_query_batch(queries, k)  # compile at the real batch shape
        t0 = time.perf_counter()
        _, ids = idx.knn_query_batch(queries, k)
        dt = time.perf_counter() - t0
        rec = float(
            np.mean([len(set(a[a >= 0]) & set(b)) / k for a, b in zip(ids, gold_ids)])
        )
        rows.append({"efSearch": ef, "qps": round(q / dt, 1), "recall@10": round(rec, 4)})
    return build_s, rows


#: Reference seq_search on SIFT-1M-synth, one CPU core of this machine,
#: g++ -O3 -march=native build of /root/reference driven through its own
#: C++ API (scripts/ref_baseline/bench_ref.cpp; BASELINE.md round 2).
REF_EXACT_QPS = 13.3
#: Reference hnsw on SIFT-1M-synth, same build: best qps at recall>=0.95
#: (ef=20: 17.9k qps @ 0.970), build wall 231 s (BASELINE.md round 2).
REF_HNSW1M_QPS = 17_900.0
REF_HNSW1M_BUILD_S = 231.0


def Params1M():
    """The shipped 1M dense operating point (see main() comment)."""
    from tpu_knn import Params

    return Params(M=16, efConstruction=100, waveSize=1024,
                  replicateNeighbors=1, nbrStoreDtype="int8")


def main():
    # honor $JAX_PLATFORMS through jax.config: this image's site hook
    # makes the env var alone unreliable (see tpu_knn/cli.py _pin_platform)
    plat = os.environ.get("JAX_PLATFORMS", "")
    if plat:
        import jax

        try:
            jax.config.update("jax_platforms", plat.split(",")[0])
        except Exception:
            pass
    from tpu_knn.utils.jitcache import enable_persistent_cache

    enable_persistent_cache()  # repo-local persistent executable cache
    # (survives VM restarts; TPU_KNN_JIT_CACHE=0 disables)
    quick = "--quick" in sys.argv
    n = 100_000 if quick else 1_000_000
    cpu_qps = bench_cpu_baseline()
    qps, gflops, dt, gold_ids = bench_exact_knn(n=n)
    # --quick runs a 10x smaller corpus; scale the reference denominator
    # (its scan time is linear in n) so vs_baseline stays comparable
    ref_qps = REF_EXACT_QPS * (1_000_000 / n)
    result = {
        "metric": "exact_knn_qps_sift1m_synth_k10",
        "value": round(qps, 1),
        "unit": f"queries/s/chip ({n // 1000}k x 128d f32 exact scan; vs_baseline = vs measured reference scan/core)",
        "vs_baseline": round(qps / ref_qps, 2),
    }
    # durably record the primary metric BEFORE the flagship stage: a
    # tunnel wedge during the 1M HNSW build must not lose the exact-scan
    # number (ADVICE r3)
    _log_row({"stage": "exact_scan", **result, "t": time.time()})
    print(
        f"# exact: {gflops:.0f} GFLOP/s sustained, {dt*1e3:.1f} ms per 2048-query sweep, "
        f"cpu-blas baseline {cpu_qps:.0f} qps",
        file=sys.stderr,
    )
    try:
        # flagship: SIFT-1M HNSW at the measured-best shipped operating
        # point (BASELINE.md "1M NND construction at reference parity" +
        # "1M int8 neighbor store"): efConstruction=100 — the operating
        # point of every measured BASELINE row including the reference's
        # own 231 s/17.9k-qps baseline — with the int8 replicated
        # neighbor store (4.43 GB, pays from ef>=14: 23.5-25.9k qps @
        # 0.968-0.980 measured vs 16.1k store-off). buildAlgo=auto
        # routes 1M to NN-descent. --quick keeps the 100k efC=200
        # defaults for cross-round comparability.
        # ef=11..13: the NND+int8-store graph's recall cliff sits between
        # ef=10 (0.933) and ef=14 (0.980) at 1M — the best qps point at
        # recall>=0.95 lives inside that gap (r4_warm2: ef=14 20.0k @
        # 0.9803 while ef=10 runs 23.7k)
        efs = (10, 11, 12, 13, 14, 20, 50) if not quick else (10, 14, 20, 50, 100, 200)
        bp = None if quick else Params1M()
        build_s, rows = bench_hnsw(n=n, efs=efs, gold_ids=gold_ids, build_params=bp)
        tag = f"hnsw({n // 1000}k, shipped defaults M=16)"
        print(f"# {tag}: build {build_s:.1f}s", file=sys.stderr)
        for r in rows:
            print(f"# hnsw {r}", file=sys.stderr)
        ok = [r for r in rows if r["recall@10"] >= 0.95]
        if ok and not quick:
            best = max(ok, key=lambda r: r["qps"])
            result["hnsw1m_build_s"] = round(build_s, 1)
            result["hnsw1m_qps_at_recall95"] = best["qps"]
            result["hnsw1m_recall"] = best["recall@10"]
            result["hnsw1m_ef"] = best["efSearch"]
            result["hnsw1m_vs_ref_qps"] = round(best["qps"] / REF_HNSW1M_QPS, 2)
            result["hnsw1m_vs_ref_build"] = round(REF_HNSW1M_BUILD_S / build_s, 2)
        _log_row({"stage": f"hnsw_{n//1000}k", "build_s": round(build_s, 2),
                  "rows": rows, "t": time.time()})
    except Exception as e:  # secondary metrics must not kill the primary
        print(f"# hnsw bench skipped: {e}", file=sys.stderr)
    print(json.dumps(result))
    _log_row({"stage": "final", **result, "t": time.time()})
    if not quick:
        try:
            # range smoke (reference seqsearch.cc:109-141): streamed exact
            # range at the ~19-hit radius, 512-query batch (the shape the
            # r3_range run warmed; counts validated vs f64 there)
            from tpu_knn import Index, Params

            x, queries = _dataset(n, 128, 512)
            ex = Index("l2", Params(dim=128), method="seq_search")
            ex.add_dense_batch(x)
            dd, _ = ex.knn_query_batch(queries, 10)
            radius = float(np.median(np.asarray(dd)[:, 9]))
            res = ex.range_query_batch(queries, radius)  # compile+warm
            t0 = time.perf_counter()
            res = ex.range_query_batch(queries, radius)
            dt = time.perf_counter() - t0
            mh = float(np.mean([len(r.ids) for r in res]))
            print(f"# range(1M, r={radius:.1f}): {512/dt:.0f} qps, "
                  f"mean_hits {mh:.1f}", file=sys.stderr)
            _log_row({"stage": "range_1m", "radius": radius,
                      "qps": round(512 / dt, 1), "mean_hits": round(mh, 1),
                      "t": time.time()})
        except Exception as e:
            print(f"# range bench skipped: {e}", file=sys.stderr)


if __name__ == "__main__":
    main()
