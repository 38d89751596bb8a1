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
    _pallas_compiled_check(space, qenc, data)
    return q / dt, 2.0 * q * n * d / dt / 1e9, dt, gold_ids


def _pallas_compiled_check(space, qenc, data, ns=131_072, nq=256):
    """COMPILED-path Pallas correctness on chip (VERDICT r4 item 9: the
    kernel tests run interpret-mode only): compare the fused group-min
    kernel against the pure-XLA formulation of the same pass-1 math on a
    slice of the live bench data, and assert the max delta is at the f32
    reduction-order floor. Logged to the driver capture tail."""
    import jax
    import jax.numpy as jnp

    from tpu_knn.ops import pallas_scan as PS

    if not PS.supported():
        print("# pallas_check skipped: no TPU backend", file=sys.stderr)
        return
    scale, sq, sx = space.pass1_affine()
    qv = qenc["q"][:nq]
    qt = qenc.get("q_term")
    qt = jnp.zeros(nq, jnp.float32) if (qt is None or sq == 0.0) else sq * qt[:nq]
    xt = data.extra["pad"][:ns]
    if getattr(data, "row_term", None) is not None and sx != 0.0:
        xt = xt + sx * data.row_term[:ns]
    x = data.vecs[:ns]
    mins_pl = PS.fused_groupmin(qv, x, qt, xt, scale, tq=nq, precision="float32")
    mins_xla = jax.jit(PS._xla_groupmin, static_argnames=("precision",))(
        qv, x, qt, xt, scale, precision="float32"
    )
    delta = float(jnp.max(jnp.abs(mins_pl - mins_xla)))
    denom = float(jnp.max(jnp.abs(mins_xla))) + 1.0
    row = {"stage": "pallas_compiled_check", "max_abs_delta": delta,
           "rel": delta / denom, "ns": ns, "nq": nq}
    _log_row({**row, "t": time.time()})
    print(f"# pallas_check: max|pallas-xla| {delta:.3e} (rel {delta/denom:.2e}) "
          f"on [{nq}x{ns}] compiled on-chip", file=sys.stderr)
    assert delta <= 5e-3 * denom, f"compiled Pallas kernel drifted: {row}"


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
        idx.knn_query_batch(queries, k)  # compile+warm at the real batch shape
        # best-of-3: single-shot wall numbers over the tunnel carry ±20%
        # session variance (r4: the driver's one-shot ef=11 landed 18.5k
        # against seven warm in-round runs at 24-26.6k) — the best of
        # three back-to-back calls is the defensible device+transfer
        # number, still including one full query upload + result download
        dt = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            _, ids = idx.knn_query_batch(queries, k)
            dt = min(dt, time.perf_counter() - t0)
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
#: Reference hnsw on GloVe-1.2M-synth cosinesimil (BASELINE.md round 2):
#: best qps at recall>=0.95 is ef=20 (8,812 @ 0.9748), build 444.1 s.
REF_GLOVE_QPS = 8_812.0
REF_GLOVE_BUILD_S = 444.1
#: Reference hnsw on the 100k sparse bag-of-words corpus
#: (cosinesimil_sparse_fast, BASELINE.md round 2): best qps at
#: recall>=0.95 is ef=100 (1,260 @ 0.960), build 112.9 s.
REF_SPARSE100K_QPS = 1_260.0
REF_SPARSE100K_BUILD_S = 112.9


def Params1M():
    """The shipped 1M dense operating point (see main() comment)."""
    from tpu_knn import Params

    return Params(M=16, efConstruction=100, waveSize=1024,
                  replicateNeighbors=1, nbrStoreDtype="int8")


def _timed_batch(idx, queries, k, reps=3):
    """Warm at the exact batch shape, then best-of-``reps`` wall time."""
    idx.knn_query_batch(queries, k)
    dt = float("inf")
    ids = None
    for _ in range(reps):
        t0 = time.perf_counter()
        _, ids = idx.knn_query_batch(queries, k)
        dt = min(dt, time.perf_counter() - t0)
    return dt, np.asarray(ids)


def _recall_vs(ids, gold, k):
    return float(np.mean(
        [len(set(a[a >= 0]) & set(b[:k])) / k for a, b in zip(ids, gold)]
    ))


def bench_sparse_100k(nq=512, k=10):
    """BASELINE.json config 5: cosinesimil_sparse HNSW, the exact-wave
    (sketchDim=0) fidelity arm at 100k (BASELINE.md round 4: build 173 s
    @ recall 0.9875/ef=100; reference on the bit-identical corpus:
    build 112.9 s, ef=100 1,260 qps @ 0.960)."""
    from tpu_knn import DataKind, Index, Params
    from tpu_knn.eval.datasets import sparse_like

    n = 100_000
    pts = sparse_like(n + 2048, vocab=30_000, nnz=64, seed=0)
    corpus, queries = pts[:n], pts[n : n + nq]
    ex = Index("cosinesimil_sparse", method="seq_search", data_type=DataKind.SPARSE)
    ex.add_sparse_batch(corpus)
    _, gold = ex.knn_query_batch(queries, k)  # device scan ≡ f64 (±5e-8)
    gold = np.asarray(gold)
    idx = Index("cosinesimil_sparse", method="hnsw", data_type=DataKind.SPARSE)
    idx.add_sparse_batch(corpus)
    t0 = time.perf_counter()
    idx.build_index(Params(M=16, efConstruction=100, waveSize=512, sketchDim=0))
    _sync(idx.method.graph["level0"])
    build_s = time.perf_counter() - t0
    out = {"stage": "sparse_100k", "build_s": round(build_s, 1),
           "vs_ref_build": round(REF_SPARSE100K_BUILD_S / build_s, 2)}
    best = None
    for ef in (50, 100):
        idx.set_query_time_params(Params(efSearch=ef))
        dt, ids = _timed_batch(idx, queries, k)
        rec = _recall_vs(ids, gold, k)
        out[f"ef{ef}"] = {"qps": round(nq / dt, 1), "recall@10": round(rec, 4)}
        if rec >= 0.95 and (best is None or nq / dt > best):
            best = nq / dt
    if best is not None:
        out["vs_ref_qps"] = round(best / REF_SPARSE100K_QPS, 2)
    return out


def bench_u8_sift(n=1_000_000, d=128, nq=2048, k=10):
    """BASELINE.json config 4: l2sqr_sift u8[128] integer distances on
    the int8 MXU path — exact scan (distances exact i32; BASELINE.md
    round 1: 95.9k qps, 24.5 TOP/s)."""
    from tpu_knn import DataKind, Index, Params
    from tpu_knn.eval.datasets import sift_like

    x = sift_like(n + nq, d, seed=0).astype(np.uint8)
    idx = Index("l2sqr_sift", Params(dim=d), "seq_search",
                "dense_uint8_vector", "int")
    idx.add_uint8_batch(x[:n])
    queries = x[n : n + nq]
    dt, ids = _timed_batch(idx, queries, k)
    return {"stage": "u8_sift_exact", "qps": round(nq / dt, 1),
            "tops": round(2.0 * nq * n * d / dt / 1e12, 2),
            "n": n, "exact": True}


def bench_glove(nq=2048, k=10):
    """BASELINE.json config 3: GloVe-1.2M cosinesimil HNSW at the NND
    operating point (BASELINE.md round 3: build 317.7 s warm, 14.6k qps
    @ 0.9815/ef=20 vs reference 444.1 s / 8,812 @ 0.9748)."""
    from tpu_knn import Index, Params
    from tpu_knn.eval.datasets import glove_like

    n, d = 1_200_000, 100
    pts = glove_like(n + nq, d, seed=0)
    corpus, queries = pts[:n], pts[n : n + nq]
    ex = Index("cosinesimil", Params(dim=d), method="seq_search")
    ex.add_dense_batch(corpus)
    _, gold = ex.knn_query_batch(queries, k)
    gold = np.asarray(gold)
    idx = Index("cosinesimil", Params(dim=d), method="hnsw")
    idx.add_dense_batch(corpus)
    t0 = time.perf_counter()
    idx.build_index(Params(M=16, efConstruction=100, buildAlgo="nndescent"))
    _sync(idx.method.graph["level0"])
    build_s = time.perf_counter() - t0
    out = {"stage": "glove_1p2m", "build_s": round(build_s, 1),
           "vs_ref_build": round(REF_GLOVE_BUILD_S / build_s, 2)}
    best = None
    for ef in (14, 20, 50):
        idx.set_query_time_params(Params(efSearch=ef))
        dt, ids = _timed_batch(idx, queries, k)
        rec = _recall_vs(ids, gold, k)
        out[f"ef{ef}"] = {"qps": round(nq / dt, 1), "recall@10": round(rec, 4)}
        if rec >= 0.95 and (best is None or nq / dt > best):
            best = nq / dt
    if best is not None:
        out["vs_ref_qps"] = round(best / REF_GLOVE_QPS, 2)
    return out


def main():
    globals()["_T0"] = time.time()
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
        # breadth tier (VERDICT r4 item 8): land one sparse-100k, one
        # u8-SIFT, and one GloVe-1.2M row in the driver's capture tail
        # so BASELINE.json configs 3-5 are witnessed by the driver's own
        # artifact, not just builder-run jsonls. Each stage is
        # independently fallible and the whole tier respects a soft
        # time budget (the primary JSON line is already printed).
        budget_s = float(os.environ.get("TPU_KNN_BENCH_BUDGET_S", 5400))
        t_start = globals().get("_T0", time.time())
        for fn in (bench_sparse_100k, bench_u8_sift, bench_glove):
            if time.time() - t_start > budget_s:
                print(f"# breadth: budget exhausted before {fn.__name__}",
                      file=sys.stderr)
                break
            try:
                row = fn()
                print(f"# {row['stage']} {json.dumps(row)}", file=sys.stderr)
                _log_row({**row, "t": time.time()})
            except Exception as e:
                print(f"# {fn.__name__} skipped: {e}", file=sys.stderr)


if __name__ == "__main__":
    main()
