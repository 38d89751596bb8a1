"""Round-4 sparse measurements (VERDICT r3 items 3, 4, 5 + exactShrink).

Stages (argv[1]):
  shrink    — exactShrink A/B at 100k sparse (proxy defaults vs
              exactShrink=1): does routing the merge/reverse shrink
              through the exact space lift recall, and at what build
              cost? (ADVICE r3; CPU toy: 0.660 -> 0.704.)
  taat      — the posting-block TAAT engine (ops/inverted.py) vs the
              blocked scan at 100k and 1M, nq in {1, 32, 512}: the
              engine owns the small-batch regime (one query touches
              ~85k of 64M postings, r4_taat_stats.py); nq=512 is the
              predicted measured-negative. Correctness vs host-f64
              gold at every point.
  napp1m    — NAPP 1M pivot scaling (numPivot 512->2048): candidate
              counts shrink with more pivots; target >=0.95 recall at
              >800 qps (2x the 431-qps exact-scan wall) — VERDICT
              item 4's sparse-1M ANN number.
  waveprof  — profile the exact sparse wave build (sketchDim=0) at
              50k: device-time attribution of the construction beam
              (VERDICT item 5 asks where the 7ms/node goes).

Durable outputs: bench_results/r4_sparse.jsonl.
"""

import json
import os
import sys
import time
import traceback

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))
LOG = os.path.join(REPO, "bench_results", "r4_sparse.jsonl")
GOLD_DIR = os.environ.get("TPU_KNN_DATA_CACHE", "/tmp/tpu_knn_cache")
K = 10


def emit(**kw):
    os.makedirs(os.path.dirname(LOG), exist_ok=True)
    kw["t"] = round(time.time(), 1)
    with open(LOG, "a") as f:
        f.write(json.dumps(kw) + "\n")
    print(json.dumps(kw), flush=True)


def sync_graph(idx):
    import jax.numpy as jnp

    float(jnp.sum(idx.method.graph["level0"]))


def f64_gold(pts, n, nq, vocab, name):
    from sparse_gold import host_f64_gold

    os.makedirs(GOLD_DIR, exist_ok=True)
    path = os.path.join(GOLD_DIR, name)
    if os.path.exists(path):
        return np.load(path)["ids"]
    t0 = time.perf_counter()
    gold = host_f64_gold(pts[:n], pts[n : n + nq], k=K, vocab=vocab)
    emit(event="gold_built", name=name, wall_s=round(time.perf_counter() - t0, 1))
    np.savez(path, ids=gold)
    return gold


def recall_vs(ids, gold):
    return float(np.mean([
        len(set(a[a >= 0]) & set(b)) / K for a, b in zip(np.asarray(ids), gold)
    ]))


def stage_shrink():
    from tpu_knn import DataKind, Index, Params
    from tpu_knn.eval.datasets import sparse_like

    nq, n = 512, 100_000
    pts = sparse_like(n + nq, vocab=30_000, nnz=64, seed=0)
    gold = f64_gold(pts, n, nq, 30_000, "gold_sparse100000_v30k.npz")
    for tag, bp in (
        ("shrink0", dict(M=16, efConstruction=100, waveSize=1024)),
        ("shrink1", dict(M=16, efConstruction=100, waveSize=1024, exactShrink=1)),
    ):
        t0 = time.perf_counter()
        idx = Index("cosinesimil_sparse", method="hnsw", data_type=DataKind.SPARSE)
        idx.add_sparse_batch(pts[:n])
        idx.build_index(Params(**bp))
        sync_graph(idx)
        bs = round(time.perf_counter() - t0, 1)
        emit(stage="shrink", tag=tag, event="build_ok", build_s=bs)
        for ef in (20, 50, 100):
            idx.set_query_time_params(Params(efSearch=ef))
            idx.knn_query_batch(pts[n:], K)
            t0 = time.perf_counter()
            _, ids = idx.knn_query_batch(pts[n:], K)
            dt = time.perf_counter() - t0
            emit(stage="shrink", tag=tag, ef=ef, qps=round(nq / dt, 1),
                 recall_at_10=round(recall_vs(ids, gold), 4))
        del idx


def stage_taat():
    from tpu_knn import DataKind, Index, Params
    from tpu_knn.eval.datasets import sparse_like
    from tpu_knn.methods import inv_index as II

    sizes = ((100_000, 30_000), (1_000_000, 60_000))
    if len(sys.argv) > 2:  # e.g. "taat 1000000" re-runs just that size
        want = int(sys.argv[2])
        sizes = tuple(s for s in sizes if s[0] == want)
    for n, vocab in sizes:
        pts = sparse_like(n + 2048, vocab=vocab, nnz=64, seed=0)
        # negdotprod ranks by raw dot (not the cosine gold): host-f64
        # gold at 100k; at 1M the check is TAAT-vs-scan id agreement
        # (two independent formulations), the f64 slice being CPU-
        # prohibitive at this scale
        gold = None
        if n <= 100_000:
            from sparse_gold import host_f64_gold

            path = os.path.join(GOLD_DIR, f"gold_negdot_{n}_v{vocab//1000}k.npz")
            if os.path.exists(path):
                gold = np.load(path)["ids"]
            else:
                t0 = time.perf_counter()
                gold = host_f64_gold(pts[:n], pts[n : n + 512], k=K,
                                     vocab=vocab, space="negdot")
                emit(event="gold_built", name=path,
                     wall_s=round(time.perf_counter() - t0, 1))
                np.savez(path, ids=gold)
        scan_ids = {}
        for backend in ("taat", "scan"):
            II.INVINDX_BACKEND = backend
            idx = Index("negdotprod_sparse_fast", method="simple_invindx",
                        data_type=DataKind.SPARSE)
            idx.add_sparse_batch(pts[:n])
            t0 = time.perf_counter()
            idx.build_index()
            emit(stage="taat", n=n, backend=backend, event="build_ok",
                 build_s=round(time.perf_counter() - t0, 1))
            for nq in (1, 32, 512):
                qs = pts[n : n + nq]
                idx.knn_query_batch(qs, K)  # compile + warm this shape
                reps = 20 if nq == 1 else (5 if nq == 32 else 1)
                t0 = time.perf_counter()
                for _ in range(reps):
                    _, ids = idx.knn_query_batch(qs, K)
                dt = (time.perf_counter() - t0) / reps
                row = dict(stage="taat", n=n, backend=backend, nq=nq,
                           qps=round(nq / dt, 2),
                           ms_per_batch=round(dt * 1e3, 1))
                if gold is not None:
                    row["recall_vs_f64"] = round(recall_vs(ids, gold[:nq]), 4)
                if backend == "scan":
                    agree = recall_vs(ids, np.asarray(scan_ids[nq]))
                    row["id_agreement_vs_taat"] = round(agree, 4)
                else:
                    scan_ids[nq] = ids
                emit(**row)
            del idx


def stage_napp1m():
    from tpu_knn import DataKind, Index, Params
    from tpu_knn.eval.datasets import sparse_like

    nq, n, vocab = 512, 1_000_000, 60_000
    pts = sparse_like(n + nq, vocab=vocab, nnz=64, seed=0)
    gold = f64_gold(pts, n, nq, vocab, "gold_sparse1m_v60k.npz")
    for npiv, npfx in ((1024, 32), (2048, 32), (2048, 64)):
        t0 = time.perf_counter()
        idx = Index("cosinesimil_sparse", method="napp", data_type=DataKind.SPARSE)
        idx.add_sparse_batch(pts[:n])
        idx.build_index(Params(numPivot=npiv, numPrefix=npfx))
        emit(stage="napp1m", numPivot=npiv, numPrefix=npfx, event="build_ok",
             build_s=round(time.perf_counter() - t0, 1))
        for nps, mt in ((16, 2), (32, 2), (32, 3), (npfx, 3)):
            if nps > npfx:
                continue
            idx.set_query_time_params(Params(numPrefixSearch=nps, minTimes=mt))
            idx.knn_query_batch(pts[n:], K)
            idx.method.dist_comps = 0
            t0 = time.perf_counter()
            _, ids = idx.knn_query_batch(pts[n:], K)
            dt = time.perf_counter() - t0
            emit(stage="napp1m", numPivot=npiv, numPrefix=npfx,
                 numPrefixSearch=nps, minTimes=mt,
                 qps=round(nq / dt, 1), recall_at_10=round(recall_vs(ids, gold), 4),
                 cand_per_q=int(idx.method.dist_comps / nq))
        del idx


def stage_waveprof():
    from tpu_knn import DataKind, Index, Params
    from tpu_knn.eval.datasets import sparse_like

    n, nq = 50_000, 512
    pts = sparse_like(100_000 + nq, vocab=30_000, nnz=64, seed=0)
    idx = Index("cosinesimil_sparse", method="hnsw", data_type=DataKind.SPARSE)
    idx.add_sparse_batch(pts[:n])
    # window-trace steady-state waves only (the whole-build trace of the
    # first attempt was 94% compile; profile_wave_window drains the
    # queue on both edges so device_duration_ps attributes those waves)
    tdir = "/tmp/r4_waveprof2"
    params = Params(M=16, efConstruction=100, waveSize=512, sketchDim=0)
    m = idx._make_method(params)
    m.profile_wave_window = (40, 49, tdir)  # 10 steady waves, drained edges
    t0 = time.perf_counter()
    m.create_index(idx.store, params)
    import jax.numpy as jnp

    float(jnp.sum(m.graph["level0"]))
    bs = time.perf_counter() - t0
    win = getattr(m, "_prof_wall_s", None)
    row = dict(stage="waveprof", n=n, event="build_ok",
               build_s=round(bs, 1), trace_dir=tdir,
               window_wall_ms_per_wave=round(win / 10 * 1e3, 1) if win else None)
    from r2_build_prof import parse_trace

    prof = parse_trace(tdir)
    if prof:
        prof["per_wave_device_ms"] = round(prof["total_device_ms"] / 10, 1)
        emit(kind="wave_window", **prof)
    emit(**row)


def stage_pairab():
    """Exact sparse wave build with the support-match pair-gram backend
    vs the densify+matmul default (trace-time flag: one backend per
    process; argv[2] = mxu|support). The r4 wave-window trace attributes
    ~31% of build device time to the mxu path's densify scatters."""
    import tpu_knn.ops.sparse as S

    from tpu_knn import DataKind, Index, Params
    from tpu_knn.eval.datasets import sparse_like

    backend = sys.argv[2] if len(sys.argv) > 2 else "support"
    S.PAIR_BACKEND = backend
    n, nq = 50_000, 512
    pts = sparse_like(100_000 + nq, vocab=30_000, nnz=64, seed=0)
    gold = f64_gold(pts[:n] + pts[100_000:], n, nq, 30_000,
                    "gold_sparse50000_v30k.npz")
    idx = Index("cosinesimil_sparse", method="hnsw", data_type=DataKind.SPARSE)
    idx.add_sparse_batch(pts[:n])
    t0 = time.perf_counter()
    idx.build_index(Params(M=16, efConstruction=100, waveSize=512,
                           sketchDim=0))
    sync_graph(idx)
    bs = round(time.perf_counter() - t0, 1)
    emit(stage="pairab", backend=backend, n=n, event="build_ok", build_s=bs)
    for ef in (50, 100):
        idx.set_query_time_params(Params(efSearch=ef))
        idx.knn_query_batch(pts[100_000:], K)
        t0 = time.perf_counter()
        _, ids = idx.knn_query_batch(pts[100_000:], K)
        dt = time.perf_counter() - t0
        emit(stage="pairab", backend=backend, ef=ef, qps=round(nq / dt, 1),
             recall_at_10=round(recall_vs(ids, gold), 4))


def stage_probe100k():
    """100k exact wave build — the direct VERDICT item-5 criterion
    (<= 600 s at recall >= 0.985; r3 mxu baseline: 858.2 s @ 0.9875
    ef=100). argv[2] selects the pair-gram backend (default support)
    so the recall delta vs r3 can be attributed."""
    import tpu_knn.ops.sparse as S

    from tpu_knn import DataKind, Index, Params
    from tpu_knn.eval.datasets import sparse_like

    backend = sys.argv[2] if len(sys.argv) > 2 else "support"
    S.PAIR_BACKEND = backend
    n, nq = 100_000, 512
    pts = sparse_like(n + nq, vocab=30_000, nnz=64, seed=0)
    gold = f64_gold(pts, n, nq, 30_000, "gold_sparse100000_v30k.npz")
    idx = Index("cosinesimil_sparse", method="hnsw", data_type=DataKind.SPARSE)
    idx.add_sparse_batch(pts[:n])
    t0 = time.perf_counter()
    idx.build_index(Params(M=16, efConstruction=100, waveSize=512,
                           sketchDim=0))
    sync_graph(idx)
    emit(stage="probe100k", backend=backend, event="build_ok",
         build_s=round(time.perf_counter() - t0, 1))
    for ef in (50, 100):
        idx.set_query_time_params(Params(efSearch=ef))
        idx.knn_query_batch(pts[n:], K)
        t0 = time.perf_counter()
        _, ids = idx.knn_query_batch(pts[n:], K)
        dt = time.perf_counter() - t0
        emit(stage="probe100k", backend=backend, ef=ef, qps=round(nq / dt, 1),
             recall_at_10=round(recall_vs(ids, gold), 4))


def main():
    stage = sys.argv[1] if len(sys.argv) > 1 else "shrink"
    from tpu_knn.utils.jitcache import enable_persistent_cache

    enable_persistent_cache()
    emit(event="start", stage=stage)
    try:
        {"shrink": stage_shrink, "taat": stage_taat,
         "napp1m": stage_napp1m, "waveprof": stage_waveprof,
         "pairab": stage_pairab, "probe100k": stage_probe100k,
         "rampab": stage_rampab, "exact1m": stage_exact1m}[stage]()
        emit(event="done", stage=stage)
    except Exception as e:
        emit(event="error", stage=stage, error=repr(e),
             tb=traceback.format_exc()[-2000:])
        raise




def stage_rampab():
    """Ramp on/off at 100k exact waves (support grams): is the shared
    -0.010 recall drift vs r3's 0.9875 the ramped schedule's
    construction-order change?"""
    import tpu_knn.methods.hnsw as H

    from tpu_knn import DataKind, Index, Params
    from tpu_knn.eval.datasets import sparse_like

    H.WAVE_RAMP = sys.argv[2] != "off" if len(sys.argv) > 2 else True
    n, nq = 100_000, 512
    pts = sparse_like(n + nq, vocab=30_000, nnz=64, seed=0)
    gold = f64_gold(pts, n, nq, 30_000, "gold_sparse100000_v30k.npz")
    idx = Index("cosinesimil_sparse", method="hnsw", data_type=DataKind.SPARSE)
    idx.add_sparse_batch(pts[:n])
    t0 = time.perf_counter()
    idx.build_index(Params(M=16, efConstruction=100, waveSize=512,
                           sketchDim=0))
    sync_graph(idx)
    emit(stage="rampab", ramp=bool(H.WAVE_RAMP), event="build_ok",
         build_s=round(time.perf_counter() - t0, 1))
    for ef in (50, 100):
        idx.set_query_time_params(Params(efSearch=ef))
        idx.knn_query_batch(pts[n:], K)
        t0 = time.perf_counter()
        _, ids = idx.knn_query_batch(pts[n:], K)
        dt = time.perf_counter() - t0
        emit(stage="rampab", ramp=bool(H.WAVE_RAMP), ef=ef,
             qps=round(nq / dt, 1), recall_at_10=round(recall_vs(ids, gold), 4))



def stage_exact1m():
    """1M exact sparse wave build — the last open sparse-1M question:
    does exact construction (now 5x cheaper via support pair grams, and
    r3-order-identical via the ramp threshold) hold recall at 1M where
    the JL-proxy build collapsed (0.138-0.763) and the REFERENCE's own
    exact graph collapsed too (0.846 @ ef=200)? r3 exactwave fidelity:
    0.9875 @ 100k/ef=100."""
    from tpu_knn import DataKind, Index, Params
    from tpu_knn.eval.datasets import sparse_like

    n, nq, vocab = 1_000_000, 512, 60_000
    pts = sparse_like(n + nq, vocab=vocab, nnz=64, seed=0)
    gold = f64_gold(pts, n, nq, vocab, "gold_sparse1m_v60k.npz")
    idx = Index("cosinesimil_sparse", method="hnsw", data_type=DataKind.SPARSE)
    idx.add_sparse_batch(pts[:n])
    t0 = time.perf_counter()
    idx.build_index(Params(M=16, efConstruction=100, waveSize=1024,
                           sketchDim=0))
    sync_graph(idx)
    emit(stage="exact1m", event="build_ok",
         build_s=round(time.perf_counter() - t0, 1))
    for ef in (50, 100, 200):
        idx.set_query_time_params(Params(efSearch=ef))
        idx.knn_query_batch(pts[n:], K)
        t0 = time.perf_counter()
        _, ids = idx.knn_query_batch(pts[n:], K)
        dt = time.perf_counter() - t0
        emit(stage="exact1m", ef=ef, qps=round(nq / dt, 1),
             recall_at_10=round(recall_vs(ids, gold), 4))

if __name__ == "__main__":
    main()
