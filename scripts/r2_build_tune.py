"""Re-tune HNSW construction knobs with SYNCED timings.

The round-1 constructionExpand=16 default was chosen off build walls
that timed only async dispatch (the 93-115 s artifact) — the choice is
unvalidated. The build profile (r2_bprof.jsonl) says ~58% of wave
device time is the construction beam, so expand is the lever: sweep
expand x waveSize at 300k, each with a synced build and an ef=20
recall check vs an exact gold (quality must hold while speed moves).

Appends JSON to /tmp/r2_btune.jsonl.
"""

import json
import os
import sys
import time
import traceback

import numpy as np

LOG = "/tmp/r2_btune.jsonl"
N, NQ, K = 300_000, 2048, 10


def emit(**kw):
    with open(LOG, "a") as f:
        f.write(json.dumps(kw) + "\n")
    print(json.dumps(kw), flush=True)


def main():
    import jax.numpy as jnp

    from tpu_knn import Index, Params
    from tpu_knn.eval.datasets import sift_like

    stage = sys.argv[1] if len(sys.argv) > 1 else "300k"
    if stage == "efc1m":
        # efConstruction is the remaining free build-wall lever: the beam
        # carries ef rounded up to 128 lanes (efC<=128 all cost the same
        # per iteration) but ITERATION count tracks ef/expand (max_iters
        # = 2*ceil(ef/expand)+4 plus the frontier<=worst early exit), and
        # the beam is ~58% of wave device time. Sweep efC (and expand=8,
        # the untested midpoint of the resolved 4-vs-16 A/B) at 1M in ONE
        # process with the e4c100 anchor for tunnel-drift normalization;
        # query Pareto at ef 10/14/20/50 judges quality at matched walls.
        n = 1_000_000
        pts = sift_like(n + NQ, 128, seed=0)
        corpus, q = pts[:n], pts[n:]
        gpath = "/tmp/gold_sift1m_l2.npz"
        if not os.path.exists(gpath):
            ex = Index("l2", Params(dim=128), method="seq_search")
            ex.add_dense_batch(corpus)
            ex.build_index()
            _, gi = ex.knn_query_batch(q, K)
            np.savez(gpath, ids=np.asarray(gi))
            del ex
        gold = np.load(gpath)["ids"]
        try:
            for tag, efc, expand in (
                ("e4c100", 100, 4), ("e4c50", 50, 4),
                ("e4c64", 64, 4), ("e8c100", 100, 8),
            ):
                idx = Index("l2", Params(dim=128), method="hnsw")
                idx.add_dense_batch(corpus)
                t0 = time.perf_counter()
                idx.build_index(Params(M=16, efConstruction=efc,
                                       waveSize=1024,
                                       constructionExpand=expand))
                float(jnp.sum(idx.method.graph["level0"]))
                build_s = time.perf_counter() - t0
                sweep = []
                for ef in (10, 14, 20, 50):
                    idx.set_query_time_params(Params(efSearch=ef))
                    d, i = idx.knn_query_batch(q, K)
                    t0 = time.perf_counter()
                    d, i = idx.knn_query_batch(q, K)
                    dt = time.perf_counter() - t0
                    rec = float(np.mean([
                        len(set(a[a >= 0]) & set(b)) / K
                        for a, b in zip(i, gold)
                    ]))
                    sweep.append({"ef": ef, "qps": round(NQ / dt, 1),
                                  "recall": round(rec, 4)})
                emit(stage="efc1m", tag=tag, efc=efc, expand=expand,
                     build_s=round(build_s, 1), sweep=sweep)
                del idx
        except Exception:
            emit(stage="efc1m", event="crash",
                 err=traceback.format_exc()[-900:])
            raise SystemExit(2)
        return
    if stage == "expand1m":
        # the unresolved 300k-vs-1M expand reversal (r2_b1mc 1,994.9 s at
        # expand=4 vs the 774-1,031 s expand=16 era): one PROCESS, same
        # tunnel conditions, both arms + a repeat of the first arm to
        # bound drift. Tagged rows in the same jsonl.
        n = 1_000_000
        pts = sift_like(n + NQ, 128, seed=0)
        corpus, q = pts[:n], pts[n:]
        gpath = "/tmp/gold_sift1m_l2.npz"
        if not os.path.exists(gpath):
            ex = Index("l2", Params(dim=128), method="seq_search")
            ex.add_dense_batch(corpus)
            ex.build_index()
            _, gi = ex.knn_query_batch(q, K)
            np.savez(gpath, ids=np.asarray(gi))
            del ex
        gold = np.load(gpath)["ids"]
        try:
            for tag, expand in (("e16", 16), ("e4", 4), ("e16b", 16)):
                idx = Index("l2", Params(dim=128), method="hnsw")
                idx.add_dense_batch(corpus)
                t0 = time.perf_counter()
                idx.build_index(Params(M=16, efConstruction=100,
                                       waveSize=1024,
                                       constructionExpand=expand))
                float(jnp.sum(idx.method.graph["level0"]))
                build_s = time.perf_counter() - t0
                idx.set_query_time_params(Params(efSearch=20))
                d, i = idx.knn_query_batch(q, K)
                t0 = time.perf_counter()
                d, i = idx.knn_query_batch(q, K)
                dt = time.perf_counter() - t0
                rec = float(np.mean([
                    len(set(a[a >= 0]) & set(b)) / K
                    for a, b in zip(i, gold)
                ]))
                emit(stage="expand1m", tag=tag, expand=expand,
                     build_s=round(build_s, 1), qps_ef20=round(NQ / dt, 1),
                     recall_at_10=round(rec, 4))
                del idx
        except Exception:
            emit(stage="expand1m", event="crash",
                 err=traceback.format_exc()[-900:])
            raise SystemExit(2)
        return

    pts = sift_like(N + NQ, 128, seed=0)
    corpus, q = pts[:N], pts[N : N + NQ]
    try:
        ex = Index("l2", Params(dim=128), method="seq_search")
        ex.add_dense_batch(corpus)
        ex.build_index()
        _, gold = ex.knn_query_batch(q, K)
        gold = np.asarray(gold)
        del ex
        for expand, wave in ((16, 1024), (8, 1024), (4, 1024), (8, 2048)):
            idx = Index("l2", Params(dim=128), method="hnsw")
            idx.add_dense_batch(corpus)
            t0 = time.perf_counter()
            idx.build_index(Params(M=16, efConstruction=100, waveSize=wave,
                                   constructionExpand=expand))
            float(jnp.sum(idx.method.graph["level0"]))
            build_s = time.perf_counter() - t0
            idx.set_query_time_params(Params(efSearch=20))
            d, i = idx.knn_query_batch(q, K)
            t0 = time.perf_counter()
            d, i = idx.knn_query_batch(q, K)
            dt = time.perf_counter() - t0
            rec = float(np.mean([
                len(set(a[a >= 0]) & set(b)) / K for a, b in zip(i, gold)
            ]))
            emit(expand=expand, wave=wave, build_s=round(build_s, 1),
                 qps_ef20=round(NQ / dt, 1), recall_at_10=round(rec, 4))
            del idx
    except Exception:
        emit(event="crash", err=traceback.format_exc()[-900:])
        raise SystemExit(2)


if __name__ == "__main__":
    main()
