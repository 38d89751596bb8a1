"""Measure the construction-time neighbor store (constructionStore=1).

The level-0 construction beam's candidate row gathers (w*expand*m0cap
rows per iteration, granule-count-bound at ~45M/s) are the build's
single biggest device cost (~58% of wave time is the beam); the store
turns them into w*expand granule reads for ~w*(M+1) granules/wave of
maintenance. Predicted ~80 s off the 593 s 1M wall. Arms run in ONE
process (tunnel-drift normalization), each with a synced build and an
ef 14/20 recall check vs the cached exact gold — quality must hold
within noise of the plain build (selection re-scores exactly; only
beam exploration sees int8).

Usage: r2_cstore.py [300k|1m]   — appends JSON to /tmp/r2_cstore.jsonl.
"""

import json
import os
import sys
import time
import traceback

import numpy as np

LOG = "/tmp/r2_cstore.jsonl"
NQ, K = 2048, 10


def emit(**kw):
    with open(LOG, "a") as f:
        f.write(json.dumps(kw) + "\n")
    print(json.dumps(kw), flush=True)


def main():
    import jax.numpy as jnp

    from tpu_knn import Index, Params
    from tpu_knn.eval.datasets import sift_like

    stage = sys.argv[1] if len(sys.argv) > 1 else "300k"
    n = 1_000_000 if stage == "1m" else 300_000
    gpath = f"/tmp/gold_sift{'1m' if stage == '1m' else '300k'}_l2.npz"
    # queries MUST be pts[1M:] of the 1,002,048 stream — every script
    # sharing the cached gold files slices this way (r2_nnd_build.py);
    # the first 300k run sliced pts[300k:302k] and scored recall 0.0
    # against the 1M-stream gold (qps/build_s columns remain valid).
    pts = sift_like(1_002_048, 128, seed=0)
    corpus, q = pts[:n], pts[1_000_000:]
    try:
        if not os.path.exists(gpath):
            ex = Index("l2", Params(dim=128), method="seq_search")
            ex.add_dense_batch(corpus)
            ex.build_index()
            _, gi = ex.knn_query_batch(q, K)
            np.savez(gpath, ids=np.asarray(gi))
            del ex
        gold = np.load(gpath)["ids"]
        arms = (("cs0", 0), ("cs1", 1), ("cs1b", 1)) if stage != "1m" \
            else (("cs0", 0), ("cs1", 1))
        for tag, cs in arms:
            idx = Index("l2", Params(dim=128), method="hnsw")
            idx.add_dense_batch(corpus)
            t0 = time.perf_counter()
            idx.build_index(Params(M=16, efConstruction=100, waveSize=1024,
                                   constructionExpand=4,
                                   constructionStore=cs))
            float(jnp.sum(idx.method.graph["level0"]))
            build_s = time.perf_counter() - t0
            sweep = []
            for ef in (14, 20):
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
            emit(stage=stage, tag=tag, cstore=cs,
                 build_s=round(build_s, 1), sweep=sweep)
            del idx
    except Exception:
        emit(stage=stage, event="crash", err=traceback.format_exc()[-900:])
        raise SystemExit(2)


if __name__ == "__main__":
    main()
