"""Multi-chip EFFICIENCY for ShardedHnsw (VERDICT r4 item 5): the r4
parity artifact searched all 8 subgraphs at FULL ef — 8x the beam work
of the single graph. This sweep measures the recall-vs-total-work curve:
for S=8 shards at 100k, does ef = ef_single/S (or /2, /4) hold recall?
Total work proxy = S * ef for the sharded index vs ef for one graph
(beam expansions per query scale linearly in ef; dist_comps recorded as
the exact work measure). CPU mesh (8 virtual devices) — this is a
semantics/efficiency question, not a wall-clock one.

Reference semantic anchor: the exact-scan thread-shard merge
(seqsearch.cc:163-176) is recall-lossless at equal total work; HNSW has
no reference analog (single graph, threads share it) — this extension
needs its own evidence (emitted to bench_results/r5_multichip_eff.jsonl).
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
LOG = os.path.join(REPO, "bench_results", "r5_multichip_eff.jsonl")

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def emit(**kw):
    kw["t"] = round(time.time(), 1)
    with open(LOG, "a") as f:
        f.write(json.dumps(kw) + "\n")
    print(json.dumps(kw), flush=True)


def main():
    from tpu_knn import Index, Params
    from tpu_knn.eval.datasets import sift_like

    n, nq, k = 100_000, 512, 10
    pts = sift_like(n + nq, 128, seed=0)
    x, q = pts[:n], pts[n:]
    emit(stage="start", n=n, nq=nq, devices=len(jax.devices()))

    ex = Index("l2", Params(dim=128), method="seq_search")
    ex.add_dense_batch(x)
    _, gold = ex.knn_query_batch(q, k)
    gold = np.asarray(gold)

    def recall(ids):
        return float(np.mean(
            [len(set(a[a >= 0]) & set(b)) / k for a, b in zip(np.asarray(ids), gold)]))

    bp = Params(M=16, efConstruction=100, waveSize=1024)

    # single-graph baseline curve
    one = Index("l2", Params(dim=128), method="hnsw")
    one.add_dense_batch(x)
    t0 = time.perf_counter()
    one.build_index(bp)
    emit(stage="single_build", wall_s=round(time.perf_counter() - t0, 1))
    for ef in (10, 14, 20, 50, 100):
        one.set_query_time_params(Params(efSearch=ef))
        dc0 = one.method.dist_comps
        _, ids = one.knn_query_batch(q, k)
        emit(stage="single", ef=ef, recall=round(recall(ids), 4),
             total_work=ef, dist_comps_per_q=int(
                 (one.method.dist_comps - dc0) / nq))

    # sharded: each of S=8 subgraphs holds n/8 points; sweep ef DOWN
    sh = Index("l2", Params(dim=128), method="hnsw", mesh=8)
    sh.add_dense_batch(x)
    t0 = time.perf_counter()
    sh.build_index(bp)
    emit(stage="sharded_build", wall_s=round(time.perf_counter() - t0, 1))
    # NB: the search clamps per-shard ef to >= k (merge contract), so
    # the lowest reachable total work at k=10 is 8*10
    for ef in (10, 12, 14, 20, 50):
        try:
            sh.set_query_time_params(Params(efSearch=ef))
            dc0 = sh.method.dist_comps
            _, ids = sh.knn_query_batch(q, k)
            emit(stage="sharded", ef=ef, shards=8,
                 recall=round(recall(ids), 4), total_work=8 * ef,
                 dist_comps_per_q=int((sh.method.dist_comps - dc0) / nq))
        except Exception as e:
            emit(stage="sharded", ef=ef, error=repr(e)[:200])
    emit(stage="done")


if __name__ == "__main__":
    main()
