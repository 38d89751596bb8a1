"""NN-descent routing diagnosis 2 (300k): where do the ~14% go missing?

Diag 1 refuted in-degree starvation (indeg p5=13, zero-frac 0) but
self-hit@ef20 == held-out recall@ef20 == 0.8604 exactly — a routing
failure: some regions are unreachable from the entry at ANY ef. Arms:

  a. normal search, ef=20/100 (baseline; expect ~0.86)
  b. FORCED ENTRY: level-0 beam started at each query's true nearest
     node (gold[0] mapped to internal position). recall ~1.0 => level-0
     local structure is fine, the failure is descent/entry routing;
     recall ~0.86 => level-0 in-neighborhoods themselves are deficient.
  c. level-0-only beam from the global entry (skip upper levels):
     quantifies what the upper levels contribute.
  d. ef=400 normal: the crossing-barrier curve's tail.
  e. rebuild with nndRandom=32 (4x long-link candidates), normal ef=20/100
     + self-hit: do more random survivors fix basin crossing?

Appends JSON to /tmp/r2_nnd.jsonl.
"""

import json
import os
import time
import traceback

import numpy as np

LOG = "/tmp/r2_nnd.jsonl"
NQ, K = 2048, 10


def emit(**kw):
    with open(LOG, "a") as f:
        f.write(json.dumps(kw) + "\n")
    print(json.dumps(kw), flush=True)


def recall_of(ids, gold):
    return round(float(np.mean([
        len(set(a[a >= 0]) & set(b)) / K for a, b in zip(np.asarray(ids), gold)
    ])), 4)


def main():
    import jax
    import jax.numpy as jnp

    from tpu_knn import Index, Params
    from tpu_knn.eval.datasets import sift_like
    from tpu_knn.methods.hnsw import _corpus_dict
    from tpu_knn.ops import graph as G

    pts = sift_like(1_002_048, 128, seed=0)
    corpus_np, q = pts[:300_000], pts[1_000_000:]
    gold = np.load("/tmp/gold_sift300k_l2.npz")["ids"]

    def build(**kw):
        t0 = time.perf_counter()
        idx = Index("l2", Params(dim=128), method="hnsw")
        idx.add_dense_batch(corpus_np)
        p = dict(M=16, efConstruction=100, buildAlgo="nndescent")
        p.update(kw)
        idx.build_index(Params(**p))
        float(jnp.sum(idx.method.graph["level0"]))
        return idx, round(time.perf_counter() - t0, 1)

    try:
        idx, bs = build()
        emit(tag="diag2_base", event="build_ok", build_s=bs)
        m = idx.method
        sp, data = m.space, m.data
        corpus = _corpus_dict(sp, data)
        qenc = sp.encode_queries(q)
        ids_np = np.asarray(data.ids)
        inv = np.full(ids_np.max() + 1, -1, np.int64)
        inv[ids_np[ids_np >= 0]] = np.arange(len(ids_np))[ids_np >= 0]

        # a + d: normal search
        for ef in (20, 100, 400):
            idx.set_query_time_params(Params(efSearch=ef))
            _, i = idx.knn_query_batch(q, K)
            emit(tag="diag2_normal", ef=ef, recall_at_10=recall_of(i, gold))

        from functools import partial

        # arrays are ARGUMENTS, not closure constants (a closed-over
        # corpus is baked into the program: 154 MB of constants +
        # remote-compile 413s — CLAUDE.md)
        @partial(jax.jit, static_argnames=("space", "expand"))
        def beam_from(space, qe, cps, level0, ids_arr, cur, *, expand):
            bd, bi, _ = G.beam_search(space, qe, cps, level0, None, cur,
                                      ef=20, expand=expand)
            pos = bi[:, :K]
            return jnp.where(
                pos >= 0, ids_arr[jnp.clip(pos, 0, ids_arr.shape[0] - 1)], -1
            )

        # b: forced entry at the true NN's internal position
        cur_b = jnp.asarray(inv[gold[:, 0]].astype(np.int32))
        got = beam_from(sp, qenc, corpus, m.graph["level0"], data.ids,
                        cur_b, expand=m.expand)
        emit(tag="diag2_forced_entry", ef=20,
             recall_at_10=recall_of(np.asarray(got), gold))

        # c: level-0-only from the global entry
        cur_c = jnp.full(NQ, m._entry, jnp.int32)
        got = beam_from(sp, qenc, corpus, m.graph["level0"], data.ids,
                        cur_c, expand=m.expand)
        emit(tag="diag2_level0_only", ef=20,
             recall_at_10=recall_of(np.asarray(got), gold))
        del idx

        # e: 4x random long-link candidates
        idx, bs = build(nndRandom=32)
        emit(tag="diag2_rand32", event="build_ok", build_s=bs)
        for ef in (20, 100):
            idx.set_query_time_params(Params(efSearch=ef))
            _, i = idx.knn_query_batch(q, K)
            emit(tag="diag2_rand32", ef=ef, recall_at_10=recall_of(i, gold))
        rng = np.random.default_rng(11)
        self_rows = rng.integers(0, 300_000, NQ)
        idx.set_query_time_params(Params(efSearch=20))
        _, sids = idx.knn_query_batch(corpus_np[self_rows], 1)
        emit(tag="diag2_rand32", event="self_hit",
             self_hit_ef20=round(float(np.mean(
                 np.asarray(sids)[:, 0] == self_rows)), 4))
    except Exception:
        emit(tag="diag2", event="crash", err=traceback.format_exc()[-900:])
        raise SystemExit(2)


if __name__ == "__main__":
    main()
