"""NN-descent construction (ops/nndescent.py, hnsw buildAlgo=nndescent).

The produced index must be a drop-in for the wave-built one: same
layered search, clean graph invariants, recall comparable to the wave
build on clustered data, deterministic under a fixed seed, and a clean
fallback to waves for spaces without a symmetric affine row encode.
"""

import numpy as np
import pytest

from tpu_knn import Index, Params
from tpu_knn.eval.datasets import sift_like

N, NQ, K, DIM = 1024, 128, 10, 32


@pytest.fixture(scope="module")
def data():
    pts = sift_like(N + NQ, DIM, seed=3)
    return pts[:N], pts[N:]


@pytest.fixture(scope="module")
def gold(data):
    corpus, q = data
    ex = Index("l2", Params(dim=DIM), method="seq_search")
    ex.add_dense_batch(corpus)
    ex.build_index(Params())
    _, ids = ex.knn_query_batch(q, K)
    return np.asarray(ids)


def _recall(ids, gold):
    return float(np.mean([
        len(set(a[a >= 0]) & set(b)) / K for a, b in zip(np.asarray(ids), gold)
    ]))


def _build(corpus, space="l2", **kw):
    params = dict(M=8, efConstruction=60, buildAlgo="nndescent",
                  nndChunk=1024, nndIters=5, nndK=24, nndKrev=8)
    params.update(kw)
    idx = Index(space, Params(dim=DIM), method="hnsw")
    idx.add_dense_batch(corpus)
    idx.build_index(Params(**params))
    return idx


def test_l2_recall_and_graph(data, gold):
    corpus, q = data
    idx = _build(corpus)
    chk = idx.method.check_graph()
    assert chk == {"self_links": 0, "dup_links": 0, "oob_links": 0}
    idx.set_query_time_params(Params(efSearch=50))
    _, ids = idx.knn_query_batch(q, K)
    assert _recall(ids, gold) >= 0.9


def test_cosine_build(data):
    corpus, q = data
    ex = Index("cosinesimil", Params(dim=DIM), method="seq_search")
    ex.add_dense_batch(corpus)
    ex.build_index(Params())
    _, g = ex.knn_query_batch(q, K)
    idx = _build(corpus, space="cosinesimil")
    idx.set_query_time_params(Params(efSearch=50))
    _, ids = idx.knn_query_batch(q, K)
    assert _recall(ids, np.asarray(g)) >= 0.9


def test_rev_mode_slots_ab(data, gold):
    # the first-come reverse slot fill stays as an A/B arm
    corpus, q = data
    idx = _build(corpus, nndRevMode="slots")
    idx.set_query_time_params(Params(efSearch=50))
    _, ids = idx.knn_query_batch(q, K)
    assert _recall(ids, gold) >= 0.85


def test_self_findability(data):
    # in-degree starvation check: every corpus point must find itself
    # at low ef (the slot-race reverse fill measurably fails this at
    # scale — BASELINE.md round-2 NN-descent notes)
    corpus, _ = data
    idx = _build(corpus)
    idx.set_query_time_params(Params(efSearch=20))
    _, ids = idx.knn_query_batch(corpus[:256], 1)
    hits = np.mean(np.asarray(ids)[:, 0] == np.arange(256))
    assert hits >= 0.99


def test_deterministic(data):
    corpus, _ = data
    a = _build(corpus, seed=7)
    b = _build(corpus, seed=7)
    assert np.array_equal(np.asarray(a.method.graph["level0"]),
                          np.asarray(b.method.graph["level0"]))
    for ua, ub in zip(a.method._upper, b.method._upper):
        assert np.array_equal(np.asarray(ua), np.asarray(ub))


def test_f32_store_mode(data, gold):
    corpus, q = data
    idx = _build(corpus, nndStoreDtype="float32")
    idx.set_query_time_params(Params(efSearch=50))
    _, ids = idx.knn_query_batch(q, K)
    assert _recall(ids, gold) >= 0.9


def test_polish_store(data, gold):
    # nndPolishStore=1: the polish beam explores on int8 neighbor
    # granules with exact re-score before the merge — recall must match
    # the exact-polish build within beam-exploration noise, and the
    # merged distances must be exact (the selection heuristic consumes
    # them)
    corpus, q = data
    idx = _build(corpus, nndPolishStore=1)
    chk = idx.method.check_graph()
    assert chk == {"self_links": 0, "dup_links": 0, "oob_links": 0}
    idx.set_query_time_params(Params(efSearch=50))
    _, ids = idx.knn_query_batch(q, K)
    assert _recall(ids, gold) >= 0.9
    # self-findability survives the quantized exploration
    idx.set_query_time_params(Params(efSearch=20))
    _, sids = idx.knn_query_batch(corpus[:256], 1)
    assert np.mean(np.asarray(sids)[:, 0] == np.arange(256)) >= 0.99


def test_fallback_to_waves(data):
    # l1 has no affine pass-1 factorization: nndescent must fall back to
    # the wave build and still produce a working index
    corpus, q = data
    idx = Index("l1", Params(dim=DIM), method="hnsw")
    idx.add_dense_batch(corpus)
    idx.build_index(Params(M=8, efConstruction=40, buildAlgo="nndescent",
                           waveSize=512))
    idx.set_query_time_params(Params(efSearch=30))
    d, ids = idx.knn_query_batch(q[:16], K)
    assert np.asarray(ids).shape == (16, K)
    assert np.all(np.asarray(ids)[:, 0] >= 0)


def test_auto_threshold(data):
    # buildAlgo=auto (the default) routes by corpus size: >= threshold
    # builds the NND graph, below it the wave graph — each bit-identical
    # to the explicitly requested algorithm (both are deterministic
    # under the fixed default seed)
    corpus, _ = data
    explicit_nnd = _build(corpus, nndChunk=512)
    explicit_wave = Index("l2", Params(dim=DIM), method="hnsw")
    explicit_wave.add_dense_batch(corpus)
    explicit_wave.build_index(Params(M=8, efConstruction=60, waveSize=512,
                                     buildAlgo="waves"))
    for thresh, ref in ((N, explicit_nnd), (N + 1, explicit_wave)):
        idx = Index("l2", Params(dim=DIM), method="hnsw")
        idx.add_dense_batch(corpus)
        idx.build_index(Params(M=8, efConstruction=60, waveSize=512,
                               nndChunk=512, nndIters=5, nndK=24, nndKrev=8,
                               buildAlgo="auto", buildAlgoAutoN=thresh))
        assert np.array_equal(
            np.asarray(idx.method.graph["level0"]),
            np.asarray(ref.method.graph["level0"]),
        ), f"auto@{thresh} did not match the expected build algorithm"


def test_sift_u8_build():
    rng = np.random.default_rng(0)
    centers = rng.integers(0, 200, size=(16, 128))
    pts = np.clip(
        centers[rng.integers(0, 16, N + NQ)]
        + rng.normal(0, 12, (N + NQ, 128)), 0, 255
    ).astype(np.uint8)
    corpus, q = pts[:N], pts[N:]
    ex = Index("l2sqr_sift", Params(dim=128), "seq_search", "dense_uint8_vector", "int")
    ex.add_uint8_batch(corpus)
    ex.build_index(Params())
    _, g = ex.knn_query_batch(q, K)
    idx = Index("l2sqr_sift", Params(dim=128), "hnsw", "dense_uint8_vector", "int")
    idx.add_uint8_batch(corpus)
    idx.build_index(Params(M=8, efConstruction=60, buildAlgo="nndescent",
                           nndChunk=1024, nndIters=5, nndK=24, nndKrev=8))
    idx.set_query_time_params(Params(efSearch=50))
    _, ids = idx.knn_query_batch(q, K)
    assert _recall(ids, np.asarray(g)) >= 0.9


def test_wide_row_mode_matches_store(data):
    # rows >= 512 B skip the replicated neighborhood store (the store's
    # n*kb*D residency RESOURCE_EXHAUSTED sparse-sketch NND builds) and
    # gather candidate rows directly; results must be bit-identical
    import inspect

    import jax.numpy as jnp

    import tpu_knn.ops.nndescent as ND
    from tpu_knn.core.dataset import DataKind, DataStore
    from tpu_knn.core.registry import create_space

    rng = np.random.default_rng(0)
    n, d = 600, 512  # d * int8 = 512 B -> wide-row path
    x = rng.standard_normal((n, d)).astype(np.float32)
    sp = create_space("l2")
    store = DataStore(DataKind.DENSE)
    store.add_dense_batch(x)
    corpus = sp.corpus_dict(sp.encode_dataset(store))
    kw = dict(k=8, iters=3, krev=8, t_keep=8, chunk=128, seed=3)
    d1, a1 = ND.build_knn_graph(sp, corpus, n, **kw)
    # force the store path by raising the wide threshold out of reach
    src = inspect.getsource(ND.build_knn_graph).replace(">= 512", ">= 10**9")
    ns = dict(ND.__dict__)
    exec(compile(src, "forced_store_mode", "exec"), ns)
    d2, a2 = ns["build_knn_graph"](sp, corpus, n, **kw)
    assert bool(jnp.all(a1 == a2))
    fin = ~(jnp.isinf(d1) & jnp.isinf(d2))
    assert bool(jnp.all(jnp.where(fin, d1 - d2, 0.0) == 0))


def test_reach_from_host_bfs():
    # host frontier BFS (the device scatter-max formulation faulted the
    # TPU worker at 1M x 48): directed reachability, pad rows excluded
    from tpu_knn.ops.nndescent import _reach_from_host

    adj = np.array(
        [
            [1, -1, -1],   # 0 -> 1
            [2, 0, -1],    # 1 -> 2, 0
            [-1, -1, -1],  # 2 (sink)
            [4, -1, -1],   # 3 -> 4 (unreachable from 0)
            [3, -1, -1],   # 4 -> 3
            [-1, -1, -1],  # pad row
        ],
        np.int32,
    )
    r = _reach_from_host(adj, 0)
    assert r.tolist() == [True, True, True, False, False, False]
    r3 = _reach_from_host(adj, 3)
    assert r3.tolist() == [False, False, False, True, True, False]
    assert not _reach_from_host(adj, -1).any()
    assert not _reach_from_host(adj, 99).any()


def test_polish_fused_equals_host_chunked(data):
    # the fused 1M polish program faulted the TPU worker (batch42
    # 1mprof); polish_knn_lists host-chunks above POLISH_FUSE_MAX with
    # one donated-state dispatch per chunk — the two sweeps must be
    # bit-identical (plain and int8-store arms)
    import jax.numpy as jnp

    from tpu_knn.methods.hnsw import _corpus_dict
    from tpu_knn.ops import nndescent as ND

    corpus_pts, _ = data
    idx = _build(corpus_pts, nndPolish=0)
    m = idx.method
    sp = m._graph_space
    corpus = _corpus_dict(sp, m._graph_data)
    lv0 = m.graph["level0"]
    adj_j = lv0
    dist_j = jnp.where(
        adj_j >= 0,
        jnp.arange(adj_j.shape[1], dtype=jnp.float32)[None, :],
        jnp.inf,
    )
    kw = dict(efc=30, expand=2, entry=int(m._entry), chunk=256)
    for use_store in (False, True):
        d1, a1 = ND.polish_knn_lists(
            sp, corpus, lv0, m._upper, dist_j, adj_j, N,
            fuse=True, use_store=use_store, **kw)
        d2, a2 = ND.polish_knn_lists(
            sp, corpus, lv0, m._upper, dist_j, adj_j, N,
            fuse=False, use_store=use_store, **kw)
        assert np.array_equal(np.asarray(a1), np.asarray(a2))
        assert np.array_equal(
            np.asarray(d1), np.asarray(d2), equal_nan=True)
