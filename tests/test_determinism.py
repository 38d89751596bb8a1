"""Determinism tests.

The reference guards parallel construction with per-node mutexes and
accepts nondeterministic graphs (SURVEY.md §5 race detection). The TPU
build is functionally pure: the same seed must give bit-identical
graphs and results, and batching must not leak between queries.
"""

import numpy as np

from tpu_knn import Index, Params
from tpu_knn.eval.datasets import clustered


def _build(seed_data=7, **kw):
    x = clustered(3000, 24, n_clusters=30, latent_dim=6, seed=seed_data)
    idx = Index("l2", Params(dim=24), method="hnsw")
    idx.add_dense_batch(x)
    idx.build_index(Params(M=6, efConstruction=40, waveSize=128, seed=11, **kw))
    return idx, x


def test_same_seed_identical_graph_and_results():
    a, x = _build()
    b, _ = _build()
    np.testing.assert_array_equal(
        np.asarray(a.method.graph["level0"]), np.asarray(b.method.graph["level0"])
    )
    for ua, ub in zip(a.method._upper, b.method._upper):
        np.testing.assert_array_equal(np.asarray(ua), np.asarray(ub))
    da, ia = a.knn_query_batch(x[:64], 5)
    db, ib = b.knn_query_batch(x[:64], 5)
    np.testing.assert_array_equal(ia, ib)
    np.testing.assert_array_equal(da, db)


def test_query_batch_order_invariance():
    """Each query's result must not depend on its batch position."""
    idx, x = _build()
    q = x[10:42].copy()
    _, fwd = idx.knn_query_batch(q, 5)
    _, rev = idx.knn_query_batch(q[::-1].copy(), 5)
    np.testing.assert_array_equal(fwd, rev[::-1])


def test_exact_scan_repeatable():
    x = clustered(13000, 16, n_clusters=40, latent_dim=6, seed=3)
    idx = Index("l2", Params(dim=16), method="seq_search")
    idx.add_dense_batch(x)
    d1, i1 = idx.knn_query_batch(x[:32], 10)
    d2, i2 = idx.knn_query_batch(x[:32], 10)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_array_equal(d1, d2)
