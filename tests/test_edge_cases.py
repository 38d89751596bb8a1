"""Edge cases: empty/tiny corpora, k > corpus, duplicate points,
degenerate params — the failure surface the reference guards with CHECK
macros and error codes."""

import numpy as np
import pytest

from tpu_knn import DataKind, Index, Params
from tpu_knn.core.errors import InvalidArgumentError


def test_empty_index_query():
    idx = Index("l2", Params(dim=4), method="seq_search")
    d, ids = idx.knn_query_batch(np.zeros((2, 4), np.float32), 3)
    assert (ids == -1).all() and np.isinf(d).all()


def test_single_point_corpus():
    idx = Index("l2", Params(dim=4), method="hnsw")
    idx.add_dense_batch(np.ones((1, 4), np.float32))
    res = idx.knn_query(np.ones(4, np.float32), 3)
    assert len(res) == 1 and res.ids[0] == 0


def test_k_exceeds_corpus_hnsw():
    idx = Index("l2", Params(dim=4), method="hnsw")
    idx.add_dense_batch(np.eye(4, dtype=np.float32))
    d, ids = idx.knn_query_batch(np.eye(4, dtype=np.float32), 10)
    assert ids.shape == (4, 10)
    assert (ids[:, 0] == np.arange(4)).all()


def test_duplicate_points():
    x = np.ones((20, 4), np.float32)
    idx = Index("l2", Params(dim=4), method="hnsw")
    idx.add_dense_batch(x)
    idx.build_index(Params(M=4, efConstruction=10, waveSize=8))
    res = idx.knn_query(x[0], 5)
    assert res.dists[0] == pytest.approx(0.0, abs=1e-4)
    assert len(set(res.ids)) == len(res.ids)  # no duplicate results


def test_invalid_k():
    idx = Index("l2", Params(dim=4), method="seq_search")
    idx.add_dense_batch(np.zeros((3, 4), np.float32))
    with pytest.raises(InvalidArgumentError):
        idx.knn_query(np.zeros(4, np.float32), 0)


def test_unknown_param_rejected():
    idx = Index("l2", Params(dim=4), method="hnsw")
    idx.add_dense_batch(np.zeros((3, 4), np.float32))
    with pytest.raises(InvalidArgumentError, match="unknown parameters"):
        idx.build_index(Params(M=4, bogusKnob=1))


def test_dim_mismatch_rejected():
    idx = Index("l2", Params(dim=4), method="seq_search")
    with pytest.raises(InvalidArgumentError):
        idx.add_dense_batch(np.zeros((2, 5), np.float32))


def test_unknown_space_and_method():
    with pytest.raises(InvalidArgumentError, match="unknown space"):
        Index("no_such_space", method="hnsw")
    idx = Index("l2", Params(dim=4), method="no_such_method")
    idx.add_dense_batch(np.zeros((2, 4), np.float32))
    with pytest.raises(InvalidArgumentError, match="unknown method"):
        idx.build_index()


def test_query_batch_bucketing():
    """Batch sizes are padded to power-of-two buckets; results must be
    identical to the unbucketed path and correctly sliced."""
    import numpy as np

    from tpu_knn import Index, Params

    rng = np.random.default_rng(0)
    x = rng.standard_normal((300, 8)).astype(np.float32)
    idx = Index("l2", Params(dim=8), method="seq_search")
    idx.add_dense_batch(x)
    for b in (1, 3, 8, 13, 50):
        q = x[:b] + 0.001
        d1, i1 = idx.knn_query_batch(q, 3)
        assert d1.shape == (b, 3) and i1.shape == (b, 3)
        idx.query_batch_bucketing = False
        d2, i2 = idx.knn_query_batch(q, 3)
        idx.query_batch_bucketing = True
        np.testing.assert_array_equal(i1, i2)
        np.testing.assert_array_equal(d1, d2)
