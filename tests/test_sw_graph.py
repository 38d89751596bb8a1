"""SW-graph: single-layer search quality + incremental add/delete
(reference: small_world_rand.cc AddBatch/DeleteBatch, the only method
with incremental maintenance)."""

import numpy as np
import pytest

from tpu_knn import DataKind, Index, Params


def _data(rng, n=120, d=16):
    return rng.standard_normal((n, d)).astype(np.float32)


def test_sw_graph_search_quality(rng):
    x = _data(rng)
    idx = Index("l2", Params(dim=16), method="sw-graph")
    idx.add_dense_batch(x)
    idx.build_index(Params(NN=8, efConstruction=40, waveSize=32))
    idx.set_query_time_params(Params(efSearch=60))
    d, ids = idx.knn_query_batch(x[:20], 5)
    assert np.all(ids[:, 0] == np.arange(20))  # self as nearest
    # recall vs exact
    ex = Index("l2", Params(dim=16), method="seq_search")
    ex.add_dense_batch(x)
    de, ie = ex.knn_query_batch(x[:20], 5)
    recall = np.mean([len(set(a) & set(b)) / 5 for a, b in zip(ids, ie)])
    assert recall >= 0.9


def test_sw_graph_incremental_add(rng):
    x = _data(rng, 80)
    extra = _data(rng, 40)
    idx = Index("l2", Params(dim=16), method="sw-graph")
    idx.add_dense_batch(x)
    idx.build_index(Params(NN=8, efConstruction=40, waveSize=32))
    idx.set_query_time_params(Params(efSearch=60))
    # incremental insert through the API: add after build keeps the index
    idx.add_dense_batch(extra)
    assert idx.built  # no rebuild needed
    assert idx.data_qty() == 120
    d, ids = idx.knn_query_batch(extra[:10], 3)
    assert np.all(ids[:, 0] == 80 + np.arange(10))  # new points findable
    # norm-identity f32 noise: |q|^2+|x|^2-2qx ~ 1e-6 -> sqrt ~ 1e-3
    assert np.allclose(d[:, 0], 0, atol=5e-3)


@pytest.mark.parametrize("strategy", ["none", "neighbors_only"])
def test_sw_graph_delete(rng, strategy):
    x = _data(rng, 100)
    idx = Index("l2", Params(dim=16), method="sw-graph")
    idx.add_dense_batch(x)
    idx.build_index(Params(NN=8, efConstruction=40, waveSize=32))
    idx.set_query_time_params(Params(efSearch=80))
    doomed = [5, 17, 42]
    idx.delete_batch(doomed, strategy=strategy)
    assert idx.method.data_qty() == 97
    d, ids = idx.knn_query_batch(x, 4)
    assert not np.isin(ids, doomed).any(), "deleted ids must never be returned"
    # surviving points still find themselves
    keep = np.setdiff1d(np.arange(100), doomed)
    assert np.mean(ids[keep, 0] == keep) >= 0.95


def test_sw_graph_delete_then_add(rng):
    x = _data(rng, 60)
    idx = Index("l2", Params(dim=16), method="sw-graph")
    idx.add_dense_batch(x)
    idx.build_index(Params(NN=6, efConstruction=30, waveSize=16))
    idx.delete_batch([0, 1], strategy="neighbors_only")
    idx.add_dense_batch(_data(rng, 20))
    assert idx.method.data_qty() == 78
    d, ids = idx.knn_query_batch(x[2:6], 2)
    assert np.all(ids[:, 0] == np.arange(2, 6))
    assert not np.isin(ids, [0, 1]).any()


def test_sw_graph_persistence_with_deletions(tmp_path, rng):
    """Deleted-state round trip (sw state_arrays carries the mask)."""
    x = _data(rng, 60)
    idx = Index("l2", Params(dim=16), method="sw-graph")
    idx.add_dense_batch(x)
    idx.build_index(Params(NN=6, efConstruction=30, waveSize=16))
    idx.delete_batch([3, 7], strategy="neighbors_only")
    p = str(tmp_path / "sw")
    idx.save(p)
    idx2 = Index.load(p)
    assert idx2.method.data_qty() == 58
    d, ids = idx2.knn_query_batch(x[:20], 4)
    assert not np.isin(ids, [3, 7]).any()
