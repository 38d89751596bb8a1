"""Evaluation harness tests (reference LX layer: gold standard, metrics
with the approx-can't-beat-exact invariant, experiments, meta analysis)."""

import numpy as np
import pytest

from tpu_knn import DataKind, Index, Params
from tpu_knn.core.dataset import DataStore
from tpu_knn.core.registry import create_method, create_space
from tpu_knn.eval import (
    ExperimentConfig,
    Experiments,
    GoldStandard,
    MetaAnalysis,
    per_query_metrics,
    run_full_experiment,
    summarize,
)


def test_metrics_perfect_match():
    ex_d = np.asarray([[0.0, 1.0, 2.0]])
    ex_i = np.asarray([[5, 7, 9]])
    m = per_query_metrics(ex_d, ex_i, ex_d.copy(), ex_i.copy())
    assert m["recall"][0] == 1.0
    assert m["recall@1"][0] == 1.0
    assert m["number_closer"][0] == 0.0
    assert m["precision_of_approx"][0] == pytest.approx(1.0)
    assert m["log_rel_pos_error"][0] == pytest.approx(0.0)


def test_metrics_degraded():
    ex_d = np.asarray([[0.0, 1.0, 2.0]])
    ex_i = np.asarray([[5, 7, 9]])
    ap_d = np.asarray([[1.0, 2.0, 4.0]])  # missed the true NN
    ap_i = np.asarray([[7, 9, 11]])
    m = per_query_metrics(ex_d, ex_i, ap_d, ap_i)
    assert m["recall"][0] == pytest.approx(2 / 3)
    assert m["number_closer"][0] == 1.0
    assert m["log_rel_pos_error"][0] > 0


def test_invariant_violation_raises():
    ex_d = np.asarray([[1.0, 2.0]])
    ex_i = np.asarray([[5, 7]])
    ap_d = np.asarray([[0.5, 2.0]])  # "better than exact" = caller bug
    ap_i = np.asarray([[3, 7]])
    with pytest.raises(AssertionError, match="approximate query should not"):
        per_query_metrics(ex_d, ex_i, ap_d, ap_i)


def test_gold_standard_cache(tmp_path, rng):
    x = rng.standard_normal((50, 8)).astype(np.float32)
    store = DataStore(DataKind.DENSE)
    store.add_dense_batch(x)
    space = create_space("l2", Params(dim=8))
    gs = GoldStandard(space, store)
    d, ids = gs.compute_knn(x[:5], 3)
    assert np.array_equal(ids[:, 0], np.arange(5))
    p = str(tmp_path / "gs.npz")
    gs.save_cache(p)
    d2, i2 = GoldStandard.load_cache(p)
    assert np.array_equal(ids, i2) and np.allclose(d, d2)


def test_experiments_sweep(rng):
    x = rng.standard_normal((150, 10)).astype(np.float32)
    store = DataStore(DataKind.DENSE)
    store.add_dense_batch(x)
    space = create_space("l2", Params(dim=10))
    method = create_method("hnsw", space, Params(M=8, efConstruction=40, waveSize=32))
    method.create_index(store)
    ex = Experiments(space, store, x[:20], k=5)
    rows = ex.run(method, [Params(efSearch=5), Params(efSearch=80)])
    assert len(rows) == 2
    assert rows[1]["recall"] >= rows[0]["recall"]  # more ef -> better recall
    for r in rows:
        assert r["qps"] > 0 and r["improv_dist_comp"] > 0


def test_run_full_experiment(rng):
    x = rng.standard_normal((120, 8)).astype(np.float32)
    store = DataStore(DataKind.DENSE)
    store.add_dense_batch(x)
    space = create_space("l2", Params(dim=8))
    cfg = ExperimentConfig(test_set_qty=2, query_qty=15, seed=3)
    aggs = run_full_experiment(
        space,
        store,
        lambda sp: create_method("seq_search", sp, Params()),
        cfg,
        [None],
        k=3,
    )
    assert len(aggs) == 1
    agg = aggs[0]
    assert agg["recall"]["mean"] == pytest.approx(1.0)  # exact scan
    assert "ci95" in agg["recall"]


def test_range_sweep(rng):
    """run_range computes the full metric set against the range gold
    standard (reference experiments.h runs range sweeps like kNN ones)."""
    x = rng.standard_normal((200, 8)).astype(np.float32)
    store = DataStore(DataKind.DENSE)
    store.add_dense_batch(x)
    space = create_space("l2", Params(dim=8))
    ex = Experiments(space, store, x[:16])
    # exact scan: perfect quality
    method = create_method("seq_search", space, Params())
    method.create_index(store)
    rows = ex.run_range(method, 3.5, [None])
    assert rows[0]["recall"] == pytest.approx(1.0)
    assert rows[0]["log_rel_pos_error"] == pytest.approx(0.0)
    assert rows[0]["mean_result_size"] > 0 and rows[0]["qps"] > 0
    assert rows[0]["radius"] == pytest.approx(3.5)
    # pruned vptree: quality improves with laxer pruning
    vpt = create_method("vptree", space, Params(bucketSize=16))
    vpt.create_index(store)
    vrows = vpt_rows = ex.run_range(
        vpt, 3.5, [Params(alphaLeft=4.0, alphaRight=4.0), None]
    )
    assert vrows[1]["recall"] >= vrows[0]["recall"] - 1e-9
    assert vrows[1]["recall"] == pytest.approx(1.0)  # exact pruning rule


def test_run_full_experiment_with_ranges(rng):
    x = rng.standard_normal((120, 8)).astype(np.float32)
    store = DataStore(DataKind.DENSE)
    store.add_dense_batch(x)
    space = create_space("l2", Params(dim=8))
    cfg = ExperimentConfig(test_set_qty=2, query_qty=10, seed=3)
    knn_aggs, range_aggs = run_full_experiment(
        space,
        store,
        lambda sp: create_method("seq_search", sp, Params()),
        cfg,
        [None],
        k=3,
        range_radii=(3.0,),
    )
    assert knn_aggs[0]["recall"]["mean"] == pytest.approx(1.0)
    assert range_aggs[3.0][0]["recall"]["mean"] == pytest.approx(1.0)
    assert "ci95" in range_aggs[3.0][0]["qps"]


def test_meta_analysis():
    m = MetaAnalysis()
    m.add({"recall": 0.9, "qps": 100.0})
    m.add({"recall": 0.8, "qps": 200.0})
    agg = m.aggregate()
    assert agg["recall"]["mean"] == pytest.approx(0.85)
    assert agg["qps"]["std"] > 0


def test_intrinsic_dimensionality(rng):
    from tpu_knn.eval import compute_intrinsic_dimensionality, format_table

    x = rng.standard_normal((300, 16)).astype(np.float32)
    store = DataStore(DataKind.DENSE)
    store.add_dense_batch(x)
    space = create_space("l2", Params(dim=16))
    r = compute_intrinsic_dimensionality(space, store, sample_qty=4000)
    # gaussian L2 distances concentrate: IntrDim grows with dim, O(d)
    assert 2.0 < r["intrinsic_dim"] < 60.0
    assert r["dist_mean"] > 0 and r["dist_sigma"] > 0
    tbl = format_table([{"recall": 0.95, "qps": 1234.5}, {"recall": 0.9, "qps": 2000.0}])
    assert "recall" in tbl and "1234" in tbl


def test_class_accuracy_in_experiments(rng):
    # two well-separated gaussian classes: majority label must match
    a = rng.standard_normal((60, 6)).astype(np.float32)
    b = rng.standard_normal((60, 6)).astype(np.float32) + 12.0
    x = np.concatenate([a, b])
    labels = [0] * 60 + [1] * 60
    store = DataStore(DataKind.DENSE)
    store.add_dense_batch(x, labels=labels)
    space = create_space("l2", Params(dim=6))
    method = create_method("seq_search", space, Params())
    method.create_index(store)
    from tpu_knn.eval import Experiments

    ex = Experiments(space, store, x[:20], k=5)
    rows = ex.run(method, [None])
    assert rows[0]["class_accuracy"] == pytest.approx(1.0)


def test_sparse_like_generator():
    """Clustered bag-of-words generator honors the sparse id contract
    (1-based strictly increasing) and produces clustered structure."""
    import numpy as np

    from tpu_knn.eval.datasets import sparse_like

    pts = sparse_like(500, vocab=2000, nnz=24, seed=2)
    assert len(pts) == 500
    for ids, vals in pts:
        assert ids.min() >= 1
        assert np.all(np.diff(ids) > 0)
        assert np.all(vals > 0) and len(ids) == len(vals)
