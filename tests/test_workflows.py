"""The 9 end-to-end workflow acceptance tests, ported from the
reference's only executable test suite (lib.zig:1273-1558). Same
scenarios, same assertions, adapted to the Python API surface."""

import math

import numpy as np
import pytest

from tpu_knn import DataKind, DistKind, Index, Params
from tpu_knn.core.errors import InvalidArgumentError, SpaceIncompatibleError


def test_1_dense_vector_workflow(tmp_path):
    """lib.zig:1273 'Index dense vector workflow'."""
    idx = Index("l2", Params(dim=4), method="hnsw")
    vecs = np.asarray(
        [[0.0, 0.0, 0.0, 0.0], [1.0, 1.0, 0.0, 0.0], [5.0, 5.0, 5.0, 5.0]],
        np.float32,
    )
    idx.add_dense_batch(vecs, ids=[10, 20, 30])
    idx.build_index()
    res = idx.knn_query(vecs[0], 2)
    assert len(res) == 2
    assert res.ids[0] == 10 and res.dists[0] == pytest.approx(0.0, abs=1e-5)
    assert res.ids[1] == 20
    # getDistance ~ sqrt(2) between points 0 and 1
    assert idx.get_distance(0, 1) == pytest.approx(math.sqrt(2), rel=1e-4)
    # data-point round trip
    assert np.allclose(idx.get_data_point(1), vecs[1])
    # save -> reset -> load -> data intact
    p = str(tmp_path / "dense_idx")
    idx.save(p)
    idx.reset()
    assert idx.data_qty() == 0
    idx2 = Index.load(p)
    assert idx2.data_qty() == 3
    assert np.allclose(idx2.get_data_point(2), vecs[2])
    r2 = idx2.knn_query(vecs[0], 2)
    assert r2.ids[0] == 10


def test_2_sparse_vector_workflow():
    """lib.zig:1315 'Index sparse vector workflow'."""
    idx = Index("cosinesimil_sparse", method="hnsw", data_type=DataKind.SPARSE)
    pts = [
        (np.asarray([1, 3, 5]), np.asarray([1.0, 2.0, 3.0], np.float32)),
        (np.asarray([2, 3]), np.asarray([4.0, 5.0], np.float32)),
    ]
    idx.add_sparse_batch(pts)
    res = idx.knn_query(pts[0], 2)  # auto-build on first query
    assert res.ids[0] == 1  # default sparse ids are 1-based (lib.zig:748)
    assert res.dists[0] == pytest.approx(0.0, abs=1e-5)
    sp = idx.borrow_data_sparse(1)
    assert np.array_equal(sp.ids, pts[1][0]) and np.allclose(sp.values, pts[1][1])


def test_3_uint8_vector_workflow():
    """lib.zig:1350 'Index uint8 vector workflow' (l2sqr_sift + Int)."""
    rng = np.random.default_rng(7)
    descs = rng.integers(0, 256, size=(2, 128)).astype(np.uint8)
    idx = Index(
        "l2sqr_sift",
        method="hnsw",
        data_type=DataKind.UINT8,
        dist_type=DistKind.INT,
    )
    idx.add_uint8_batch(descs)
    res = idx.knn_query(descs[0], 2)
    assert len(res) == 2
    assert res.ids[0] == 0 and res.dists[0] == 0  # exact integer distance
    want = int(np.sum((descs[0].astype(np.int64) - descs[1].astype(np.int64)) ** 2))
    assert int(res.dists[1]) == want


def test_4_string_workflow():
    """lib.zig:1381 'Index string data workflow' (leven + Int)."""
    idx = Index("leven", method="hnsw", data_type=DataKind.STRING, dist_type=DistKind.INT)
    idx.add_string_batch(["hello", "help", "world"])
    res = idx.knn_query("hello", 2)
    assert res.ids[0] == 0 and res.dists[0] == 0
    assert res.ids[1] == 1 and res.dists[1] == 2  # hello -> help
    assert idx.borrow_data_point_string(2) == "world"


def test_5_get_distance_matches_manual():
    """lib.zig:1400 'getDistance (L2) matches manual computation'."""
    idx = Index("l2", Params(dim=3), method="seq_search")
    a, b = [1.0, 2.0, 3.0], [4.0, 6.0, 3.0]
    idx.add_dense_batch(np.asarray([a, b], np.float32))
    manual = math.sqrt(sum((x - y) ** 2 for x, y in zip(a, b)))
    assert idx.get_distance(0, 1) == pytest.approx(manual, rel=1e-5)


def test_6_range_query_hnsw_incompatible():
    """lib.zig:1427 'rangeQuery ...': HNSW raises SpaceIncompatible;
    methods that support it return only neighbors inside the radius."""
    x = np.asarray([[0.0, 0.0], [1.0, 0.0], [5.0, 5.0]], np.float32)
    idx = Index("l2", Params(dim=2), method="hnsw")
    idx.add_dense_batch(x)
    with pytest.raises(SpaceIncompatibleError):
        idx.range_query(x[0], 2.0)
    ok = Index("l2", Params(dim=2), method="seq_search")
    ok.add_dense_batch(x)
    res = ok.range_query(x[0], 2.0)
    assert set(res.ids) == {0, 1}
    assert (res.dists <= 2.0).all()


def test_7_borrow_dense_view_equals_original():
    """lib.zig:1472 'borrowDataDense returns a view equal to original'."""
    v = np.asarray([[3.0, 1.0, 4.0, 1.0, 5.0]], np.float32)
    idx = Index("l2", Params(dim=5), method="seq_search")
    idx.add_dense_batch(v)
    assert np.array_equal(idx.borrow_data_dense(0), v[0])


def test_8_get_data_point_invalid_position():
    """lib.zig:1499 'getDataPoint with invalid position returns
    InvalidArgument'."""
    idx = Index("l2", Params(dim=2), method="seq_search")
    idx.add_dense_batch(np.zeros((1, 2), np.float32))
    with pytest.raises(InvalidArgumentError):
        idx.get_data_point(5)
    with pytest.raises(InvalidArgumentError):
        idx.get_data_point(-1)


def test_9_thread_pool_and_metadata():
    """lib.zig:1518/1537 thread-pool consistency + metadata getters."""
    idx = Index("cosine", Params(dim=8), method="hnsw")
    idx.set_thread_pool_size(4)
    assert idx.get_thread_pool_size() == 4
    with pytest.raises(InvalidArgumentError):
        idx.set_thread_pool_size(-1)
    # metadata getters; 'cosine' reverse-aliases (lib.zig:1234-1239)
    assert idx.get_space_type() == "cosine"
    assert idx.get_method() == "hnsw"
    assert idx.get_data_type() is DataKind.DENSE
    assert idx.get_dist_type() is DistKind.FLOAT
    assert idx.data_qty() == 0


def test_load_data_false_index_only(tmp_path, rng):
    """Index-only load (nmslib_c.cpp:1399-1456): load_data=False reads
    only the .idx.npz — the format-v2 artifact embeds the data arrays,
    like the reference's optimized HNSW blob embeds its vectors — and
    answers identically to the full two-artifact load. Earlier formats
    restored against an empty store and silently answered nothing
    (review-confirmed, round 2); v1 artifacts must still raise."""
    import os

    import pytest

    x = rng.standard_normal((64, 8)).astype(np.float32)
    idx = Index("l2", Params(dim=8), method="hnsw")
    idx.add_dense_batch(x)
    idx.build_index(Params(M=4, efConstruction=10, waveSize=16))
    d0, i0 = idx.knn_query_batch(x[:16], 5)
    p = str(tmp_path / "ix")
    idx.save(p, save_data=False)  # one artifact only
    assert not os.path.exists(p + ".dat.npz")
    idx2 = Index.load(p, load_data=False)
    d1, i1 = idx2.knn_query_batch(x[:16], 5)
    np.testing.assert_array_equal(i0, i1)
    np.testing.assert_allclose(d0, d1, rtol=1e-6)
    # with the .dat saved, both load modes agree
    idx.save(p)
    idx3 = Index.load(p, load_data=True)
    _, i3 = idx3.knn_query_batch(x[:16], 5)
    np.testing.assert_array_equal(i0, i3)


def test_save_v3_single_copy(tmp_path, rng):
    """Format v3 (ADVICE r4): the data arrays live in exactly one
    artifact — save_data=True writes them to the .dat only (no embedded
    duplicate in the .idx), and load_data=False still works by falling
    back to the .dat."""
    import os

    x = rng.standard_normal((48, 8)).astype(np.float32)
    idx = Index("l2", Params(dim=8), method="hnsw")
    idx.add_dense_batch(x)
    idx.build_index(Params(M=4, efConstruction=10, waveSize=16))
    d0, i0 = idx.knn_query_batch(x[:8], 3)
    p = str(tmp_path / "v3")
    idx.save(p)  # save_data=True
    assert os.path.exists(p + ".dat.npz")
    with np.load(p + ".idx.npz") as z:
        assert not any(k.startswith("data_") for k in z.files)
        idx_sz = os.path.getsize(p + ".idx.npz")
    # both load modes answer identically (load_data=False reads the .dat
    # since nothing is embedded)
    for ld in (True, False):
        idx2 = Index.load(p, load_data=ld)
        d1, i1 = idx2.knn_query_batch(x[:8], 3)
        np.testing.assert_array_equal(i0, i1)
    # save_data=False embeds instead: single larger artifact, no .dat
    p2 = str(tmp_path / "v3b")
    idx.save(p2, save_data=False)
    assert not os.path.exists(p2 + ".dat.npz")
    assert os.path.getsize(p2 + ".idx.npz") > idx_sz
