"""VP-tree, NAPP, simple_invindx, dummy: correctness vs the exact scan
(reference methods layer, SURVEY.md §2.2)."""

import numpy as np
import pytest

from tpu_knn import DataKind, Index, Params
from tpu_knn.core.errors import SpaceIncompatibleError


def _dense(rng, n=200, d=12):
    return rng.standard_normal((n, d)).astype(np.float32)


def _recall(approx_ids, exact_ids):
    k = exact_ids.shape[1]
    return np.mean(
        [len(set(a[a >= 0]) & set(b)) / k for a, b in zip(approx_ids, exact_ids)]
    )


@pytest.fixture()
def dense_pair(rng):
    x = _dense(rng)
    q = x[:25]
    ex = Index("l2", Params(dim=12), method="seq_search")
    ex.add_dense_batch(x)
    ed, eids = ex.knn_query_batch(q, 5)
    return x, q, ed, eids


def test_vptree_exact_with_default_pruner(dense_pair):
    x, q, ed, eids = dense_pair
    idx = Index("l2", Params(dim=12), method="vptree")
    idx.add_dense_batch(x)
    idx.build_index(Params(bucketSize=20))
    d, ids = idx.knn_query_batch(q, 5)
    # alpha=1, exp=1 gives the true triangle inequality: results are exact
    assert _recall(ids, eids) == 1.0
    # gather-scored vs matmul-scored paths differ by f32 reduction order
    assert np.allclose(np.where(np.isfinite(d), d, 0), np.where(np.isfinite(ed), ed, 0), atol=5e-3)


def test_vptree_alpha_tradeoff(dense_pair):
    x, q, ed, eids = dense_pair
    idx = Index("l2", Params(dim=12), method="vptree")
    idx.add_dense_batch(x)
    idx.build_index(Params(bucketSize=20))
    idx.set_query_time_params(Params(alphaLeft=1.0, alphaRight=1.0))
    idx.knn_query_batch(q, 5)
    dc_exact = idx.method.dist_comps
    idx.method.dist_comps = 0
    idx.set_query_time_params(Params(alphaLeft=64.0, alphaRight=64.0))
    d, ids = idx.knn_query_batch(q, 5)
    dc_pruned = idx.method.dist_comps
    assert dc_pruned <= dc_exact  # stretching prunes more
    assert _recall(ids, eids) >= 0.3  # but quality degrades gracefully


def test_vptree_max_leaves(dense_pair):
    x, q, ed, eids = dense_pair
    idx = Index("l2", Params(dim=12), method="vptree")
    idx.add_dense_batch(x)
    idx.build_index(Params(bucketSize=20))
    idx.set_query_time_params(Params(maxLeavesToVisit=1))
    d, ids = idx.knn_query_batch(q, 5)
    assert (ids >= -1).all()  # well-formed even under a harsh cap


def test_vptree_gathered_matches_masked(dense_pair):
    """A finite maxLeavesToVisit routes through the gathered traversal
    (score only the selected leaves' rows); the masked full-corpus pass
    visits the identical left-to-right capped leaf set, so results and
    distance-computation counts must agree between the two paths."""
    x, q, ed, eids = dense_pair
    idx = Index("l2", Params(dim=12), method="vptree")
    idx.add_dense_batch(x)
    idx.build_index(Params(bucketSize=20))
    for ml in (2, 6):
        idx.set_query_time_params(Params(maxLeavesToVisit=ml))
        t = idx.method._tree
        assert ml < t["leaf_members"].shape[0]  # cap is actually binding
        d_g, i_g = idx.knn_query_batch(q, 5)
        dc_g = idx.method.dist_comps
        idx.method.dist_comps = 0
        try:
            idx.method.gather_traversal = False
            d_m, i_m = idx.knn_query_batch(q, 5)
        finally:
            idx.method.gather_traversal = True
        dc_m = idx.method.dist_comps
        idx.method.dist_comps = 0
        np.testing.assert_array_equal(i_g, i_m)
        np.testing.assert_allclose(
            np.where(np.isfinite(d_g), d_g, 0),
            np.where(np.isfinite(d_m), d_m, 0), atol=5e-3,
        )
        assert dc_g == dc_m > 0  # identical capped visit sets


def test_vptree_range(dense_pair):
    x, q, ed, eids = dense_pair
    idx = Index("l2", Params(dim=12), method="vptree")
    idx.add_dense_batch(x)
    res = idx.range_query(q[0], radius=float(ed[0, 3]))
    assert set(eids[0, :3]).issubset(set(res.ids))
    assert (res.dists <= ed[0, 3] + 1e-5).all()


def test_vptree_autotune(dense_pair):
    x, q, ed, eids = dense_pair
    idx = Index("l2", Params(dim=12), method="vptree")
    idx.add_dense_batch(x)
    idx.build_index(Params(bucketSize=20, desiredRecall=0.95, tuneK=5, tuneQty=30))
    assert idx.method.alpha_left >= 1.0
    d, ids = idx.knn_query_batch(q, 5)
    assert _recall(ids, eids) >= 0.9


def test_vptree_autotune_exp_grid(dense_pair):
    """minExp/maxExp extend the autotuner to the exponent grid
    (searchoracle.cc:212 iterates ce = minExp..maxExp around the alpha
    optimization; defaults 1/1). The tuned config must meet the target
    recall and the chosen exponent must come from the grid."""
    x, q, ed, eids = dense_pair
    idx = Index("l2", Params(dim=12), method="vptree")
    idx.add_dense_batch(x)
    idx.build_index(Params(bucketSize=20, desiredRecall=0.9, tuneK=5,
                           tuneQty=30, minExp=1, maxExp=3))
    m = idx.method
    assert m.exp_left in (1.0, 2.0, 3.0) and m.exp_right == m.exp_left
    d, ids = idx.knn_query_batch(q, 5)
    assert _recall(ids, eids) >= 0.85
    with pytest.raises(ValueError):
        Index("l2", Params(dim=12), method="vptree").build_index(
            Params(minExp=3, maxExp=2))


def test_napp(dense_pair):
    x, q, ed, eids = dense_pair
    idx = Index("l2", Params(dim=12), method="napp")
    idx.add_dense_batch(x)
    idx.build_index(Params(numPivot=32, numPrefix=8))
    idx.set_query_time_params(Params(numPrefixSearch=8, minTimes=2))
    d, ids = idx.knn_query_batch(q, 5)
    assert _recall(ids, eids) >= 0.8
    # harsher filtering scans fewer candidates
    dc_loose = idx.method.dist_comps
    idx.method.dist_comps = 0
    idx.set_query_time_params(Params(minTimes=4))
    idx.knn_query_batch(q, 5)
    assert idx.method.dist_comps <= dc_loose


def test_napp_scancount_backends_agree(dense_pair):
    """The MXU one-hot-matmul ScanCount and the membership-gather
    formulation must produce identical results and identical candidate
    accounting (exact integer counts either way). The flag is trace-
    time, so compare through the unjitted function."""
    from tpu_knn.methods import napp as NA

    x, q, ed, eids = dense_pair
    idx = Index("l2", Params(dim=12), method="napp")
    idx.add_dense_batch(x)
    idx.build_index(Params(numPivot=32, numPrefix=8))
    m = idx.method
    qenc = m.space.encode_queries(q)
    args = (m.space, qenc, m.data, m._pivot_rows, m._prefix, 5, m._chunk)
    fn = NA._napp_knn.__wrapped__
    out = {}
    orig = NA.SCANCOUNT_BACKEND
    try:
        for backend in ("mxu", "gather"):
            NA.SCANCOUNT_BACKEND = backend
            d, ids, nd = fn(*args, 2, False, 8)
            out[backend] = (np.asarray(d), np.asarray(ids), np.asarray(nd))
    finally:
        NA.SCANCOUNT_BACKEND = orig
    np.testing.assert_array_equal(out["mxu"][1], out["gather"][1])
    np.testing.assert_allclose(out["mxu"][0], out["gather"][0],
                               rtol=5e-3, atol=1e-5)
    np.testing.assert_array_equal(out["mxu"][2], out["gather"][2])


def test_napp_skip_checking(dense_pair):
    x, q, ed, eids = dense_pair
    idx = Index("l2", Params(dim=12), method="napp")
    idx.add_dense_batch(x)
    idx.build_index(Params(numPivot=32, numPrefix=8))
    idx.set_query_time_params(Params(minTimes=2, skipChecking=True))
    d, ids = idx.knn_query_batch(q, 5)
    assert (ids[:, 0] >= 0).all()  # candidates returned without re-ranking


def test_napp_range_all_candidates_equals_exact(dense_pair):
    """With minTimes=1 and the full pivot set searched, every object is
    a candidate (its prefix pivots all lie in the query mask), so the
    NAPP range result must EQUAL the exact seq_search range scan."""
    x, q, ed, eids = dense_pair
    ex = Index("l2", Params(dim=12), method="seq_search")
    ex.add_dense_batch(x)
    idx = Index("l2", Params(dim=12), method="napp")
    idx.add_dense_batch(x)
    idx.build_index(Params(numPivot=32, numPrefix=8))
    idx.set_query_time_params(Params(numPrefixSearch=32, minTimes=1))
    radius = float(np.median(ed[:, 3]))
    got = idx.range_query_batch(q, radius)
    want = ex.range_query_batch(q, radius)
    assert idx.method.dist_comps > 0
    for g, w in zip(got, want):
        assert set(g.ids) == set(w.ids)
        assert (g.dists <= radius + 1e-5).all()
        # ascending like the exact scan
        assert (np.diff(g.dists) >= -1e-6).all()


def test_napp_range_candidate_filtering(dense_pair):
    """At the reference defaults the range result is the candidate-set
    subset of the exact result (pivot_neighb_invindx.cc:783-785): every
    returned id must be a true in-radius hit, and most hits survive."""
    x, q, ed, eids = dense_pair
    ex = Index("l2", Params(dim=12), method="seq_search")
    ex.add_dense_batch(x)
    idx = Index("l2", Params(dim=12), method="napp")
    idx.add_dense_batch(x)
    idx.build_index(Params(numPivot=32, numPrefix=8))
    idx.set_query_time_params(Params(numPrefixSearch=8, minTimes=2))
    radius = float(np.median(ed[:, 3]))
    got = idx.range_query_batch(q, radius)
    want = ex.range_query_batch(q, radius)
    n_true = n_got = 0
    for g, w in zip(got, want):
        assert set(g.ids).issubset(set(w.ids))  # no false positives
        n_true += len(w.ids)
        n_got += len(g.ids)
    assert n_true > 0 and n_got >= 0.6 * n_true


def test_simple_invindx(rng):
    # sparse corpus; works only with negdotprod_sparse_fast
    def mk(n):
        out = []
        for _ in range(n):
            nnz = int(rng.integers(2, 10))
            ids = np.sort(rng.choice(np.arange(1, 60), size=nnz, replace=False))
            out.append((ids, rng.random(nnz).astype(np.float32)))
        return out

    xs, qs = mk(50), mk(8)
    idx = Index("negdotprod_sparse_fast", method="simple_invindx", data_type=DataKind.SPARSE)
    idx.add_sparse_batch(xs)
    d, ids = idx.knn_query_batch(qs, 5)
    ex = Index("negdotprod_sparse_fast", method="seq_search", data_type=DataKind.SPARSE)
    ex.add_sparse_batch(xs)
    ed, eids = ex.knn_query_batch(qs, 5)
    # DAAT == exact scan on dot products (where results are real overlaps)
    both = (ids >= 0) & (eids >= 0)
    assert np.allclose(d[both], ed[both], atol=1e-5)
    # wrong space is rejected when the method is created (at build time,
    # mirroring the reference's constructor check via nmslib_create_index)
    bad = Index("cosinesimil_sparse", method="simple_invindx", data_type=DataKind.SPARSE)
    bad.add_sparse_batch(xs)
    with pytest.raises(SpaceIncompatibleError):
        bad.build_index()
    with pytest.raises(SpaceIncompatibleError):
        idx.range_query(qs[0], 1.0)


def test_simple_invindx_taat_matches_scan(rng):
    """The posting-block TAAT engine (ops/inverted.py, default backend)
    must agree with the blocked-scan formulation on every touched doc:
    same ids, same scores to f32 accumulation tolerance, same DAAT
    touched-doc accounting. Docs sharing no term with the query never
    appear under TAAT (reference DAAT heap semantics)."""
    from tpu_knn.methods import inv_index as II

    def mk(n, lo=1, hi=60):
        out = []
        for _ in range(n):
            nnz = int(rng.integers(2, 10))
            ids = np.sort(rng.choice(np.arange(lo, hi), size=nnz, replace=False))
            out.append((ids, rng.random(nnz).astype(np.float32)))
        return out

    xs, qs = mk(80), mk(12)
    out = {}
    orig = II.INVINDX_BACKEND
    try:
        for backend in ("taat", "scan"):
            II.INVINDX_BACKEND = backend
            idx = Index("negdotprod_sparse_fast", method="simple_invindx",
                        data_type=DataKind.SPARSE)
            idx.add_sparse_batch(xs)
            d, ids = idx.knn_query_batch(qs, 5)
            out[backend] = (d, ids, idx.method.dist_comps)
    finally:
        II.INVINDX_BACKEND = orig
    dt, it, ndt = out["taat"]
    ds, is_, nds = out["scan"]
    both = (it >= 0) & (is_ >= 0)
    np.testing.assert_array_equal(it[both], is_[both])
    np.testing.assert_allclose(dt[both], ds[both], rtol=1e-5, atol=1e-6)
    assert ndt == nds  # identical DAAT touched counts

    # a query over a DISJOINT vocabulary touches nothing: TAAT returns
    # only -1 ids (the scan would fill with zero-score docs)
    try:
        II.INVINDX_BACKEND = "taat"
        idx = Index("negdotprod_sparse_fast", method="simple_invindx",
                    data_type=DataKind.SPARSE)
        idx.add_sparse_batch(xs)
        far_q = [(np.asarray([200, 201], np.int64),
                  np.asarray([1.0, 1.0], np.float32))]
        d, ids = idx.knn_query_batch(far_q, 5)
        assert (ids == -1).all() and np.isinf(d).all()
    finally:
        II.INVINDX_BACKEND = orig


def test_dummy_method(rng):
    x = _dense(rng, 30)
    idx = Index("l2", Params(dim=12), method="dummy")
    idx.add_dense_batch(x)
    d, ids = idx.knn_query_batch(x[:3], 2)
    assert (ids == -1).all()  # no-op variant returns nothing
    idx2 = Index("l2", Params(dim=12), method="dummy")
    idx2.add_dense_batch(x)
    idx2.build_index(Params(doSeqSearch=True))
    d2, ids2 = idx2.knn_query_batch(x[:3], 2)
    assert (ids2[:, 0] == np.arange(3)).all()


def test_methods_persistence_roundtrip(tmp_path, dense_pair):
    x, q, ed, eids = dense_pair
    for method, bp in [
        ("vptree", Params(bucketSize=20)),
        ("napp", Params(numPivot=16, numPrefix=4)),
        ("sw-graph", Params(NN=6)),
    ]:
        idx = Index("l2", Params(dim=12), method=method)
        idx.add_dense_batch(x)
        idx.build_index(bp)
        d1, i1 = idx.knn_query_batch(q, 5)
        p = str(tmp_path / method)
        idx.save(p)
        idx2 = Index.load(p)
        d2, i2 = idx2.knn_query_batch(q, 5)
        assert np.array_equal(i1, i2), method
        assert np.allclose(d1, d2, atol=1e-5), method


def test_simple_invindx_packed_transport(rng):
    """The qpack single-upload/single-download TAAT path (VERDICT r4
    item 6) must be bit-identical to the eager path, and knn_async must
    defer materialization through the same engine."""
    from tpu_knn.methods import inv_index as II
    from tpu_knn.ops import qpack as Q

    def mk(n):
        out = []
        for _ in range(n):
            nnz = int(rng.integers(2, 10))
            ids = np.sort(rng.choice(np.arange(1, 70), size=nnz, replace=False))
            out.append((ids, rng.random(nnz).astype(np.float32)))
        return out

    xs, qs = mk(90), mk(8)
    out = {}
    orig = Q.PACKED_QUERIES
    try:
        for packed in (True, False):
            Q.PACKED_QUERIES = packed
            idx = Index("negdotprod_sparse_fast", method="simple_invindx",
                        data_type=DataKind.SPARSE)
            idx.add_sparse_batch(xs)
            d, ids = idx.knn_query_batch(qs, 5)
            out[packed] = (d, ids, idx.method.dist_comps)
            # async path: dispatch returns a finisher with equal results
            fin = idx.method.knn_async(qs, 5)
            d2, i2 = fin()
            np.testing.assert_array_equal(ids, i2)
            np.testing.assert_array_equal(d, d2)
    finally:
        Q.PACKED_QUERIES = orig
    np.testing.assert_array_equal(out[True][1], out[False][1])
    # f32 payloads ride int32 lanes bit-exactly (never the reverse —
    # TPU FTZ zeroes subnormal id bitcasts; CLAUDE.md)
    np.testing.assert_array_equal(out[True][0], out[False][0])
    assert out[True][2] == out[False][2]


def test_napp_gathered_rerank_matches_fused(rng):
    """invProcAlg=gather (candidate-gathered rerank, VERDICT r4 item 2)
    must reproduce the fused masked-scan results whenever the dbScanFrac
    budget covers every candidate — same ids, distances, and dist-comp
    accounting semantics (candidates scored + pivot distances)."""
    def mk(n):
        out = []
        for _ in range(n):
            nnz = int(rng.integers(3, 12))
            ids = np.sort(rng.choice(np.arange(1, 80), size=nnz, replace=False))
            out.append((ids, rng.random(nnz).astype(np.float32)))
        return out

    xs, qs = mk(300), mk(16)
    idx = Index("cosinesimil_sparse", method="napp", data_type=DataKind.SPARSE)
    idx.add_sparse_batch(xs)
    idx.build_index(Params(numPivot=32, numPrefix=8, seed=3))
    out = {}
    # frac=4: the per-chunk budget (frac*n/num_chunks) must reach the
    # chunk width for full candidate coverage (uneven candidate
    # density truncates lowest-count first below that)
    for alg, frac in (("scan", 0.05), ("gather", 4.0)):
        idx.set_query_time_params(Params(invProcAlg=alg, dbScanFrac=frac,
                                         minTimes=2))
        d, ids = idx.knn_query_batch(qs, 5)
        out[alg] = (np.asarray(d), np.asarray(ids))
    ds, is_ = out["scan"]
    dg, ig = out["gather"]
    both = (is_ >= 0) & (ig >= 0)
    np.testing.assert_array_equal(is_[both], ig[both])
    np.testing.assert_allclose(ds[both], dg[both], rtol=5e-3, atol=1e-5)

    # a tight budget still returns valid (possibly truncated) results
    idx.set_query_time_params(Params(invProcAlg="gather", dbScanFrac=0.02))
    d2, i2 = idx.knn_query_batch(qs, 5)
    assert (np.asarray(i2)[:, 0] >= 0).any()

    # dense spaces ride the same path (score_rows affine einsum)
    x = rng.standard_normal((256, 16)).astype(np.float32)
    dn = Index("l2", Params(dim=16), method="napp")
    dn.add_dense_batch(x)
    dn.build_index(Params(numPivot=32, numPrefix=8))
    dn.set_query_time_params(Params(invProcAlg="gather", dbScanFrac=1.0))
    dd, di = dn.knn_query_batch(x[:8], 3)
    assert (np.asarray(di)[:, 0] == np.arange(8)).all()

    # unknown algs fail fast
    import pytest as _pytest
    from tpu_knn.core.errors import InvalidArgumentError
    with _pytest.raises(InvalidArgumentError):
        idx.set_query_time_params(Params(invProcAlg="wand"))
