"""seq_search end-to-end: exact kNN, range queries, persistence."""

import numpy as np

from tpu_knn import Index, Params


def _mk_index(n=100, d=16, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((n, d)).astype(np.float32)
    idx = Index("l2", Params(dim=d), method="seq_search", data_type="dense_vector")
    idx.add_dense_batch(x)
    return idx, x


def test_knn_exact_matches_numpy():
    idx, x = _mk_index(101, 16)
    q = x[:7] + 0.01
    d, i = idx.knn_query_batch(q, k=5)
    want = np.sqrt(((q[:, None, :] - x[None, :, :]) ** 2).sum(-1))
    wi = np.argsort(want, axis=1)[:, :5]
    wd = np.take_along_axis(want, wi, axis=1)
    np.testing.assert_array_equal(i, wi)
    np.testing.assert_allclose(d, wd, rtol=1e-4, atol=1e-4)


def test_knn_single_and_autobuild():
    idx, x = _mk_index(50, 8)
    # no explicit build_index: auto-build on first query (lib.zig:800)
    res = idx.knn_query(x[3], k=2)
    assert res.ids[0] == 3
    # self-distance sits at the l2 norm-identity cancellation floor
    # (sqrt(eps_f32 * |x|^2) ~ 1e-3 on TPU; exact on the CPU backend) —
    # the suite runs on both (TPU_KNN_TEST_TPU=1)
    assert res.dists[0] < 5e-3


def test_k_larger_than_corpus():
    idx, x = _mk_index(5, 8)
    res = idx.knn_query(x[0], k=10)
    assert len(res) == 5  # only 5 objects exist


def test_range_query():
    idx, x = _mk_index(64, 4)
    q = x[0]
    res = idx.range_query(q, radius=1.0)
    want = np.sqrt(((x - q[None, :]) ** 2).sum(-1))
    want_ids = set(np.nonzero(want <= 1.0)[0].tolist())
    assert set(res.ids.tolist()) == want_ids
    assert np.all(res.dists <= 1.0 + 1e-6)


def test_custom_ids():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((10, 4)).astype(np.float32)
    idx = Index("l2", Params(dim=4), method="seq_search")
    idx.add_dense_batch(x, ids=[100, 101, 102, 103, 104, 105, 106, 107, 108, 109])
    res = idx.knn_query(x[2], k=1)
    assert res.ids[0] == 102


def test_save_load_roundtrip(tmp_path):
    idx, x = _mk_index(30, 8)
    idx.build_index()
    before = idx.knn_query(x[4], k=3)
    p = str(tmp_path / "idx")
    idx.save(p)
    idx2 = Index.load(p)
    after = idx2.knn_query(x[4], k=3)
    np.testing.assert_array_equal(before.ids, after.ids)
    np.testing.assert_allclose(before.dists, after.dists, rtol=1e-6)
    assert idx2.get_space_type() == "l2"
    assert idx2.data_qty() == 30


def test_reset_and_clear_cache():
    idx, x = _mk_index(20, 4)
    idx.build_index()
    idx.clear_index_cache()
    assert not idx.built
    res = idx.knn_query(x[0], k=1)  # auto-rebuild
    assert res.ids[0] == 0
    idx.reset()
    assert idx.data_qty() == 0


# ---- certified reduced-precision pass 1 (methods/seq_search.py) ----


def test_pass1_precision_param_validation():
    import pytest

    idx, _ = _mk_index(20, 8)
    with pytest.raises(Exception):
        idx.build_index(Params(pass1Precision="float16"))


def test_pass1_precision_tiers_identical_results():
    # big enough to take the two-pass path (n_pad >= 8*(k+2)*128)
    rng = np.random.default_rng(3)
    x = rng.standard_normal((13000, 32)).astype(np.float32)
    q = x[:16] + 0.01
    ref = None
    for tier in ("float32", "high", "bfloat16"):
        idx = Index("l2", Params(dim=32), method="seq_search")
        idx.add_dense_batch(x)
        idx.build_index(Params(pass1Precision=tier))
        d, i = idx.knn_query_batch(q, k=4)
        if ref is None:
            ref = (d, i)
        else:
            np.testing.assert_array_equal(i, ref[1])
            np.testing.assert_allclose(d, ref[0], rtol=1e-6)


def test_certificate_logic():
    import jax.numpy as jnp

    from tpu_knn.methods.seq_search import _certificate_ok

    # vals ascending per row; k=2, kg=3 (vals has kg+1 columns)
    vals = jnp.asarray([[1.0, 2.0, 3.0, 10.0]])
    eps = jnp.asarray([1.0])
    # boundary 10 > vals[k-1]=2 + 2*1 -> ok
    assert bool(_certificate_ok(vals, 2, eps))
    # larger eps: 10 > 2 + 2*4=10 is False -> not ok
    assert not bool(_certificate_ok(vals, 2, jnp.asarray([4.0])))
    # multi-row: any failing row fails the batch
    vals2 = jnp.asarray([[1.0, 2.0, 3.0, 10.0], [1.0, 2.0, 3.0, 4.0]])
    assert not bool(_certificate_ok(vals2, 2, jnp.asarray([1.0, 1.0])))


def test_max_sq_norm_metadata():
    from tpu_knn.core.dataset import DataKind, DataStore
    from tpu_knn.core.params import Params as P_
    from tpu_knn.core.registry import create_space

    rng = np.random.default_rng(0)
    x = rng.standard_normal((100, 16)).astype(np.float32)
    space = create_space("l2", P_(dim=16))
    store = DataStore(DataKind.DENSE)
    store.add_dense_batch(x)
    data = space.encode_dataset(store, row_multiple=8)
    # lazy: absent after encode (the default f32 tier never reads it),
    # computed and cached on first use by the reduced-precision path
    assert "max_sq_norm" not in data.extra
    from tpu_knn.spaces.dense import ensure_cert_metadata

    ensure_cert_metadata(data)
    want = float((x.astype(np.float64) ** 2).sum(1).max())
    got = float(data.extra["max_sq_norm"])
    assert want <= got <= want * 1.02
    assert "max_lo_norm" in data.extra and "max_blo_err" in data.extra


def test_corpus_upload_cache_shared_across_encodes():
    """Two encodes of content-equal corpora (different stores, different
    row multiples) share ONE uploaded device slab (_cached_upload) and
    produce identical search results — a 1M x 128 f32 upload measured
    ~140 s over the remote link, and the gold-scan + index pattern pays
    it once now (round 4)."""
    import numpy as np

    from tpu_knn.core.dataset import DataKind, DataStore
    from tpu_knn.core.params import Params as P_
    from tpu_knn.core.registry import create_space
    from tpu_knn.spaces import dense as D

    rng = np.random.default_rng(3)
    x = rng.standard_normal((300, 16)).astype(np.float32)
    space = create_space("l2", P_(dim=16))
    s1 = DataStore(DataKind.DENSE)
    s1.add_dense_batch(x)
    s2 = DataStore(DataKind.DENSE)
    s2.add_dense_batch(x.copy())  # different buffer, same content
    before = len(D._UPLOAD_CACHE)
    d1 = space.encode_dataset(s1, row_multiple=8)
    mid = len(D._UPLOAD_CACHE)
    d2 = space.encode_dataset(s2, row_multiple=64)  # different padding
    after = len(D._UPLOAD_CACHE)
    assert mid == after  # second encode HIT the cache (no new entry)
    assert after >= before  # and the first one populated it
    # padded shapes differ but content agrees where rows exist
    np.testing.assert_array_equal(
        np.asarray(d1.vecs)[:300], np.asarray(d2.vecs)[:300]
    )
    np.testing.assert_allclose(
        np.asarray(d1.row_term)[:300], np.asarray(d2.row_term)[:300],
        rtol=1e-6,
    )
    # mutated content must MISS (stale-cache guard)
    s3 = DataStore(DataKind.DENSE)
    y = x.copy()
    y[0, 0] += 1.0
    s3.add_dense_batch(y)
    d3 = space.encode_dataset(s3, row_multiple=8)
    assert float(np.asarray(d3.vecs)[0, 0]) == float(y[0, 0])
