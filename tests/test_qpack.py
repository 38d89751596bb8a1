"""Packed query transport (ops/qpack.py): bit-exact pack/unpack units
and packed-vs-eager equality through the public HNSW API.

The packed path exists purely to cut host<->device round trips over a
remote PJRT link (one uploaded buffer, in-jit unpack + derived terms,
one packed result download) — it must never change results. -1 id
sentinels bitcast to NaN payloads in f32, so the roundtrip test pins
that XLA's data movement preserves them.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpu_knn import Index, Params
from tpu_knn.core.dataset import DataKind
from tpu_knn.ops import qpack as Q


def test_pack_roundtrip_all_dtypes(rng):
    arrays = {
        "f": rng.standard_normal((7, 33)).astype(np.float32),
        "i": rng.integers(-(2**31), 2**31 - 1, (5, 3), dtype=np.int32),
        "u8": rng.integers(0, 255, (3, 13), dtype=np.uint8),  # odd bytes
        "i8": rng.integers(-128, 127, (2, 7), dtype=np.int8),
        "scalar_row": np.asarray([1.5, -2.5], np.float32),
    }
    buf, meta = Q.pack_host(arrays)
    assert buf.dtype == np.uint32
    out = jax.jit(lambda b: Q.unpack_device(b, meta))(jnp.asarray(buf))
    for k, a in arrays.items():
        got = np.asarray(out[k])
        assert got.dtype == a.dtype and got.shape == a.shape
        np.testing.assert_array_equal(got, a)


def test_pack_results_roundtrip_sentinels(rng):
    d = rng.standard_normal((6, 10)).astype(np.float32)
    ids = rng.integers(0, 2**20, (6, 10), dtype=np.int32)
    ids[0, :3] = -1  # sentinel: bitcasts to an f32 NaN payload
    ids[5, 9] = np.iinfo(np.int32).min
    packed = jax.jit(Q.pack_results)(jnp.asarray(d), jnp.asarray(ids))
    d2, i2 = Q.unpack_results(np.asarray(packed), 10)
    np.testing.assert_array_equal(d2, d)
    np.testing.assert_array_equal(i2, ids)


def _build_dense(space, n=3000, d=48, seed=0, **space_params):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((n, d)).astype(np.float32)
    x[n // 2] = x[0] + 1e-3  # near-duplicates exercise term math
    idx = Index(space, Params(dim=d, **space_params), method="hnsw")
    idx.add_dense_batch(x)
    idx.build_index(Params(M=8, efConstruction=60))
    idx.set_query_time_params(Params(efSearch=50))
    return idx, x


@pytest.mark.parametrize("space", ["l2", "cosinesimil", "negdotprod", "l1"])
def test_packed_matches_eager_dense(space):
    idx, x = _build_dense(space)
    q = x[:37]  # ragged batch exercises bucketing through the public API
    d1, i1 = idx.knn_query_batch(q, 10)
    assert Q.PACKED_QUERIES  # default on
    Q.PACKED_QUERIES = False
    try:
        d2, i2 = idx.knn_query_batch(q, 10)
    finally:
        Q.PACKED_QUERIES = True
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(d1, d2, rtol=5e-3, atol=1e-2)


def test_packed_matches_eager_sparse(rng):
    from tpu_knn.eval.datasets import sparse_like

    pts = sparse_like(1500, vocab=4000, nnz=24, seed=3)
    corpus, q = pts[:1400], pts[1400:1437]
    for space in ("cosinesimil_sparse", "l2_sparse"):
        idx = Index(space, method="hnsw", data_type=DataKind.SPARSE)
        idx.add_sparse_batch(corpus)
        idx.build_index(Params(M=8, efConstruction=40))
        idx.set_query_time_params(Params(efSearch=60))
        d1, i1 = idx.knn_query_batch(q, 10)
        Q.PACKED_QUERIES = False
        try:
            d2, i2 = idx.knn_query_batch(q, 10)
        finally:
            Q.PACKED_QUERIES = True
        np.testing.assert_array_equal(i1, i2)
        np.testing.assert_allclose(d1, d2, rtol=5e-3, atol=1e-2)


def test_packed_matches_eager_napp(rng):
    from tpu_knn.eval.datasets import sparse_like

    pts = sparse_like(1200, vocab=3000, nnz=24, seed=5)
    corpus, q = pts[:1100], pts[1100:1133]
    idx = Index("cosinesimil_sparse", method="napp", data_type=DataKind.SPARSE)
    idx.add_sparse_batch(corpus)
    idx.build_index(Params(numPivot=64, numPivotIndex=8))
    d1, i1 = idx.knn_query_batch(q, 10)
    Q.PACKED_QUERIES = False
    try:
        d2, i2 = idx.knn_query_batch(q, 10)
    finally:
        Q.PACKED_QUERIES = True
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(d1, d2, rtol=5e-3, atol=1e-2)


def test_packed_matches_eager_u8_sift(rng):
    x = rng.integers(0, 255, (2000, 128), dtype=np.uint8)
    q = x[:23]
    for method in ("hnsw", "seq_search"):
        idx = Index("l2sqr_sift", method=method,
                    data_type=DataKind.UINT8, dist_type="int")
        idx.add_uint8_batch(x)
        idx.build_index(Params(M=8, efConstruction=40) if method == "hnsw"
                        else None)
        if method == "hnsw":
            idx.set_query_time_params(Params(efSearch=60))
        d1, i1 = idx.knn_query_batch(q, 10)
        Q.PACKED_QUERIES = False
        try:
            d2, i2 = idx.knn_query_batch(q, 10)
        finally:
            Q.PACKED_QUERIES = True
        np.testing.assert_array_equal(i1, i2)
        np.testing.assert_array_equal(d1, d2)  # exact integer distances


def test_unsupported_space_falls_back(rng):
    # KL divergence keeps its bespoke eager encode (no host-qenc path):
    # the packed flag must not change behavior or crash
    x = rng.random((600, 24)).astype(np.float32) + 0.05
    x /= x.sum(1, keepdims=True)
    idx = Index("kldivgenfast", Params(dim=24), method="hnsw")
    idx.add_dense_batch(x)
    idx.build_index(Params(M=8, efConstruction=40))
    assert idx.space.encode_queries_host(x[:4]) is None
    d, i = idx.knn_query_batch(x[:4], 5)
    assert i[0, 0] == 0


def test_async_matches_sync_and_pipelines(rng):
    """knn_query_batch_async: dispatch-now / materialize-later returns
    exactly what the sync call would, supports overlapped in-flight
    batches, and falls back to pre-materialized futures off the packed
    path (kldiv has no host qenc)."""
    idx, x = _build_dense("l2")
    qs = [x[i * 37:(i + 1) * 37] for i in range(3)]  # ragged: bucketing
    futures = [idx.knn_query_batch_async(q, 10) for q in qs]  # in flight
    for q, fut in zip(qs, futures):
        d1, i1 = fut.result()
        d2, i2 = fut.result()  # idempotent
        np.testing.assert_array_equal(d1, d2)
        ds, is_ = idx.knn_query_batch(q, 10)
        np.testing.assert_array_equal(i1, is_)
        np.testing.assert_allclose(d1, ds, rtol=5e-3, atol=1e-2)
        assert d1.shape == (37, 10)

    y = rng.random((400, 24)).astype(np.float32) + 0.05
    y /= y.sum(1, keepdims=True)
    kidx = Index("kldivgenfast", Params(dim=24), method="hnsw")
    kidx.add_dense_batch(y)
    kidx.build_index(Params(M=8, efConstruction=40))
    fut = kidx.knn_query_batch_async(y[:9], 5)
    d1, i1 = fut.result()
    d2, i2 = kidx.knn_query_batch(y[:9], 5)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(d1, d2, rtol=5e-3, atol=1e-2)


def test_async_int_dist_rounding(rng):
    """INT dist_type futures apply the same rint finalization as sync."""
    x = rng.integers(0, 255, (800, 128), dtype=np.uint8)
    idx = Index("l2sqr_sift", method="seq_search",
                data_type=DataKind.UINT8, dist_type="int")
    idx.add_uint8_batch(x)
    idx.build_index()
    d1, i1 = idx.knn_query_batch_async(x[:13], 7).result()
    d2, i2 = idx.knn_query_batch(x[:13], 7)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_array_equal(d1, d2)
