"""Levenshtein / normleven / bit / word_embed / fusion space tests."""

import numpy as np
import pytest

from tpu_knn import DataKind, DistKind, Index, Params
from tpu_knn.core.dataset import DataStore
from tpu_knn.core.registry import create_space


def py_leven(a: bytes, b: bytes) -> int:
    la, lb = len(a), len(b)
    prev = list(range(la + 1))
    for i in range(1, lb + 1):
        cur = [i] + [0] * la
        for j in range(1, la + 1):
            cost = 0 if a[j - 1] == b[i - 1] else 1
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + cost)
        prev = cur
    return prev[la]


WORDS = [b"kitten", b"sitting", b"", b"a", b"abcdefghij", b"abcdefhgij", b"banana", b"bananas"]


def test_levenshtein_kernel_matches_python(rng):
    space = create_space("leven")
    store = DataStore(DataKind.STRING)
    store.add_string_batch(WORDS)
    data = space.encode_dataset(store)
    qs = [b"kitten", b"siting", b"xyz", b""]
    qenc = space.encode_queries(qs)
    d = np.asarray(space.block(qenc, space.slice_data(data, 0, data.ids.shape[0])))
    for i, q in enumerate(qs):
        for j, x in enumerate(WORDS):
            assert int(d[i, j]) == py_leven(q, x), (q, x)


def test_normleven_matches_python(rng):
    space = create_space("normleven")
    store = DataStore(DataKind.STRING)
    store.add_string_batch(WORDS)
    data = space.encode_dataset(store)
    qs = [b"kitten", b""]
    qenc = space.encode_queries(qs)
    d = np.asarray(space.block(qenc, space.slice_data(data, 0, data.ids.shape[0])))
    for i, q in enumerate(qs):
        for j, x in enumerate(WORDS):
            m = max(len(q), len(x))
            want = py_leven(q, x) / m if m else 0.0
            assert d[i, j] == pytest.approx(want, abs=1e-6)


def test_leven_index_end_to_end():
    idx = Index("leven", method="seq_search", data_type=DataKind.STRING, dist_type=DistKind.INT)
    idx.add_string_batch([b"hello", b"hallo", b"help", b"world"])
    res = idx.knn_query("hello", 2)
    assert list(res.ids[:1]) == [0]
    assert res.dists[0] == 0
    assert res.dists[1] == 1  # hallo
    assert idx.get_distance(0, 1) == 1


def test_bit_hamming(rng):
    n, d = 20, 64
    x = (rng.random((n, d)) > 0.5).astype(np.uint8)
    idx = Index("bit_hamming", method="seq_search", data_type=DataKind.UINT8, dist_type=DistKind.INT)
    idx.add_uint8_batch(x)
    q = x[3]
    res = idx.knn_query(q, 3)
    assert res.ids[0] == 3 and res.dists[0] == 0
    want = int(np.sum(x[3] != x[res.ids[1]]))
    assert int(res.dists[1]) == want


def test_bit_jaccard(rng):
    n, d = 16, 32
    x = (rng.random((n, d)) > 0.5).astype(np.uint8)
    idx = Index("bit_jaccard", method="seq_search", data_type=DataKind.UINT8, dist_type=DistKind.FLOAT)
    idx.add_uint8_batch(x)
    d_01 = idx.get_distance(0, 1)
    inter = int(np.sum((x[0] & x[1])))
    union = int(np.sum((x[0] | x[1])))
    assert d_01 == pytest.approx(1 - inter / union, abs=1e-6)


def test_word_embed(tmp_path, rng):
    vecs = {f"w{i}": rng.standard_normal(8).astype(np.float32) for i in range(10)}
    f = tmp_path / "emb.txt"
    f.write_text("\n".join(f"{w} " + " ".join(f"{v:.6f}" for v in vec) for w, vec in vecs.items()))
    idx = Index(
        "word_embed",
        Params(dist="l2", file=str(f)),
        method="seq_search",
        data_type=DataKind.STRING,
    )
    idx.add_string_batch(list(vecs.keys()))
    res = idx.knn_query("w3", 2)
    assert res.ids[0] == 3
    # norm-identity f32 noise after sqrt is ~1e-3
    assert res.dists[0] == pytest.approx(0.0, abs=5e-3)
    # bad dist param rejected
    with pytest.raises(Exception):
        Index("word_embed", Params(dist="cityblock"), method="seq_search", data_type=DataKind.STRING)


def test_sparse_dense_fusion(rng):
    import json

    def obj(dense, ids, vals):
        return json.dumps({"dense": [list(map(float, dense))], "sparse": [[list(map(int, ids)), list(map(float, vals))]]})

    xs = [
        obj([1.0, 0.0], [1, 3], [1.0, 2.0]),
        obj([0.0, 1.0], [2, 3], [3.0, 1.0]),
        obj([0.5, 0.5], [1, 2], [1.0, 1.0]),
    ]
    idx = Index(
        "sparse_dense_fusion",
        Params(indexWeights="1.0,1.0", queryWeights="0.5,2.0"),
        method="seq_search",
        data_type=DataKind.STRING,
    )
    idx.add_string_batch(xs)
    q = obj([1.0, 1.0], [3], [1.0])
    d, ids = idx.knn_query_batch([q], 3)
    # manual: -(0.5*dense_dot + 2.0*sparse_dot)
    dots = [
        -(0.5 * 1.0 + 2.0 * 2.0),
        -(0.5 * 1.0 + 2.0 * 1.0),
        -(0.5 * 1.0 + 2.0 * 0.0),
    ]
    order = np.argsort(dots)
    assert list(ids[0]) == list(order)
    assert np.allclose(sorted(dots), d[0], atol=1e-5)


def test_sqfd(rng):
    """SQFD vs a direct W^T A W evaluation (space_sqfd.cc layout)."""
    import json

    from tpu_knn.core.registry import create_space

    def sig(nc, d=4):
        return {
            "weights": [float(x) for x in rng.random(nc)],
            "centers": [[float(v) for v in rng.standard_normal(d)] for _ in range(nc)],
        }

    def oracle(a, b, f):
        wa, ca = np.asarray(a["weights"]), np.asarray(a["centers"])
        wb, cb = np.asarray(b["weights"]), np.asarray(b["centers"])
        w = np.concatenate([wa, -wb])
        c = np.concatenate([ca, cb])
        dd = np.sqrt(((c[:, None] - c[None, :]) ** 2).sum(-1))
        return float(np.sqrt(max(w @ f(dd) @ w, 0.0)))

    sigs = [sig(int(rng.integers(2, 6))) for _ in range(5)]
    qs = [sig(3), sig(4)]
    fns = {
        "sqfd_minus_func": lambda d: -d,
        "sqfd_heuristic_func": lambda d: 1.0 / (1.0 + d),
        "sqfd_gaussian_func": lambda d: np.exp(-1.0 * d * d),
    }
    from tpu_knn.core.dataset import DataStore

    for name, f in fns.items():
        space = create_space(name, Params(alpha=1.0))
        store = DataStore(DataKind.STRING)
        store.add_string_batch([json.dumps(s) for s in sigs])
        data = space.encode_dataset(store)
        qenc = space.encode_queries([json.dumps(q) for q in qs])
        d = np.asarray(space.block(qenc, space.slice_data(data, 0, data.ids.shape[0])))
        for i, q in enumerate(qs):
            for j, x in enumerate(sigs):
                assert d[i, j] == pytest.approx(oracle(q, x, f), rel=1e-3, abs=1e-3), name


def test_space_whitelist_parity():
    """is_valid_space_type mirrors the reference's 55-entry whitelist
    (lib.zig:428-492), including its file-name quirks."""
    from tpu_knn import is_valid_space_type

    for name in ("l2", "cosine", "sparse_vector", "sqfd_minus_func", "word_embed_dist_l2"):
        assert is_valid_space_type(name), name
    assert not is_valid_space_type("no_such_space")


def test_word_embed_graph_paths(rng):
    """word_embed must delegate the scoring hooks (term_recompute /
    pass1_affine) to its inner dense metric: without them the gather-
    scored beam search crashed with KeyError 'x_term' for dist=l2 and
    cosine lost the affine fast path (review finding, round 2)."""
    # clustered vectors (uniform random high-d data is near-equidistant
    # and defeats graph indexes — CLAUDE.md; this test is a crash
    # regression for the gather paths, not a recall benchmark)
    centers = rng.standard_normal((10, 12)) * 3.0
    pts = centers[np.arange(300) % 10] + 0.1 * rng.standard_normal((300, 12))
    lines = [
        f"w{i} " + " ".join(f"{v:.5f}" for v in pts[i]) for i in range(300)
    ]
    true = np.stack([
        np.asarray([float(p) for p in l.split()[1:]], np.float32) for l in lines
    ])
    for dist in ("l2", "cosine"):
        idx = Index("word_embed", Params(dist=dist), method="hnsw",
                    data_type=DataKind.STRING)
        idx.add_string_batch(lines)
        idx.build_index(Params(M=8, efConstruction=40, waveSize=32))
        # encode sanity: corpus rows hold their claimed ids' vectors
        vecs = np.asarray(idx.method.data.vecs)[:, :12]
        ids = np.asarray(idx.method.data.ids)
        real = ids >= 0
        want = true[ids[real]]
        if dist == "cosine":  # cosine pre-normalizes corpus rows
            want = want / np.linalg.norm(want, axis=1, keepdims=True)
        assert np.allclose(vecs[real], want, atol=1e-4)
        idx.set_query_time_params(Params(efSearch=60))
        d, i = idx.knn_query_batch(lines[:8], 3)
        hits = (np.asarray(i)[:, 0] == np.arange(8)).mean()
        assert hits >= 0.9, (dist, np.asarray(i)[:, 0], np.asarray(d)[:, 0])


def test_fusion_index_weights_used_in_construction(rng):
    """indexWeights score index-time distances, queryWeights score
    queries (reference compDistance(isQueryTime)); previously the index
    weights were parsed but never applied (review finding, round 2)."""
    import json

    from tpu_knn.core.dataset import DataStore
    from tpu_knn.core.registry import create_space

    def obj(dense, ids, vals):
        return json.dumps({
            "dense": [list(map(float, dense))],
            "sparse": [[list(map(int, ids)), list(map(float, vals))]],
        })

    xs = [obj(rng.standard_normal(2), [1, 2], rng.random(2) + 0.1) for _ in range(8)]
    space = create_space(
        "sparse_dense_fusion", Params(indexWeights="1.0,0.0", queryWeights="0.0,1.0")
    )
    store = DataStore(DataKind.STRING)
    store.add_string_batch(xs)
    data = space.encode_dataset(store)
    xc = space.slice_data(data, 0, data.ids.shape[0])
    xc["pad"] = np.asarray(data.extra["pad"])
    qenc = space.encode_queries(xs[:2])
    dq = np.asarray(space.block(qenc, xc))              # query weights
    di = np.asarray(space.construction_space().block(qenc, xc))  # index weights
    assert not np.allclose(dq[:, :8], di[:, :8])
    # index view scores ONLY the dense component (weight 1,0)
    dense_q = np.stack([json.loads(x)["dense"][0] for x in xs[:2]])
    dense_x = np.stack([json.loads(x)["dense"][0] for x in xs])
    np.testing.assert_allclose(di[:, :8], -(dense_q @ dense_x.T), atol=1e-5)

    # end-to-end build still works with distinct weight sets
    idx = Index("sparse_dense_fusion",
                Params(indexWeights="1.0,0.0", queryWeights="0.0,1.0"),
                method="hnsw", data_type=DataKind.STRING)
    idx.add_string_batch(xs)
    idx.build_index(Params(M=4, efConstruction=8, waveSize=8))
    d, i = idx.knn_query_batch(xs[:2], 2)
    assert np.asarray(i).shape == (2, 2)


def test_fusion_weight_validation(rng):
    import json

    import pytest as _pytest

    x = json.dumps({"dense": [[1.0, 0.0]], "sparse": [[[1], [1.0]]]})
    # reference parity: compDistance skips weights <= FLT_MIN
    # (space_sparse_dense_fusion.cc:297), so a negative weight drops the
    # component rather than flipping its sign
    idx = Index("sparse_dense_fusion",
                Params(indexWeights="1.0,1.0", queryWeights="1.0,-1.0"),
                method="seq_search", data_type=DataKind.STRING)
    idx.add_string_batch([x])
    d, _ = idx.knn_query_batch([x], 1)
    assert abs(d[0][0] - (-1.0)) < 1e-5  # -(1.0*dense_dot), sparse skipped
    # extra weights are tolerated (the reference ignores them) ...
    extra = Index("sparse_dense_fusion",
                  Params(indexWeights="1.0,1.0,9.0", queryWeights="1.0,1.0,9.0"),
                  method="seq_search", data_type=DataKind.STRING)
    extra.add_string_batch([x])
    d2, _ = extra.knn_query_batch([x], 1)
    assert abs(d2[0][0] - (-2.0)) < 1e-5
    # ... too FEW weights raise
    few = Index("sparse_dense_fusion",
                Params(indexWeights="1.0", queryWeights="1.0"),
                method="seq_search", data_type=DataKind.STRING)
    few.add_string_batch([x])
    with _pytest.raises(Exception, match="[Tt]oo few"):
        few.knn_query_batch([x], 1)
    # mixed component schemas are rejected at encode
    y = json.dumps({"dense": [[1.0, 0.0], [2.0, 2.0]], "sparse": [[[1], [1.0]]]})
    mixed = Index("sparse_dense_fusion", Params(),
                  method="seq_search", data_type=DataKind.STRING)
    mixed.add_string_batch([x, y])
    with _pytest.raises(Exception, match="differing component counts"):
        mixed.knn_query_batch([x], 1)
