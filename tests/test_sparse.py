"""Sparse space kernels vs a pure-python oracle, plus end-to-end sparse
workflows (acceptance analog of the reference sparse tests,
lib.zig:1315-1349)."""

import math

import numpy as np
import pytest

from tpu_knn import DataKind, Index, Params, SparsePoint
from tpu_knn.core.dataset import DataStore
from tpu_knn.core.errors import InvalidSparseElementError
from tpu_knn.core.registry import create_space


def _rand_sparse(rng, n, universe=200, max_nnz=24):
    pts = []
    for _ in range(n):
        nnz = int(rng.integers(1, max_nnz))
        ids = np.sort(rng.choice(np.arange(1, universe + 1), size=nnz, replace=False))
        vals = rng.standard_normal(nnz).astype(np.float32)
        pts.append((ids.astype(np.int32), vals))
    return pts


def _to_dict(p):
    ids, vals = (p.ids, p.values) if isinstance(p, SparsePoint) else p
    return dict(zip([int(i) for i in ids], [float(v) for v in vals]))


def _oracle(space_name, q, x, p_param=2.0):
    dq, dx = _to_dict(q), _to_dict(x)
    keys = set(dq) | set(dx)
    dot = sum(dq.get(k, 0.0) * dx.get(k, 0.0) for k in keys)
    nq = math.sqrt(sum(v * v for v in dq.values()))
    nx = math.sqrt(sum(v * v for v in dx.values()))
    if space_name.startswith("cosinesimil_sparse"):
        return max(0.0, 1.0 - dot / max(nq * nx, 1e-10))
    if space_name.startswith("angulardist_sparse"):
        return math.acos(max(-1.0, min(1.0, dot / max(nq * nx, 1e-10))))
    if space_name.startswith("querynorm_negdotprod"):
        return -dot / max(nq, 1e-10)
    if space_name.startswith("negdotprod_sparse"):
        return -dot
    if space_name == "sparse_jaccard":
        inter = len(set(dq) & set(dx))
        union = len(set(dq) | set(dx))
        return 1.0 - inter / union if union else 0.0
    if space_name == "linf_sparse":
        return max(abs(dq.get(k, 0.0) - dx.get(k, 0.0)) for k in keys)
    p = {"l1_sparse": 1.0, "l2_sparse": 2.0, "lp_sparse": p_param}[space_name]
    s = sum(abs(dq.get(k, 0.0) - dx.get(k, 0.0)) ** p for k in keys)
    return s if p == 1.0 else s ** (1.0 / p)


ALL_SPARSE = [
    "cosinesimil_sparse",
    "cosinesimil_sparse_fast",
    "angulardist_sparse",
    "negdotprod_sparse",
    "querynorm_negdotprod_sparse",
    "l1_sparse",
    "l2_sparse",
    "linf_sparse",
    "lp_sparse",
    "sparse_jaccard",
]


@pytest.mark.parametrize("space_name", ALL_SPARSE)
def test_sparse_block_matches_oracle(rng, space_name):
    params = Params(p=2.5) if space_name == "lp_sparse" else None
    space = create_space(space_name, params)
    qs = _rand_sparse(rng, 5)
    xs = _rand_sparse(rng, 7)
    store = DataStore(DataKind.SPARSE)
    store.add_sparse_batch(xs)
    data = space.encode_dataset(store)
    qenc = space.encode_queries(qs)
    d = np.asarray(space.block(qenc, space.slice_data(data, 0, data.ids.shape[0])))
    for i, q in enumerate(qs):
        for j, x in enumerate(xs):
            want = _oracle(space_name, q, x, 2.5)
            assert d[i, j] == pytest.approx(want, rel=2e-4, abs=2e-5), (
                f"{space_name} mismatch at ({i},{j})"
            )


def test_binary_variants(rng):
    """*_bin_fast force presence-only values (space_sparse_bin_common.h)."""
    qs = _rand_sparse(rng, 3)
    xs = _rand_sparse(rng, 4)
    binq = [(i, np.ones_like(v)) for i, v in qs]
    binx = [(i, np.ones_like(v)) for i, v in xs]
    for name in ("cosinesimil_sparse_bin_fast", "negdotprod_sparse_bin_fast"):
        space = create_space(name)
        store = DataStore(DataKind.SPARSE)
        store.add_sparse_batch(xs)
        data = space.encode_dataset(store)
        qenc = space.encode_queries(qs)
        d = np.asarray(space.block(qenc, space.slice_data(data, 0, data.ids.shape[0])))
        base = name.replace("_bin_fast", "")
        for i, q in enumerate(binq):
            for j, x in enumerate(binx):
                want = _oracle(base, q, x)
                assert d[i, j] == pytest.approx(want, rel=1e-4, abs=1e-5)


def test_sparse_validation():
    store = DataStore(DataKind.SPARSE)
    with pytest.raises(InvalidSparseElementError):
        store.add_sparse_batch([(np.asarray([0, 2]), np.asarray([1.0, 2.0]))])
    with pytest.raises(InvalidSparseElementError):
        store.add_sparse_batch([(np.asarray([3, 2]), np.asarray([1.0, 2.0]))])
    with pytest.raises(InvalidSparseElementError):
        store.add_sparse_batch([(np.asarray([2, 2]), np.asarray([1.0, 2.0]))])


def test_sparse_seq_search_end_to_end(rng):
    xs = _rand_sparse(rng, 40)
    qs = _rand_sparse(rng, 6)
    idx = Index("cosinesimil_sparse", method="seq_search", data_type=DataKind.SPARSE)
    idx.add_sparse_batch(xs)
    d, ids = idx.knn_query_batch(qs, 5)
    # oracle
    for i, q in enumerate(qs):
        want = sorted(
            (( _oracle("cosinesimil_sparse", q, x), j + 1) for j, x in enumerate(xs)),
        )[:5]
        got = list(zip(d[i], ids[i]))
        for (wd, wi), (gd, gi) in zip(want, got):
            assert gd == pytest.approx(wd, rel=2e-4, abs=2e-5)
    # default sparse ids are 1-based (reference: lib.zig:748)
    assert ids.min() >= 1


def test_sparse_hnsw_end_to_end(rng):
    xs = _rand_sparse(rng, 60)
    idx = Index("cosinesimil_sparse", method="hnsw", data_type=DataKind.SPARSE)
    idx.add_sparse_batch(xs)
    idx.build_index(Params(M=8, efConstruction=40, waveSize=16))
    idx.set_query_time_params(Params(efSearch=60))
    # self-query: every point should find itself at distance ~0
    d, ids = idx.knn_query_batch(xs[:10], 1)
    assert np.all(ids[:, 0] == np.arange(1, 11))
    assert np.allclose(d[:, 0], 0.0, atol=1e-5)


def test_sparse_borrow_roundtrip(rng):
    xs = _rand_sparse(rng, 5)
    idx = Index("cosinesimil_sparse", method="seq_search", data_type=DataKind.SPARSE)
    idx.add_sparse_batch(xs)
    p = idx.borrow_data_sparse(2)
    assert np.array_equal(p.ids, xs[2][0])
    assert np.allclose(p.values, xs[2][1])


def test_dense_scatter_dot_matches_lookup(rng):
    """ops/sparse.py dot_blocked_dense (MXU dense-after-scatter) must
    equal the sorted-lookup kernel and the intersection variant its
    loop-based counterpart."""
    import jax.numpy as jnp

    from tpu_knn.ops import sparse as S

    xs = _rand_sparse(rng, 40, universe=300, max_nnz=20)
    qs = _rand_sparse(rng, 7, universe=300, max_nnz=16)

    def pack(pts, pad):
        nnz = max(len(p.ids) for p in pts)
        col = np.full((len(pts), nnz), int(pad), np.int32)
        val = np.zeros((len(pts), nnz), np.float32)
        for i, p in enumerate(pts):
            col[i, : len(p.ids)] = p.ids
            val[i, : len(p.ids)] = p.values
        return jnp.asarray(col), jnp.asarray(val)

    qcol, qval = pack([DataStore.validate_sparse(q) for q in qs], S.PAD_Q)
    xcol, xval = pack([DataStore.validate_sparse(x) for x in xs], S.PAD_X)
    ref = np.asarray(S.dot_blocked(qcol, qval, xcol, xval))
    got = np.asarray(S.dot_blocked_dense(qcol, qval, xcol, xval, 384))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)

    ref_i = np.asarray(S.intersect_count_blocked(qcol, xcol))
    got_i = np.asarray(S.intersect_count_blocked_dense(qcol, xcol, 384))
    np.testing.assert_allclose(got_i, ref_i, rtol=0, atol=1e-5)


def test_sketch_backends_agree(rng):
    """The scatter-free gather sketch projection equals the
    densify+matmul formulation (SKETCH_BACKEND switch)."""
    import jax
    import jax.numpy as jnp

    from tpu_knn.ops import sparse as S

    xs = [DataStore.validate_sparse(p)
          for p in _rand_sparse(rng, 48, universe=300, max_nnz=20)]
    nnz = max(len(p.ids) for p in xs)
    col = np.full((len(xs), nnz), int(S.PAD_X), np.int32)
    val = np.zeros((len(xs), nnz), np.float32)
    for i, pp in enumerate(xs):
        col[i, : len(pp.ids)] = pp.ids
        val[i, : len(pp.ids)] = pp.values
    col, val = jnp.asarray(col), jnp.asarray(val)
    R = S.sketch_matrix(384, 64, seed=7)
    outs = {}
    for backend in ("densify", "gather"):
        S.SKETCH_BACKEND = backend
        jax.clear_caches()
        try:
            outs[backend] = np.asarray(S.sketch_csr(col, val, R, chunk=16))
        finally:
            S.SKETCH_BACKEND = "densify"
    jax.clear_caches()
    np.testing.assert_allclose(outs["gather"], outs["densify"],
                               rtol=1e-4, atol=1e-5)


def test_densify_matches_numpy_oracle_with_ragged_padding(rng):
    """_densify vs a float64 numpy scatter oracle, on rows whose padding
    slot COUNT varies (multiple sentinel slots per row — the shape that
    originally produced duplicate out-of-range scatter indices)."""
    import jax.numpy as jnp

    from tpu_knn.ops import sparse as S

    v_pad = 256
    rows = []
    for nnz_real in (0, 1, 5, 12, 12, 3):  # ragged: 0..12 real ids
        ids = np.sort(rng.choice(np.arange(1, v_pad + 1), size=nnz_real,
                                 replace=False)).astype(np.int32)
        rows.append((ids, rng.standard_normal(nnz_real).astype(np.float32)))
    nnz = 12
    col = np.full((len(rows), nnz), int(S.PAD_X), np.int32)
    val = np.zeros((len(rows), nnz), np.float32)
    for i, (ids, vs) in enumerate(rows):
        col[i, : len(ids)] = ids
        val[i, : len(ids)] = vs
    got = np.asarray(S._densify(jnp.asarray(col), jnp.asarray(val), v_pad))
    want = np.zeros((len(rows), v_pad), np.float64)
    for i, (ids, vs) in enumerate(rows):
        np.add.at(want[i], ids - 1, vs.astype(np.float64))
    np.testing.assert_allclose(got, want.astype(np.float32), atol=1e-6)


def test_no_scatter_hints_in_package():
    """XLA:TPU miscompiles hinted scatters (unique_indices /
    indices_are_sorted) even when the hints are honest — proven
    on-device against host-oracle tables (scripts/r2_sparse_scan_diag4.py:
    wrong entries in 16-row bands; the unhinted scatter is exact at ~6%
    cost). CPU tests cannot catch the miscompile, so this lint pins the
    fix at the source level: no scatter hints anywhere in the package."""
    import io
    import pathlib
    import tokenize

    pkg = pathlib.Path(__file__).resolve().parent.parent / "tpu_knn"
    offenders = []
    for f in pkg.rglob("*.py"):
        code_names = set()
        for tok in tokenize.generate_tokens(io.StringIO(f.read_text()).readline):
            if tok.type == tokenize.NAME:
                code_names.add(tok.string)
        if {"unique_indices", "indices_are_sorted"} & code_names:
            offenders.append(str(f))
    assert not offenders, f"scatter hints reintroduced in: {offenders}"


def test_pair_dots_backends_agree(rng):
    """pair_dots_qdense: the gather backend (a-side densify +
    take_along_axis) and the MXU backend (both-sides densify + batched
    matmul) against an f64 dict oracle, on ragged rows with multi-slot
    sentinel padding and out-of-vocabulary a-side ids (both must drop
    them). The MXU backend exists because the gather formulation is the
    isolated remaining suspect for the 100k sparse wave-program TPU
    worker fault (scripts/r2_sparse_crash_bisect.py)."""
    import jax.numpy as jnp

    from tpu_knn.ops import sparse as S

    b, c, c2, nnz_a, nnz_b, v_pad = 3, 5, 4, 8, 6, 256

    def mk(bn, cn, nnz, pad, oov=False):
        col = np.full((bn, cn, nnz), pad, np.int32)
        val = np.zeros((bn, cn, nnz), np.float32)
        hi = v_pad + (64 if oov else 0)  # some ids beyond the vocabulary
        for i in range(bn):
            for j in range(cn):
                k = int(rng.integers(1, nnz))
                ids = np.sort(rng.choice(np.arange(1, hi + 1), size=k, replace=False))
                col[i, j, :k] = ids
                val[i, j, :k] = rng.standard_normal(k)
        return col, val

    acol, aval = mk(b, c, nnz_a, int(S.PAD_Q), oov=True)
    bcol, bval = mk(b, c2, nnz_b, int(S.PAD_X))
    want = np.zeros((b, c, c2))
    for i in range(b):
        for j in range(c):
            da = {
                int(t): float(v)
                for t, v in zip(acol[i, j], aval[i, j])
                if 1 <= t <= v_pad
            }
            for l in range(c2):
                want[i, j, l] = sum(
                    da.get(int(t), 0.0) * float(v)
                    for t, v in zip(bcol[i, l], bval[i, l])
                    if 1 <= t <= v_pad
                )
    args = (jnp.asarray(acol), jnp.asarray(aval), jnp.asarray(bcol), jnp.asarray(bval))
    old = S.PAIR_BACKEND
    try:
        # "support" (round 4): column-equality match, no densify — the
        # corpus b-side is always in-vocabulary, so OOV a-ids match
        # nothing, exactly like the densify backends' drop
        for backend in ("gather", "mxu", "support"):
            S.PAIR_BACKEND = backend
            got = np.asarray(S.pair_dots_qdense(*args, v_pad))
            np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5, err_msg=backend)
            if backend == "support":
                continue  # no blocked variant (never densifies)
            # blocked lax.map path (budget forces bk=1)
            got = np.asarray(S.pair_dots_qdense(*args, v_pad, budget=(c + c2) * v_pad))
            np.testing.assert_allclose(
                got, want, rtol=1e-5, atol=1e-5, err_msg=f"{backend} blocked"
            )
    finally:
        S.PAIR_BACKEND = old


def test_gather_scoring_backends_agree(rng):
    """support_dots (query-support equality match) must score gathered
    graph candidates identically to the densified-query table path, for
    the dot family and the jaccard membership variant, end-to-end
    through the hnsw traversal."""
    import jax.numpy as jnp

    from tpu_knn.ops import sparse as S

    xs = _rand_sparse(rng, 80, universe=300, max_nnz=16)
    qs = _rand_sparse(rng, 7, universe=300, max_nnz=16)
    old = S.GATHER_SCORING
    try:
        for space_name in ("cosinesimil_sparse", "sparse_jaccard"):
            pts = (
                [(ids, np.ones_like(v)) for ids, v in xs]
                if "jaccard" in space_name
                else xs
            )
            qq = (
                [(ids, np.ones_like(v)) for ids, v in qs]
                if "jaccard" in space_name
                else qs
            )
            idx = Index(space_name, method="hnsw", data_type=DataKind.SPARSE)
            idx.add_sparse_batch(pts)
            idx.build_index(Params(M=8, efConstruction=40, waveSize=32))
            idx.set_query_time_params(Params(efSearch=40))
            outs = {}
            for mode in ("qdense", "support"):
                S.GATHER_SCORING = mode
                d, ids = idx.knn_query_batch(qq, 5)
                outs[mode] = (np.asarray(d), np.asarray(ids))
            np.testing.assert_allclose(
                outs["qdense"][0], outs["support"][0], rtol=1e-5, atol=1e-6,
                err_msg=space_name,
            )
            np.testing.assert_array_equal(
                outs["qdense"][1], outs["support"][1], err_msg=space_name
            )

    finally:
        S.GATHER_SCORING = old


def test_support_dots_matches_oracle(rng):
    """support_dots/support_found vs a dict oracle on ragged data with
    both padding sentinels present."""
    import jax.numpy as jnp

    from tpu_knn.ops import sparse as S

    b, k, nnz, t = 3, 5, 6, 4
    qcol = np.full((b, t), int(S.PAD_Q), np.int64)
    qval = np.zeros((b, t), np.float32)
    cols = np.full((b, k, nnz), int(S.PAD_X), np.int64)
    vals = np.zeros((b, k, nnz), np.float32)
    for i in range(b):
        nq = int(rng.integers(1, t + 1))
        qcol[i, :nq] = np.sort(rng.choice(np.arange(1, 40), nq, replace=False))
        qval[i, :nq] = rng.standard_normal(nq)
        for j in range(k):
            nx = int(rng.integers(1, nnz + 1))
            cols[i, j, :nx] = np.sort(rng.choice(np.arange(1, 40), nx, replace=False))
            vals[i, j, :nx] = rng.standard_normal(nx)
    want_dot = np.zeros((b, k))
    want_found = np.zeros((b, k, nnz))
    for i in range(b):
        dq = {int(c): float(v) for c, v in zip(qcol[i], qval[i]) if c < int(S.PAD_Q)}
        for j in range(k):
            for l in range(nnz):
                c = int(cols[i, j, l])
                if c == int(S.PAD_X):
                    continue
                want_dot[i, j] += dq.get(c, 0.0) * float(vals[i, j, l])
                want_found[i, j, l] = 1.0 if c in dq else 0.0
    got = np.asarray(S.support_dots(
        jnp.asarray(qcol, jnp.int32), jnp.asarray(qval),
        jnp.asarray(cols, jnp.int32), jnp.asarray(vals)))
    np.testing.assert_allclose(got, want_dot, rtol=1e-5, atol=1e-6)
    got_f = np.asarray(S.support_found(
        jnp.asarray(qcol, jnp.int32), jnp.asarray(cols, jnp.int32)))
    np.testing.assert_array_equal(got_f, want_found)


def test_exact_post_repairs_proxy_build(rng):
    """exactPost (opt-in, default 0) re-inserts every point through the
    sketch-proxy-built graph with EXACT host-space traversal — the
    quality repair for bag-of-words near-ties that JL sketches can't
    rank (reference exact-distance construction, hnsw.cc:183-470).
    The repaired graph must be at least as good as the proxy-only one
    on self-recall, and the pass must actually run (graph changes)."""
    from tpu_knn.eval.datasets import sparse_like

    pts = sparse_like(600, vocab=2_000, nnz=24, n_clusters=12, seed=5)
    xs, qs = pts[:512], pts[512:560]

    def build(**kw):
        idx = Index("cosinesimil_sparse", method="hnsw",
                    data_type=DataKind.SPARSE)
        idx.add_sparse_batch(xs)
        idx.build_index(Params(M=8, efConstruction=40, waveSize=64,
                               sketchDim=256, **kw))
        return idx

    ex = Index("cosinesimil_sparse", method="seq_search",
               data_type=DataKind.SPARSE)
    ex.add_sparse_batch(xs)
    _, gold = ex.knn_query_batch(qs, 10)

    def recall(idx):
        idx.set_query_time_params(Params(efSearch=60))
        _, ids = idx.knn_query_batch(qs, 10)
        return float(np.mean([
            len(set(a[a >= 0]) & set(b)) / 10 for a, b in zip(np.asarray(ids), np.asarray(gold))
        ]))

    base = build(exactPost=0)
    rep = build(exactPost=1)  # opt-in (measured marginal at 100k)
    g0 = np.asarray(base.method.graph["level0"])
    g1 = np.asarray(rep.method.graph["level0"])
    assert not np.array_equal(g0, g1)  # the pass ran and changed edges
    r0, r1 = recall(base), recall(rep)
    assert r1 >= r0 - 0.02  # repair never meaningfully hurts

    # exactShrink (opt-in): the merge/reverse shrink decisions run in
    # the exact host space instead of proxy scores (ADVICE r3 asymmetry
    # fix). The pass must change edges and never meaningfully hurt
    # (toy drive measured +0.044 recall at 2k docs).
    shr = build(exactShrink=1)
    g2 = np.asarray(shr.method.graph["level0"])
    assert not np.array_equal(g0, g2)
    assert recall(shr) >= r0 - 0.02
