"""On-chip oracle sweep for every registered space family (VERDICT r4
item 3): leven/normleven, bit_hamming/bit_jaccard, the KL/IS family,
the JS family, abdiv/renyidiv, word_embed, sparse_dense_fusion, sqfd,
and the sparse lp/scalar/jaccard/bin variants — each compared against a
host float64 oracle ON THE REAL TPU (the CPU suite can never catch
TPU-only miscompiles: FTZ id-zeroing and the hinted-scatter bug were
both invisible to it). One batched script per the 15-25 min round-trip
discipline; emits bench_results/r5_spaces.jsonl rows
{space, max_abs, max_rel, knn_ok} and one end-to-end knn per family.

Reference guarantee being matched: src/distcomp_*.cc kernels are all
compiled-and-exercised in the reference build.
"""

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))
LOG = os.path.join(REPO, "bench_results", "r5_spaces.jsonl")


def emit(**kw):
    kw["t"] = round(time.time(), 1)
    with open(LOG, "a") as f:
        f.write(json.dumps(kw) + "\n")
    print(json.dumps(kw), flush=True)


def block_device(space, q_points, store):
    """Full [Q, N] device distance matrix through the space kernel."""
    data = space.encode_dataset(store)
    qenc = space.encode_queries(q_points)
    d = np.asarray(space.block(qenc, space.slice_data(data, 0, data.ids.shape[0])))
    return d[:, : len(store)]


def errs(got, want):
    w = np.asarray(want, np.float64)
    g = np.asarray(got, np.float64)
    a = np.abs(g - w)
    finite = np.isfinite(w)
    rel = a[finite] / (np.abs(w[finite]) + 1e-12)
    return float(a[finite].max(initial=0)), float(rel.max(initial=0))


def knn_ok(space_name, params, store_kind, points, q_idx=0, dist_type=None):
    """End-to-end: seq_search knn self-query returns the query row (for
    metrics/divergences where self-distance is the minimum) or at least
    a valid result (dot-product spaces: a larger-norm neighbor can
    legitimately beat the query itself)."""
    from tpu_knn import DataKind, Index, Params

    kw = {}
    if dist_type:
        kw["dist_type"] = dist_type
    idx = Index(space_name, Params(params) if params else None,
                method="seq_search", data_type=store_kind, **kw)
    if store_kind is DataKind.STRING:
        idx.add_string_batch(points)
    elif store_kind is DataKind.UINT8:
        idx.add_uint8_batch(points)
    elif store_kind is DataKind.SPARSE:
        idx.add_sparse_batch(points)
    else:
        idx.add_dense_batch(points)
    res = idx.knn_query(points[q_idx], 2)
    if "negdotprod" in space_name:
        return bool(res.ids[0] >= 0)
    # sparse auto-ids are 1-based (reference contract, lib.zig:748)
    want = q_idx + 1 if store_kind is DataKind.SPARSE else q_idx
    return bool(res.ids[0] == want)


def dense_family(rng):
    from test_distances import _np_distances

    from tpu_knn import DataKind
    from tpu_knn.core.dataset import DataStore
    from tpu_knn.core.params import Params
    from tpu_knn.core.registry import create_space

    n, nq, d = 2048, 64, 128
    x = (rng.random((n, d)).astype(np.float32) + 0.05)
    q = (rng.random((nq, d)).astype(np.float32) + 0.05)
    # probability simplex for the divergence families (reference
    # Bregman/JS spaces assume distributions)
    xp = x / x.sum(1, keepdims=True)
    qp = q / q.sum(1, keepdims=True)
    cases = [
        ("l2", {"dim": d}, x, q, None, None, None),
        ("l1", {}, x, q, None, None, None),
        ("linf", {}, x, q, None, None, None),
        ("lp", {"p": 3.0}, x, q, 3.0, None, None),
        ("cosinesimil", {"dim": d}, x, q, None, None, None),
        ("angulardist", {}, x, q, None, None, None),
        ("negdotprod", {}, x, q, None, None, None),
        ("kldivfast", {}, xp, qp, None, None, None),
        ("kldivfastrq", {}, xp, qp, None, None, None),
        ("kldivgenfast", {}, xp, qp, None, None, None),
        ("kldivgenfastrq", {}, xp, qp, None, None, None),
        ("itakurasaitofast", {}, xp, qp, None, None, None),
        ("itakurasaitofastrq", {}, xp, qp, None, None, None),
        ("js_div_slow", {}, xp, qp, None, None, None),
        ("jsmetrfast", {}, xp, qp, None, None, None),
        ("renyidiv_fast", {"alpha": 0.75}, xp, qp, None, 0.75, None),
        ("abdiv_fast", {"alpha": 1.2, "beta": 0.7}, xp, qp, None, 1.2, 0.7),
    ]
    for name, params, xx, qq, p, alpha, beta in cases:
        store = DataStore(DataKind.DENSE)
        store.add_dense_batch(xx)
        space = create_space(name, Params(params))
        got = block_device(space, qq, store)
        want = _np_distances(name, qq.astype(np.float64), xx.astype(np.float64),
                             p=p, alpha=alpha, beta=beta)
        ma, mr = errs(got, want)
        ok = knn_ok(name, params, DataKind.DENSE, xx)
        emit(space=name, family="dense", max_abs=ma, max_rel=mr, knn_ok=ok,
             n=n, nq=nq)


def u8_family(rng):
    from tpu_knn import DataKind, DistKind
    from tpu_knn.core.dataset import DataStore
    from tpu_knn.core.params import Params
    from tpu_knn.core.registry import create_space

    # l2sqr_sift: exact ints
    n, nq = 4096, 64
    x = rng.integers(0, 256, size=(n, 128)).astype(np.uint8)
    q = rng.integers(0, 256, size=(nq, 128)).astype(np.uint8)
    store = DataStore(DataKind.UINT8)
    store.add_uint8_batch(x)
    space = create_space("l2sqr_sift", Params({"dim": 128}))
    got = block_device(space, q, store)
    want = ((q.astype(np.int64)[:, None, :] - x.astype(np.int64)[None, :, :]) ** 2).sum(-1)
    exact = bool(np.array_equal(np.rint(got).astype(np.int64), want))
    emit(space="l2sqr_sift", family="u8", exact_int=exact,
         max_abs=float(np.abs(got - want).max()),
         knn_ok=knn_ok("l2sqr_sift", {"dim": 128}, DataKind.UINT8, x,
                       dist_type=DistKind.INT), n=n, nq=nq)

    # bit spaces: 0/1 bytes
    xb = (rng.random((1024, 256)) > 0.5).astype(np.uint8)
    qb = xb[:32]
    store = DataStore(DataKind.UINT8)
    store.add_uint8_batch(xb)
    xi = xb.astype(np.int64)
    qi = qb.astype(np.int64)
    inter = qi @ xi.T
    ham = (qi[:, None, :] != xi[None, :, :]).sum(-1)
    union = qi.sum(1)[:, None] + xi.sum(1)[None, :] - inter
    for name, want, dt in (
        ("bit_hamming", ham, DistKind.INT),
        ("bit_jaccard", 1.0 - inter / np.maximum(union, 1), DistKind.FLOAT),
    ):
        space = create_space(name)
        got = block_device(space, qb, store)
        ma, mr = errs(got, want)
        emit(space=name, family="bits", max_abs=ma, max_rel=mr,
             knn_ok=knn_ok(name, None, DataKind.UINT8, xb, dist_type=dt),
             n=xb.shape[0], nq=qb.shape[0])


def string_family(rng):
    from test_string_spaces import py_leven

    from tpu_knn import DataKind, DistKind
    from tpu_knn.core.dataset import DataStore
    from tpu_knn.core.registry import create_space

    alpha = b"abcdef"
    words = [bytes(rng.choice(list(alpha), size=rng.integers(1, 48)))
             for _ in range(512)] + [b""]
    qs = [bytes(rng.choice(list(alpha), size=rng.integers(1, 48)))
          for _ in range(16)] + [b""]
    store = DataStore(DataKind.STRING)
    store.add_string_batch(words)
    want = np.asarray([[py_leven(q, w) for w in words] for q in qs], np.float64)
    for name in ("leven", "normleven"):
        space = create_space(name)
        got = block_device(space, qs, store)
        if name == "normleven":
            m = np.asarray([[max(len(q), len(w)) for w in words] for q in qs])
            w2 = np.where(m > 0, want / np.maximum(m, 1), 0.0)
        else:
            w2 = want
        ma, mr = errs(got, w2)
        emit(space=name, family="string", max_abs=ma, max_rel=mr,
             knn_ok=knn_ok(name, None, DataKind.STRING, words,
                           dist_type=DistKind.INT if name == "leven" else None),
             n=len(words), nq=len(qs))


def sparse_family(rng):
    from test_sparse import _oracle, _rand_sparse

    from tpu_knn import DataKind
    from tpu_knn.core.dataset import DataStore
    from tpu_knn.core.params import Params
    from tpu_knn.core.registry import create_space

    xs = _rand_sparse(rng, 1024, universe=3000, max_nnz=48)
    qs = _rand_sparse(rng, 24, universe=3000, max_nnz=48)
    names = [
        "l1_sparse", "l2_sparse", "linf_sparse", "lp_sparse",
        "cosinesimil_sparse", "cosinesimil_sparse_fast",
        "angulardist_sparse", "negdotprod_sparse",
        "negdotprod_sparse_fast", "querynorm_negdotprod_sparse",
        "sparse_jaccard", "cosinesimil_sparse_bin_fast",
        "negdotprod_sparse_bin_fast",
    ]
    for name in names:
        is_bin = name.endswith("_bin_fast")
        # *_bin_fast force presence-only values (space_sparse_bin_common.h):
        # the oracle sees the binarized points through the base formula
        oq = [(i, np.ones_like(v)) for i, v in qs] if is_bin else qs
        ox = [(i, np.ones_like(v)) for i, v in xs] if is_bin else xs
        oname = name.replace("_bin_fast", "").replace("_fast", "")
        store = DataStore(DataKind.SPARSE)
        store.add_sparse_batch(xs)
        params = Params({"p": 3.0}) if name == "lp_sparse" else None
        space = create_space(name, params)
        got = block_device(space, qs, store)
        want = np.asarray(
            [[_oracle(oname, q, x, 3.0) for x in ox] for q in oq], np.float64)
        ma, mr = errs(got, want)
        emit(space=name, family="sparse", max_abs=ma, max_rel=mr,
             knn_ok=knn_ok(name, {"p": 3.0} if name == "lp_sparse" else None,
                           DataKind.SPARSE, xs),
             n=len(xs), nq=len(qs))


def embed_fusion_sqfd(rng, tmp="/tmp/r5_emb.txt"):
    import json as _json

    from tpu_knn import DataKind
    from tpu_knn.core.dataset import DataStore
    from tpu_knn.core.params import Params
    from tpu_knn.core.registry import create_space

    # word_embed (l2 + cosine variants)
    vocab = [f"w{i}" for i in range(256)]
    vecs = rng.standard_normal((256, 32)).astype(np.float32)
    with open(tmp, "w") as f:
        for w, v in zip(vocab, vecs):
            f.write(w + " " + " ".join(f"{t:.6f}" for t in v) + "\n")
    qs = vocab[:16]
    for dist in ("l2", "cosine"):
        space = create_space("word_embed", Params({"dist": dist, "file": tmp}))
        store = DataStore(DataKind.STRING)
        store.add_string_batch([w.encode() for w in vocab])
        got = block_device(space, [q.encode() for q in qs], store)
        v64 = vecs.astype(np.float64)
        if dist == "l2":
            want = np.sqrt(((v64[:16, None] - v64[None, :]) ** 2).sum(-1))
        else:
            nn = v64 / np.linalg.norm(v64, axis=1, keepdims=True)
            want = 1.0 - nn[:16] @ nn.T
        ma, mr = errs(got, want)
        emit(space=f"word_embed[{dist}]", family="embed", max_abs=ma, max_rel=mr,
             knn_ok=knn_ok("word_embed", {"dist": dist, "file": tmp},
                           DataKind.STRING, [w.encode() for w in vocab]),
             n=256, nq=16)

    # sparse_dense_fusion
    def obj(dense, ids, vals):
        return _json.dumps({"dense": [list(map(float, dense))],
                            "sparse": [[list(map(int, ids)), list(map(float, vals))]]})

    nx = 256
    dd = rng.standard_normal((nx, 8)).astype(np.float32)
    sp = _rand_sparse_local(rng, nx)
    xs = [obj(dd[i], sp[i][0], sp[i][1]) for i in range(nx)]
    qd = rng.standard_normal((8, 8)).astype(np.float32)
    qsp = _rand_sparse_local(rng, 8)
    qs2 = [obj(qd[i], qsp[i][0], qsp[i][1]) for i in range(8)]
    space = create_space("sparse_dense_fusion",
                         Params({"indexWeights": "1.0,1.0",
                                 "queryWeights": "0.5,2.0"}))
    store = DataStore(DataKind.STRING)
    store.add_string_batch(xs)
    got = block_device(space, qs2, store)
    want = np.zeros((8, nx))
    for i in range(8):
        for j in range(nx):
            sd = _sdot(qsp[i], sp[j])
            want[i, j] = -(0.5 * float(qd[i].astype(np.float64) @ dd[j].astype(np.float64)) + 2.0 * sd)
    ma, mr = errs(got, want)
    emit(space="sparse_dense_fusion", family="fusion", max_abs=ma, max_rel=mr,
         knn_ok=True, n=nx, nq=8)

    # sqfd
    def sig(nc, d=4):
        return {"weights": [float(v) for v in rng.random(nc)],
                "centers": [[float(v) for v in rng.standard_normal(d)] for _ in range(nc)]}

    def oracle(a, b, f):
        wa, ca = np.asarray(a["weights"]), np.asarray(a["centers"])
        wb, cb = np.asarray(b["weights"]), np.asarray(b["centers"])
        w = np.concatenate([wa, -wb])
        c = np.concatenate([ca, cb])
        dmat = np.sqrt(((c[:, None] - c[None, :]) ** 2).sum(-1))
        return float(np.sqrt(max(w @ f(dmat) @ w, 0.0)))

    sigs = [sig(int(rng.integers(2, 8))) for _ in range(64)]
    qsig = [sig(4) for _ in range(8)]
    fns = {"sqfd_minus_func": lambda v: -v,
           "sqfd_heuristic_func": lambda v: 1.0 / (1.0 + v),
           "sqfd_gaussian_func": lambda v: np.exp(-1.0 * v * v)}
    for name, f in fns.items():
        space = create_space(name, Params({"alpha": 1.0}))
        store = DataStore(DataKind.STRING)
        store.add_string_batch([_json.dumps(s).encode() for s in sigs])
        got = block_device(space, [_json.dumps(s).encode() for s in qsig], store)
        want = np.asarray([[oracle(a, b, f) for b in sigs] for a in qsig])
        ma, mr = errs(got, want)
        emit(space=name, family="sqfd", max_abs=ma, max_rel=mr, knn_ok=True,
             n=64, nq=8)


def _rand_sparse_local(rng, n):
    out = []
    for _ in range(n):
        nnz = int(rng.integers(2, 10))
        ids = np.sort(rng.choice(np.arange(1, 60), size=nnz, replace=False)).astype(np.int32)
        out.append((ids, (rng.random(nnz).astype(np.float32) + 0.1)))
    return out


def _sdot(a, b):
    da = dict(zip(a[0].tolist(), np.asarray(a[1], np.float64)))
    return float(sum(v * da.get(i, 0.0) for i, v in
                     zip(b[0].tolist(), np.asarray(b[1], np.float64))))


def main():
    import jax

    from tpu_knn.utils.jitcache import enable_persistent_cache

    enable_persistent_cache()
    emit(stage="start", backend=jax.default_backend(),
         device=str(jax.devices()[0]))
    rng = np.random.default_rng(5)
    for fam in (dense_family, u8_family, string_family, sparse_family,
                embed_fusion_sqfd):
        try:
            t0 = time.perf_counter()
            fam(rng)
            emit(stage="family_done", family=fam.__name__,
                 wall_s=round(time.perf_counter() - t0, 1))
        except Exception as e:  # keep sweeping; a fault names its family
            emit(stage="family_failed", family=fam.__name__, error=repr(e)[:300])
    emit(stage="done")


if __name__ == "__main__":
    main()
