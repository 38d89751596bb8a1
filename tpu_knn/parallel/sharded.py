"""Multi-chip search: corpus sharded over a mesh, queries replicated,
per-shard top-k merged over ICI (SURVEY.md §7 step 9).

Two tiers:

  * :func:`sharded_exact_knn` — the distributed seq_search / gold
    standard. Each device scans its corpus shard with the streaming
    top-k and the per-shard results are merged with one all_gather +
    top-k (the log-tree merge is left to XLA's all_gather lowering).
    This is the TPU-native version of the reference's thread-sharded
    scan + merge (seqsearch.cc:73-98, 163-176).

  * :class:`ShardedHnsw`-style stacked-subgraph search in
    methods/hnsw_sharded.py builds one HNSW per shard and runs the
    batched beam search on every shard in parallel, merging top-k the
    same way.

All functions take/return replicated query-major arrays; sharding is an
internal layout decision, which is exactly how pjit wants it.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..ops import topk as T
from .mesh import SHARD_AXIS

from jax.sharding import Mesh, PartitionSpec as P


def _local_exact_knn(space, qenc, xc_local, ids_local, k: int, precision: str):
    """Top-k over one local corpus block (already in VMEM-friendly form).
    A shard may hold FEWER than k rows (k <= corpus size is legitimate
    while k > n/S): clamp the local top-k and pad to k with inf/-1 so
    the cross-shard merge sees uniform widths."""
    d = space.block(qenc, xc_local, precision)  # [Q, N_local]
    kk = min(k, d.shape[1])
    dk, pos = T.smallest_k(d, kk)
    ids = jnp.where(pos >= 0, ids_local[jnp.clip(pos, 0, ids_local.shape[0] - 1)], -1)
    ids = jnp.where(jnp.isinf(dk), -1, ids)
    if kk < k:
        dk = jnp.pad(dk, ((0, 0), (0, k - kk)), constant_values=jnp.inf)
        ids = jnp.pad(ids, ((0, 0), (0, k - kk)), constant_values=-1)
    return dk, ids


def sharded_exact_knn(
    space,
    qenc: dict,
    data,
    k: int,
    mesh: Mesh,
    precision: str = "float32",
    axis: str = SHARD_AXIS,
):
    """Exact kNN with the corpus sharded across ``mesh``.

    Works for every space: the corpus arrays come from
    space.corpus_dict (vecs/pad/term plus space-specific keys like
    sparse cols) and are row-sharded over the mesh axis; queries stay
    replicated. ``data``'s row count must be divisible by the mesh size
    (encode with row_multiple = 8 * mesh.size). Returns replicated
    (dists[Q,k], ids[Q,k])."""
    corpus = space.corpus_dict(data)
    # the shard-local scan slices whole rows (no gathers), so the explicit
    # pad/term arrays are the right form here — undo the gather-oriented
    # static-count/term-recompute conventions of corpus_dict
    corpus.pop("count", None)
    corpus.pop("row_mask", None)
    corpus["pad"] = data.extra["pad"]
    if "term" not in corpus and getattr(data, "row_term", None) is not None:
        corpus["term"] = data.row_term

    return _sharded_exact_jit(
        space, qenc, corpus, data.ids, k, mesh, precision, axis
    )


@partial(jax.jit, static_argnames=("space", "k", "mesh", "precision", "axis"))
def _sharded_exact_jit(space, qenc, corpus, ids, k, mesh, precision, axis):
    """Jitted so repeat query batches reuse the compiled program (a bare
    shard_map closure re-traces per call — ~minutes per trace at 1M over
    the dev tunnel; same pattern as hnsw_sharded._sharded_search)."""

    def local(qenc_l, corpus_l, ids_l):
        xc = {"x": corpus_l["vecs"], "pad": corpus_l["pad"]}
        if corpus_l.get("term") is not None:
            xc["x_term"] = corpus_l["term"]
        for key, arr in corpus_l.items():
            if key not in ("vecs", "pad", "term"):
                xc[key] = arr
        dk, ids_k = _local_exact_knn(space, qenc_l, xc, ids_l, k, precision)
        return merge_sharded_topk(dk, ids_k, k, axis)

    f = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(
            jax.tree_util.tree_map(lambda _: P(), qenc),
            # vocab_mark is a replicated static-width carrier, not
            # row-sharded corpus data (sharding it would shrink the
            # densify table and silently mis-score)
            {k_: (P() if k_ == "vocab_mark" else P(axis)) for k_ in corpus},
            P(axis),
        ),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return f(qenc, corpus, ids)


class DistributedSeqSearch:
    """Method-protocol adapter for the sharded exact scan, so
    ``Index(..., method="seq_search", mesh=...)`` routes queries through
    :func:`sharded_exact_knn` (the TPU-native analog of the reference's
    thread-sharded scan + merge, seqsearch.cc:73-98). Data lives
    row-sharded over the mesh; queries are replicated; the per-shard
    top-k merges over ICI."""

    name = "seq_search"
    supports_range = True
    supports_incremental = False
    progress = False

    def __init__(self, space, mesh: Mesh, index_params=None, axis: str = SHARD_AXIS):
        from ..core.params import ParamManager, Params

        self.space = space
        self.mesh = mesh
        self.axis = axis
        pm = ParamManager(Params.of(index_params))
        self.precision = pm.get("precision", "float32", str)
        pm.check_unused()
        self.data = None
        self.graph = None
        self.dist_comps = 0
        self.store = None

    def aux_device_arrays(self):
        return ()

    def create_index(self, store, params=None) -> None:
        self.store = store
        s = self.mesh.devices.size
        # rows divisible by the mesh AND each shard slice 8-row aligned
        self.data = self.space.encode_dataset(store, row_multiple=8 * s)
        from jax.sharding import NamedSharding

        sh = NamedSharding(self.mesh, P(self.axis))
        put = lambda a: jax.device_put(a, sh) if hasattr(a, "ndim") and a.ndim >= 1 and a.shape[0] == self.data.ids.shape[0] else a
        self.data = jax.tree_util.tree_map(put, self.data)

    def set_query_time_params(self, params) -> None:
        pass  # the exact scan has no query-time knobs

    def knn(self, points, k: int):
        import numpy as np

        from ..core.errors import IndexNotBuiltError

        if self.data is None:
            raise IndexNotBuiltError("seq_search: index not built")
        qenc = self.space.encode_queries(points)
        kk = min(k, int(self.data.count)) if self.data.count else k
        d, ids = sharded_exact_knn(
            self.space, qenc, self.data, max(kk, 1), self.mesh, self.precision, self.axis
        )
        d, ids = np.asarray(d), np.asarray(ids)
        if kk < k:
            d = np.pad(d, ((0, 0), (0, k - kk)), constant_values=np.inf)
            ids = np.pad(ids, ((0, 0), (0, k - kk)), constant_values=-1)
        self.dist_comps += d.shape[0] * int(self.data.count)
        bad = ~np.isfinite(d) | (d >= 1e29)
        return np.where(bad, np.inf, d), np.where(bad, -1, ids)

    def range(self, points, radius: float):
        """Sharded exact range scan: per-shard radius scan + associative
        all_gather merge (reference per-thread range merge,
        seqsearch.cc:128-139). Same [(ids, dists)] contract as the
        single-device seq_search."""
        import numpy as np

        from ..core.errors import IndexNotBuiltError

        if self.data is None:
            raise IndexNotBuiltError("seq_search: index not built")
        qenc = self.space.encode_queries(points)
        counts, dk, ids = sharded_range(
            self.space, qenc, self.data, radius, self.mesh, self.precision,
            self.axis,
        )
        self.dist_comps += counts.shape[0] * int(self.data.count)
        f32 = np.zeros(0, np.float32)
        if dk is None:
            return [(np.zeros(0, np.int32), f32) for _ in range(counts.shape[0])]
        dk, ids = np.asarray(dk), np.asarray(ids)
        return [
            (ids[i, :c].copy(), dk[i, :c].copy()) for i, c in enumerate(counts)
        ]

    def add_batch(self, store, new_positions):
        from ..core.errors import RuntimeNmsError

        raise RuntimeNmsError("distributed seq_search does not support incremental addition")

    def delete_batch(self, positions, strategy="none"):
        from ..core.errors import RuntimeNmsError

        raise RuntimeNmsError("distributed seq_search does not support deletion")

    # persistence: nothing beyond the data store (restore re-encodes)
    def state_arrays(self) -> dict:
        return {}

    def restore(self, store, state, params=None) -> None:
        self.create_index(store, params)


def sharded_range(
    space,
    qenc: dict,
    data,
    radius: float,
    mesh: Mesh,
    precision: str = "float32",
    axis: str = SHARD_AXIS,
):
    """Exact range search with the corpus sharded across ``mesh``
    (VERDICT r4 item 7; reference semantics: seqsearch.cc:109-141 scan +
    the per-thread range merge of seqsearch.cc:128-139). Two passes like
    the single-device streamed scan (methods/seq_search.range): a
    counts pass (per-shard hit count, psum over the mesh axis), then a
    collect pass sized by the global max count — per-shard ascending
    smallest-cap within radius, merged with the same associative
    all_gather + re-top-k used for kNN. Returns (counts[Q],
    dists[Q,cap], ids[Q,cap]) with (+inf, -1) past each query's count;
    cap==0 collapses to empty results."""
    from ..core.dataset import round_up

    corpus = space.corpus_dict(data)
    corpus.pop("count", None)
    corpus.pop("row_mask", None)
    corpus["pad"] = data.extra["pad"]
    if "term" not in corpus and getattr(data, "row_term", None) is not None:
        corpus["term"] = data.row_term
    import numpy as np

    counts = np.asarray(_sharded_range_counts_jit(
        space, qenc, corpus, float(radius), mesh, precision, axis
    ))
    if counts.max(initial=0) == 0:
        return counts, None, None
    cap = min(int(round_up(int(counts.max()), 128)), data.ids.shape[0])
    dk, ids = _sharded_range_collect_jit(
        space, qenc, corpus, data.ids, float(radius), cap, mesh, precision, axis
    )
    return counts, dk, ids


def _local_corpus_block(space, qenc_l, corpus_l, precision):
    """Distance block [Q, n_local] over one shard's corpus rows (padding
    rows carry the 1e30 term so they fail every radius test)."""
    xc = {"x": corpus_l["vecs"], "pad": corpus_l["pad"]}
    if corpus_l.get("term") is not None:
        xc["x_term"] = corpus_l["term"]
    for key, arr in corpus_l.items():
        if key not in ("vecs", "pad", "term"):
            xc[key] = arr
    return space.block(qenc_l, xc, precision)


@partial(jax.jit, static_argnames=("space", "mesh", "precision", "axis"))
def _sharded_range_counts_jit(space, qenc, corpus, radius, mesh, precision, axis):
    def local(qenc_l, corpus_l):
        d = _local_corpus_block(space, qenc_l, corpus_l, precision)
        c = jnp.sum((d <= radius).astype(jnp.int32), axis=1)
        return jax.lax.psum(c, axis)

    f = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(
            jax.tree_util.tree_map(lambda _: P(), qenc),
            {k_: (P() if k_ == "vocab_mark" else P(axis)) for k_ in corpus},
        ),
        out_specs=P(),
        check_vma=False,
    )
    return f(qenc, corpus)


@partial(jax.jit, static_argnames=("space", "cap", "mesh", "precision", "axis"))
def _sharded_range_collect_jit(
    space, qenc, corpus, ids, radius, cap, mesh, precision, axis
):
    def local(qenc_l, corpus_l, ids_l):
        d = _local_corpus_block(space, qenc_l, corpus_l, precision)
        d = jnp.where(d <= radius, d, jnp.inf)
        kk = min(cap, d.shape[1])
        dk, pos = T.smallest_k(d, kk)
        out_ids = jnp.where(
            pos >= 0, ids_l[jnp.clip(pos, 0, ids_l.shape[0] - 1)], -1
        )
        out_ids = jnp.where(jnp.isinf(dk), -1, out_ids)
        if kk < cap:
            dk = jnp.pad(dk, ((0, 0), (0, cap - kk)), constant_values=jnp.inf)
            out_ids = jnp.pad(out_ids, ((0, 0), (0, cap - kk)), constant_values=-1)
        return merge_sharded_topk(dk, out_ids, cap, axis)

    f = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(
            jax.tree_util.tree_map(lambda _: P(), qenc),
            {k_: (P() if k_ == "vocab_mark" else P(axis)) for k_ in corpus},
            P(axis),
        ),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return f(qenc, corpus, ids)


def merge_sharded_topk(dists, ids, k: int, axis: str = SHARD_AXIS):
    """Inside-shard_map helper: all_gather + re-top-k (ascending)."""
    all_d = jax.lax.all_gather(dists, axis, axis=0)
    all_i = jax.lax.all_gather(ids, axis, axis=0)
    s, q, kk = all_d.shape
    md = jnp.moveaxis(all_d, 0, 1).reshape(q, s * kk)
    mi = jnp.moveaxis(all_i, 0, 1).reshape(q, s * kk)
    return T.smallest_k(md, k, mi)


def sharded_exact_knn_hier(
    space,
    qenc: dict,
    data,
    k: int,
    mesh: Mesh,
    precision: str = "float32",
):
    """Exact kNN over a two-tier [dcn, ici] mesh (parallel/mesh.py
    make_mesh2): the corpus is row-sharded over BOTH axes jointly and
    the per-shard top-k merges hierarchically — first an all_gather over
    the fast ICI axis (intra-slice), then over the slow DCN axis, which
    therefore carries only k results per query per slice. This is the
    multi-host tier of SURVEY.md §7 step 9; exactness is unchanged
    (top-k merge is associative)."""
    from .mesh import DCN_AXIS, ICI_AXIS

    corpus = space.corpus_dict(data)
    corpus.pop("count", None)
    corpus.pop("row_mask", None)
    corpus["pad"] = data.extra["pad"]
    if "term" not in corpus and getattr(data, "row_term", None) is not None:
        corpus["term"] = data.row_term
    return _sharded_exact_hier_jit(space, qenc, corpus, data.ids, k, mesh, precision)


@partial(jax.jit, static_argnames=("space", "k", "mesh", "precision"))
def _sharded_exact_hier_jit(space, qenc, corpus, ids, k, mesh, precision):
    from .mesh import DCN_AXIS, ICI_AXIS

    def local(qenc_l, corpus_l, ids_l):
        xc = {"x": corpus_l["vecs"], "pad": corpus_l["pad"]}
        if corpus_l.get("term") is not None:
            xc["x_term"] = corpus_l["term"]
        for key, arr in corpus_l.items():
            if key not in ("vecs", "pad", "term"):
                xc[key] = arr
        dk, ids_k = _local_exact_knn(space, qenc_l, xc, ids_l, k, precision)
        d1, i1 = merge_sharded_topk(dk, ids_k, k, ICI_AXIS)  # intra-slice
        return merge_sharded_topk(d1, i1, k, DCN_AXIS)  # cross-host: [Q,k] only

    both = (DCN_AXIS, ICI_AXIS)
    f = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(
            jax.tree_util.tree_map(lambda _: P(), qenc),
            {k_: (P() if k_ == "vocab_mark" else P(both)) for k_ in corpus},
            P(both),
        ),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return f(qenc, corpus, ids)
