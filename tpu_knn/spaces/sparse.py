"""Sparse vector spaces over padded CSR (SURVEY.md §2.3 sparse rows).

Covers the reference families:
  * "slow" sparse Lp / scalar-product spaces
    (include/space/space_sparse_vector.h, space_sparse_lp.h,
    space_sparse_scalar.h),
  * the "_fast" block-packed SIMD variants
    (include/space/space_sparse_scalar_fast.h,
    src/distcomp_sparse_scalar_fast.cc) — on TPU slow/fast share one
    kernel (the CPU distinction is a storage/SIMD format, not a
    semantic one), so the ``*_fast`` names register the same classes,
  * the binary (presence-only) "_bin_fast" variants
    (include/space/space_sparse_bin_common.h) — values forced to 1,
  * sparse_jaccard (include/space/space_sparse_jaccard.h).

Element ids obey the API contract: >= 1, strictly increasing
(reference: lib.zig:728-738). The padded-CSR layout and the batched
sorted-lookup kernel are described in ops/sparse.py.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from ..core.dataset import (
    DataKind,
    DataStore,
    DenseDeviceData,
    DistKind,
    SparseDeviceData,
    SparsePoint,
    round_up,
)
from ..core.errors import InvalidArgumentError
from ..core.params import ParamManager, Params
from ..core.registry import register_space
from ..ops import sparse as S
from .base import Space
from .dense import PAD_TERM

_TINY = 1e-10

#: Max padded vocabulary for the dense-after-scatter dot fast path
#: (ops/sparse.py dot_blocked_dense): a [chunk, V] f32 block must stay
#: VMEM/HBM-friendly and [Q, V] bounded for the densified queries.
VOCAB_DENSE_MAX = 65536


def _pack_csr(points: list[SparsePoint], n_pad: int, nnz_mult: int = 8, pad_col=S.PAD_X):
    """Pack SparsePoints into padded CSR host arrays. The packing loop is
    native C++ when built (native/tpu_knn_native.cpp tk_pack_csr, the
    ParallelFor-style host runtime); numpy fallback otherwise."""
    from ..io import native

    nnz_max = max((len(p.ids) for p in points), default=1)
    nnz_max = round_up(max(nnz_max, 1), nnz_mult)
    n = len(points)
    row_len = np.asarray([len(p.ids) for p in points], np.int32)
    ids = (
        np.concatenate([p.ids for p in points]).astype(np.int32)
        if n
        else np.zeros(0, np.int32)
    )
    vals = (
        np.concatenate([p.values for p in points]).astype(np.float32)
        if n
        else np.zeros(0, np.float32)
    )
    col, val, length = native.pack_csr(row_len, ids, vals, n_pad, nnz_max, int(pad_col))
    return col, val, length


class SketchProxySpace:
    """Ordering-only dense stand-in for a sparse space over JL sketches.

    Graph methods (HNSW/SW-graph) only ever *compare* distances — beam
    merges, greedy descent, the neighbor-selection heuristic — so any
    score that preserves the host space's per-query ordering works for
    traversal and construction. This proxy scores d = -<s_q, s_x> on
    dense random-projection sketches (ops/sparse.sketch_matrix /
    sketch_csr): with rows pre-normalized by the host space's
    _sketch_vals it approximates the cosine-family ordering, raw it
    approximates (neg)dot. Exactness comes from the host space's final
    re-rank of the beam (methods/hnsw.py), never from the proxy.

    TPU rationale: construction scoring through per-candidate densified
    tables / element gathers faulted the worker and ran ~200x slower
    than dense waves (round-1 postmortem); the proxy makes sparse graph
    builds byte-identical to the proven dense MXU path.
    """

    term_recompute = False
    name = "sketch_proxy"

    def __init__(self, dim: int, post=None):
        self.dim = dim
        # host-space monotone map from the -<s_q,s_x> estimate to that
        # space's distance scale, so proxy values can be compared against
        # exactly-computed distances during hybrid construction
        self._post = post if post is not None else (lambda s: s)

    def pass1_affine(self):
        return (-1.0, 0.0, 0.0)

    def pass1_post(self, s, qenc):
        return self._post(s)

    def rows_as_queries(self, rows):
        # construction queries ARE the sketch rows (methods/hnsw.py sets
        # qenc_all = {"q": pdata.vecs}); any sketch row is its own query
        return {"q": rows}

    def corpus_dict(self, data) -> dict:
        # count: static pad masking in gather paths (no pad gather)
        return {"vecs": data.vecs, "pad": data.extra["pad"], "count": data.count}

    def block(self, qenc, xc, precision: str = "float32"):
        from ..ops import distance as Dops

        s = Dops.negdot_blocked(qenc["q"], xc["x"], precision)
        return self._post(s) + xc["pad"][None, :]


class SparseSpaceBase(Space):
    """Shared encode machinery for sparse float spaces."""

    data_kind = DataKind.SPARSE
    dist_kind = DistKind.FLOAT
    np_dtype = np.float32
    #: Sparse blocks materialize [Q, C, nnz]; keep corpus chunks modest.
    preferred_chunk = 256
    #: The exact scan's two-pass group-min path re-scores candidates via
    #: a [Q, kg*128, nnz] q_dense gather that measured 6.5x the whole
    #: single-pass program at 100k (methods/seq_search.py knn) — sparse
    #: scans stay single-pass.
    twopass_ok = False
    binary = False  # presence-only variants force values to 1
    #: subclasses whose distance factors through dot / intersection
    #: counts opt into the dense-after-scatter fast path
    dense_dot_ok = False
    #: subclasses whose per-query ordering factors through <q, x> opt
    #: into sketch-proxy graph construction (see SketchProxySpace)
    sketch_ok = False

    def _sketch_vals(self, col, val, length):
        """CSR values to project for the sketch (per-space normalization
        so that -<s_q, s_x> preserves this space's per-query ordering)."""
        return val

    def _sketch_post(self, s):
        """Monotone map from the -dot estimate to this space's distance
        scale (enables mixing proxy and exact values during hybrid
        construction). Identity where the distance IS -dot."""
        return s

    def sketch_proxy(self, data: SparseDeviceData, dsk: int, seed: int):
        """(proxy_space, proxy_data, R) for graph methods, or None when
        this space doesn't factor through dots or the vocabulary is
        unbounded (no vocab_mark gate)."""
        if not self.sketch_ok or "vocab_mark" not in data.extra:
            return None
        v_pad = data.extra["vocab_mark"].shape[0]
        dskp = round_up(max(dsk, 128), 128)
        r_mat = S.sketch_matrix(v_pad, dskp, seed)
        vecs = S.sketch_csr(data.col, self._sketch_vals(data.col, data.val, data.length), r_mat)
        pdata = DenseDeviceData(
            vecs=vecs, ids=data.ids, count=data.count, dim=dskp
        )
        pdata.extra["pad"] = data.extra["pad"]
        return SketchProxySpace(dskp, self._sketch_post), pdata, r_mat

    def sketch_queries(self, qenc: dict, r_mat) -> dict:
        """Proxy query encodings from already-encoded CSR queries. Query
        ids beyond the corpus vocabulary drop out of the projection —
        consistent with the exact path (they can match no corpus id; the
        cosine normalization still uses the full query norm)."""
        vals = self._sketch_vals(qenc["qcol"], qenc["qval"], qenc["qlen"])
        return {"q": S.sketch_csr(qenc["qcol"], vals, r_mat)}

    def encode_dataset(
        self, store: DataStore, row_multiple: int = 8, vocab_floor: int = 0
    ) -> SparseDeviceData:
        pts = store.sparse_points()
        n = len(pts)
        n_pad = round_up(max(n, 1), row_multiple)
        col, val, length = _pack_csr(pts, n_pad)
        if self.binary:
            val = (np.abs(val) > 0).astype(np.float32)
        pad = np.zeros(n_pad, np.float32)
        pad[n:] = PAD_TERM
        ids = np.full(n_pad, -1, np.int32)
        ids[:n] = np.asarray(store.ids, np.int32)
        data = SparseDeviceData(
            col=jnp.asarray(col),
            val=jnp.asarray(val),
            length=jnp.asarray(length),
            ids=jnp.asarray(ids),
            count=n,
        )
        data.extra["pad"] = jnp.asarray(pad)
        # dense-after-scatter gate: a tiny [V_pad] marker array whose
        # STATIC SHAPE carries the padded vocabulary into the traced
        # block kernels. The width travels WITH the dataset (never on
        # the space instance): every scoring site derives it from the
        # corpus it actually scores, so re-encodes or per-shard encodes
        # can never leave a stale width behind (round-1 advisor finding).
        vmax = int(max((int(p.ids[-1]) for p in pts if len(p.ids)), default=0))
        # vocab_floor: a caller-supplied GLOBAL vocabulary lower bound so
        # independent encodes (e.g. per-shard, parallel/hnsw_sharded.py)
        # produce the SAME padded width — a prerequisite for sharing one
        # JL projection across shards and for stacking their programs.
        vmax = max(vmax, int(vocab_floor))
        if self.dense_dot_ok and 0 < vmax <= VOCAB_DENSE_MAX:
            v_pad = round_up(vmax, 128)
            data.extra["vocab_mark"] = jnp.zeros(v_pad, jnp.int8)
        return data

    def encode_queries(self, points) -> dict:
        pts = [
            p if isinstance(p, SparsePoint) else DataStore.validate_sparse(p)
            for p in points
        ]
        col, val, length = _pack_csr(pts, len(pts), pad_col=S.PAD_Q)
        if self.binary:
            val = (np.abs(val) > 0).astype(np.float32)
        enc = {
            "qcol": jnp.asarray(col),
            "qval": jnp.asarray(val),
            "qlen": jnp.asarray(length),
        }
        # NB: the densified per-query table (q_dense) is NOT built here —
        # encode has no corpus in hand, and a host-built table sized from
        # mutable space state went silently stale across re-encodes
        # (round-1 advisor finding). densify_queries() builds it in-jit
        # at every scoring site from the corpus's own vocab_mark width;
        # XLA hoists the loop-invariant scatter out of scans/while loops.
        self._add_query_terms(enc, val, length)
        return enc

    def encode_queries_host(self, points):
        """Packed query transport (ops/qpack.py): the CSR pack is pure
        host work and every sparse query term (cosine/querynorm norms
        from qval, Lp power sums) derives on device in
        complete_queries, so all sparse families ride one upload."""
        if type(self).encode_queries is not SparseSpaceBase.encode_queries:
            return None
        pts = [
            p if isinstance(p, SparsePoint) else DataStore.validate_sparse(p)
            for p in points
        ]
        col, val, length = _pack_csr(pts, len(pts), pad_col=S.PAD_Q)
        if self.binary:
            val = (np.abs(val) > 0).astype(np.float32)
        return {"qcol": col, "qval": val, "qlen": length}

    def _qdense_values(self, qval: jax.Array) -> jax.Array:
        """Values scattered into the densified query table (jaccard
        overrides with presence indicators)."""
        return qval

    def densify_queries(self, qenc: dict, corpus: dict) -> dict:
        """Add the in-jit densified query table q_dense f32[Q, V_pad]
        sized from the corpus being scored (its vocab_mark static
        shape). Query ids beyond the corpus vocabulary are dropped by
        the scatter — exact, since no corpus id can match them. No-op
        when the corpus has no dense-vocab gate or q_dense exists."""
        vm = corpus.get("vocab_mark")
        if vm is None or "q_dense" in qenc or "qcol" not in qenc:
            return qenc
        out = dict(qenc)
        out["q_dense"] = S._densify(
            qenc["qcol"], self._qdense_values(qenc["qval"]), vm.shape[0]
        )
        return out

    def _add_query_terms(self, enc: dict, val: np.ndarray, length: np.ndarray) -> None:
        pass

    def slice_data(self, data: SparseDeviceData, start, size) -> dict:
        sl = lambda a: jax.lax.dynamic_slice_in_dim(a, start, size, 0)
        xc = {
            "x": sl(data.val),
            "cols": sl(data.col),
            "len": sl(data.length),
            "pad": sl(data.extra["pad"]),
        }
        if "vocab_mark" in data.extra:
            xc["vocab_mark"] = data.extra["vocab_mark"]  # shape carrier, unsliced
        return xc

    def corpus_dict(self, data: SparseDeviceData) -> dict:
        """Graph-search corpus arrays, all row-indexed (see
        methods/hnsw.py _corpus_dict / ops/graph.py score_rows).
        vocab_mark rides along (non-gathered) as the static vocabulary-
        width carrier for densify_queries / pair_block."""
        out = {
            "vecs": data.val,
            "cols": data.col,
            "len": data.length,
            "pad": data.extra["pad"],
            "count": data.count,  # static pad mask in gather paths
        }
        if "row_mask" in data.extra:
            out["row_mask"] = data.extra["row_mask"]
        if "vocab_mark" in data.extra:
            out["vocab_mark"] = data.extra["vocab_mark"]
        return out

    def block(self, qenc, xc, precision: str = "float32") -> jax.Array:
        d = self._block_impl(qenc, xc, precision)
        return d + xc["pad"][None, :]

    def _block_impl(self, qenc, xc, precision):
        raise NotImplementedError


# ---------------- scalar-product family ----------------


class SparseDotBase(SparseSpaceBase):
    dense_dot_ok = True
    sketch_ok = True  # raw-value sketches: -<s_q,s_x> orders like -<q,x>

    def gathered_block(self, qenc, rows, pad, extra):
        """Distances of query b to its gathered candidate rows [B, K,
        nnz] via the densified query table: one take_along_axis per
        candidate element instead of per-element binary searches — the
        searchsorted-under-while_loop program this replaces faulted the
        TPU worker on 100k sparse graph queries. Returns None (fall back
        to the lookup path) when no q_dense is available (unbounded
        vocabularies)."""
        cols = extra.get("cols")
        if cols is None or getattr(cols, "ndim", 0) != 3:
            return None
        qcol, qval = qenc.get("qcol"), qenc.get("qval")
        if (
            S.GATHER_SCORING == "support"
            and qcol is not None
            and qval is not None
            and getattr(qcol, "ndim", 0) == 2
        ):
            dot = S.support_dots(qcol, qval, cols, rows)
            return self._post_gathered_dot(qenc, rows, dot) + pad
        qd = qenc.get("q_dense")
        if qd is None:
            return None
        b, k, nnz = cols.shape
        v = qd.shape[1]
        # padded cols (PAD_X) clip in-range but their row values are 0
        idx = jnp.clip(cols.reshape(b, k * nnz) - 1, 0, v - 1)
        qvals = jnp.take_along_axis(qd, idx, axis=1).reshape(b, k, nnz)
        dot = jnp.sum(qvals * rows, axis=-1)  # [B, K]
        return self._post_gathered_dot(qenc, rows, dot) + pad

    def _norm_gathered(self, qenc, rows, dot):
        qn = S.norms_from_vals(qenc["qval"])[:, None]
        xn = S.norms_from_vals(rows)
        return dot / jnp.maximum(qn * xn, _TINY)

    def _post_gathered_dot(self, qenc, rows, dot):
        """Map the raw dot to this space's distance; per-class override."""
        raise NotImplementedError

    def _pair_post(self, an, bn, dot):
        """Map pairwise dots [B, C, C2] to distances given row norms
        an [B, C], bn [B, C2]; per-class override."""
        raise NotImplementedError

    def pair_block(self, qe, rows, pad, extra, v_pad: int):
        """Pairwise distances of per-row candidate sets [B, C] x [B, C2]
        for the construction heuristic (methods/hnsw.py _score_pairs):
        per-candidate densified tables + take_along_axis gathers instead
        of the searchsorted path (the remaining TPU-fault suspect in the
        wave program). Returns None when the gathered encodings lack CSR
        columns (then the generic vmap fallback runs)."""
        acol, aval = qe.get("qcol"), qe.get("qval")
        bcol = extra.get("cols")
        if (
            acol is None
            or bcol is None
            or getattr(acol, "ndim", 0) != 3
            or getattr(bcol, "ndim", 0) != 3
        ):
            return None
        dot = S.pair_dots_qdense(acol, aval, bcol, rows, v_pad)
        an = S.norms_from_vals(aval)  # [B, C]
        bn = S.norms_from_vals(rows)  # [B, C2]
        return self._pair_post(an, bn, dot) + pad[:, None, :]

    def _dot(self, qenc, xc, precision: str = "float32"):
        """Sparse dot block: densified-query gather when q_dense rides
        with the queries, dense-after-scatter MXU matmul when only the
        corpus vocabulary gate is present (exact scan), sorted-lookup
        otherwise (unbounded id spaces)."""
        qd = qenc.get("q_dense")
        if qd is None:
            vm = xc.get("vocab_mark")
            if vm is not None and xc["cols"].ndim == 2:
                # densify the queries on the spot instead of calling
                # dot_blocked_dense: the corpus-densify matmul
                # formulation measured WRONG on the TPU backend at 100k
                # (recall 0.84 vs the f64 oracle, scripts/
                # r2_sparse_quality.py scan) while the densified-query
                # gather is bit-verified exact end-to-end — and ~7x
                # faster (652 vs 95 qps wall at 100k). The scatter is
                # loop-invariant: XLA hoists it out of scan bodies.
                qd = S._densify(qenc["qcol"], qenc["qval"], vm.shape[0])
        if qd is not None and xc["cols"].ndim == 2:
            return S.dot_qdense(qd, xc["cols"], xc["x"])
        return S.dot_blocked(qenc["qcol"], qenc["qval"], xc["cols"], xc["x"])

    def _norm_dot(self, qenc, xc, precision: str = "float32"):
        """dot / (|q| |x|), the NormScalarProduct analog
        (src/distcomp_scalar.cc NormScalarProductSIMD; 0-norm rows give 0)."""
        dot = self._dot(qenc, xc, precision)
        qn = S.norms_from_vals(qenc["qval"])[:, None]
        xn = S.norms_from_vals(xc["x"])[None, :]
        return dot / jnp.maximum(qn * xn, _TINY)


@register_space("cosinesimil_sparse")
@register_space("cosinesimil_sparse_fast")
class SparseCosineSpace(SparseDotBase):
    """max(0, 1 - dot/(|q||x|)) (reference: CosineSimilarity,
    src/distcomp_scalar.cc:268-273)."""

    name = "cosinesimil_sparse"

    def _sketch_vals(self, col, val, length):
        # row-normalize: for a fixed query, 1 - <q,x>/(|q||x|) orders
        # exactly like -<q, x/|x|>
        n = S.norms_from_vals(val)
        return val / jnp.maximum(n, _TINY)[..., None]

    def _sketch_post(self, s):
        return jnp.maximum(0.0, 1.0 + s)  # s = -cos estimate

    def _block_impl(self, qenc, xc, precision):
        return jnp.maximum(0.0, 1.0 - self._norm_dot(qenc, xc))

    def _post_gathered_dot(self, qenc, rows, dot):
        return jnp.maximum(0.0, 1.0 - self._norm_gathered(qenc, rows, dot))

    def _pair_post(self, an, bn, dot):
        den = jnp.maximum(an[:, :, None] * bn[:, None, :], _TINY)
        return jnp.maximum(0.0, 1.0 - dot / den)


@register_space("cosinesimil_sparse_bin_fast")
class SparseCosineBinSpace(SparseCosineSpace):
    name = "cosinesimil_sparse_bin_fast"
    binary = True


@register_space("angulardist_sparse")
@register_space("angulardist_sparse_fast")
class SparseAngularSpace(SparseDotBase):
    """acos(clip(dot/(|q||x|), -1, 1)) (reference: AngularDistance)."""

    name = "angulardist_sparse"

    def _sketch_vals(self, col, val, length):
        n = S.norms_from_vals(val)
        return val / jnp.maximum(n, _TINY)[..., None]

    def _sketch_post(self, s):
        return jnp.arccos(jnp.clip(-s, -1.0, 1.0))

    def _block_impl(self, qenc, xc, precision):
        return jnp.arccos(jnp.clip(self._norm_dot(qenc, xc), -1.0, 1.0))

    def _post_gathered_dot(self, qenc, rows, dot):
        return jnp.arccos(jnp.clip(self._norm_gathered(qenc, rows, dot), -1.0, 1.0))

    def _pair_post(self, an, bn, dot):
        den = jnp.maximum(an[:, :, None] * bn[:, None, :], _TINY)
        return jnp.arccos(jnp.clip(dot / den, -1.0, 1.0))


@register_space("negdotprod_sparse")
@register_space("negdotprod_sparse_fast")
class SparseNegDotSpace(SparseDotBase):
    name = "negdotprod_sparse"

    def _block_impl(self, qenc, xc, precision):
        return -self._dot(qenc, xc, precision)

    def _post_gathered_dot(self, qenc, rows, dot):
        return -dot

    def _pair_post(self, an, bn, dot):
        return -dot


@register_space("negdotprod_sparse_bin_fast")
class SparseNegDotBinSpace(SparseNegDotSpace):
    name = "negdotprod_sparse_bin_fast"
    binary = True


@register_space("querynorm_negdotprod_sparse")
@register_space("querynorm_negdotprod_sparse_fast")
class SparseQueryNormNegDotSpace(SparseDotBase):
    """-dot(x, q)/|q|: QueryNormScalarProduct normalizes by the second
    (query) argument only (reference: src/distcomp_scalar.cc:64-79)."""

    name = "querynorm_negdotprod_sparse"

    def _block_impl(self, qenc, xc, precision):
        dot = self._dot(qenc, xc, precision)
        qn = jnp.maximum(S.norms_from_vals(qenc["qval"]), _TINY)
        return -dot / qn[:, None]

    def _post_gathered_dot(self, qenc, rows, dot):
        qn = jnp.maximum(S.norms_from_vals(qenc["qval"]), _TINY)
        return -dot / qn[:, None]

    def _pair_post(self, an, bn, dot):
        return -dot / jnp.maximum(an[:, :, None], _TINY)


# ---------------- Lp family ----------------


class SparseLpBase(SparseSpaceBase):
    """Union-of-supports Lp (reference: space_sparse_lp.h merge loops)."""

    p: float = 2.0

    def _add_query_terms(self, enc, val, length):
        if not math.isinf(self.p):
            enc["q_pterm"] = jnp.asarray(
                np.sum(np.abs(val) ** self.p, axis=1).astype(np.float32)
            )

    def complete_queries(self, qenc):
        # packed transport: sum |q_i|^p on device (padded qval slots are
        # zero and contribute nothing for any finite p > 0)
        if not math.isinf(self.p) and "q_pterm" not in qenc:
            qenc = dict(qenc)
            qenc["q_pterm"] = jnp.sum(
                jnp.abs(qenc["qval"]) ** self.p, axis=1
            ).astype(jnp.float32)
        return qenc

    def _block_impl(self, qenc, xc, precision):
        if math.isinf(self.p):
            return S.linf_union_blocked(qenc["qcol"], qenc["qval"], xc["cols"], xc["x"])
        d = S.lp_union_blocked(
            qenc["qcol"], qenc["qval"], xc["cols"], xc["x"], self.p, qenc["q_pterm"]
        )
        d = jnp.maximum(d, 0.0)
        return d if self.p == 1.0 else d ** (1.0 / self.p)


@register_space("l1_sparse")
class SparseL1Space(SparseLpBase):
    name = "l1_sparse"
    p = 1.0


@register_space("l2_sparse")
class SparseL2Space(SparseLpBase):
    name = "l2_sparse"
    p = 2.0


@register_space("linf_sparse")
class SparseLinfSpace(SparseLpBase):
    name = "linf_sparse"
    p = math.inf


@register_space("lp_sparse")
class SparseLpSpace(SparseLpBase):
    name = "lp_sparse"

    def __init__(self, params=None):
        pm = ParamManager(params)
        p = pm.get("p", 2.0, float)
        pm.check_unused()
        if p <= 0:
            raise InvalidArgumentError("lp_sparse requires p > 0")
        super().__init__(params)
        self.p = p


# ---------------- Jaccard ----------------


@register_space("jaccard_sparse")  # C++ registry spelling (space_sparse_jaccard.h:31)
@register_space("sparse_jaccard")  # Zig-whitelist spelling
class SparseJaccardSpace(SparseSpaceBase):
    """1 - |A∩B|/|A∪B| over sorted id sets; values ignored (reference:
    space_sparse_jaccard.h, distcomp.h:253-262)."""

    name = "sparse_jaccard"
    dense_dot_ok = True  # intersection counts = indicator matmul
    sketch_ok = True

    def _sketch_vals(self, col, val, length):
        # normalized presence indicators: -<s_a, s_b> approximates the
        # ordering of -|A∩B|/sqrt(|A||B|), a standard jaccard surrogate;
        # the exact re-rank restores true jaccard distances
        ind = ((col >= 1) & (col < S.PAD_X)).astype(jnp.float32)
        return ind / jnp.maximum(jnp.sqrt(length.astype(jnp.float32)), 1.0)[..., None]

    def _sketch_post(self, s):
        # -s estimates |A∩B|/sqrt(|A||B|) (cosine of sets >= jaccard
        # similarity): 1+s is a jaccard-scale surrogate distance
        return jnp.clip(1.0 + s, 0.0, 1.0)

    def _qdense_values(self, qval: jax.Array) -> jax.Array:
        return jnp.ones(qval.shape, jnp.float32)

    def gathered_block(self, qenc, rows, pad, extra):
        """Graph-candidate jaccard via the densified presence table:
        inter[b, k] = #(candidate ids present in query b)."""
        cols = extra.get("cols")
        xlen = extra.get("len")
        if cols is None or xlen is None or cols.ndim != 3:
            return None
        qcol = qenc.get("qcol")
        if (
            S.GATHER_SCORING == "support"
            and qcol is not None
            and getattr(qcol, "ndim", 0) == 2
        ):
            # padding never matches (PAD_Q != PAD_X), so no real-mask
            inter = jnp.sum(S.support_found(qcol, cols), axis=-1)
        else:
            qd = qenc.get("q_dense")
            if qd is None:
                return None
            b, k, nnz = cols.shape
            v = qd.shape[1]
            idx = jnp.clip(cols.reshape(b, k * nnz) - 1, 0, v - 1)
            hit = jnp.take_along_axis(qd, idx, axis=1).reshape(b, k, nnz)
            # mask padded/out-of-range candidate slots explicitly (their
            # clipped index may land on a real query term)
            real = (cols >= 1) & (cols <= v)
            inter = jnp.sum(jnp.where(real, hit, 0.0), axis=-1)
        union = qenc["qlen"][:, None] + xlen - inter
        d = jnp.where(union > 0, 1.0 - inter / jnp.maximum(union, 1.0), 0.0)
        return d + pad

    def pair_block(self, qe, rows, pad, extra, v_pad: int):
        acol = qe.get("qcol")
        bcol = extra.get("cols")
        alen, blen = qe.get("qlen"), extra.get("len")
        if (
            acol is None
            or bcol is None
            or alen is None
            or blen is None
            or getattr(acol, "ndim", 0) != 3
            or getattr(bcol, "ndim", 0) != 3
        ):
            return None
        ones_a = jnp.ones(acol.shape, jnp.float32)
        # b-side indicator must zero padded slots: PAD_X clips in-range
        ones_b = ((bcol >= 1) & (bcol <= v_pad)).astype(jnp.float32)
        inter = S.pair_dots_qdense(acol, ones_a, bcol, ones_b, v_pad)
        union = alen[:, :, None] + blen[:, None, :] - inter
        d = jnp.where(union > 0, 1.0 - inter / jnp.maximum(union, 1.0), 0.0)
        return d + pad[:, None, :]

    def _block_impl(self, qenc, xc, precision):
        qd = qenc.get("q_dense")
        vm = xc.get("vocab_mark")
        if qd is None and vm is not None and xc["cols"].ndim == 2:
            # presence table built on the spot; the corpus-densify
            # indicator matmul is retired from production for the same
            # reason as dot_blocked_dense (see SparseDotBase._dot)
            qd = S._densify(
                qenc["qcol"], jnp.ones(qenc["qcol"].shape, jnp.float32),
                vm.shape[0],
            )
        if qd is not None and xc["cols"].ndim == 2:
            # densified-presence gather: HBM traffic scales with corpus
            # nnz, not the dense vocabulary width (see SparseDotBase._dot)
            inter = S.intersect_count_qdense(qd, xc["cols"])
        else:
            return S.jaccard_blocked(qenc["qcol"], xc["cols"], qenc["qlen"], xc["len"])
        union = qenc["qlen"][:, None] + xc["len"][None, :] - inter
        return jnp.where(union > 0, 1.0 - inter / jnp.maximum(union, 1.0), 0.0)
