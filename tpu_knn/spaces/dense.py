"""Dense vector spaces, matmul-factored for the MXU.

Covers the reference space families (SURVEY.md §2.3): lp/l1/l2/linf
(space_lp.h, distcomp_lp.cc), cosinesimil/angulardist/negdotprod
(space_scalar.h, distcomp_scalar.cc), the Bregman-divergence family
KL/generalized-KL/Itakura-Saito incl. the "rq" reversed-argument
variants (space_bregman.h, distcomp_bregman.cc), Jensen-Shannon
(space_js.h, distcomp_js.cc), alpha-beta and Renyi divergences
(space_ab_diverg.h, space_renyi_diverg.h), the uint8 SIFT integer-L2^2
space (space_l2sqr_sift.h, distcomp_l2sqr_sift.cc) and the dummy space
(space_dummy.h).

Where the reference stores precomputed logs/norms inside each Object's
byte buffer, we precompute whole transformed corpus matrices + per-row
terms at encode time so every distance block is a single MXU matmul (see
ops/distance.py module docstring for the factorization table).
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
    round_up,
)
from ..core.errors import InvalidArgumentError
from ..core.params import ParamManager, Params
from ..core.registry import register_space
from ..ops import distance as D
from .base import Space

#: Large-but-finite mask value for padded corpus rows (kept finite so that
#: post-transforms like sqrt/arccos stay NaN-free).
PAD_TERM = 1e30

_TINY = 1e-30


def _pad_rows(a: np.ndarray, n_pad: int) -> np.ndarray:
    if a.shape[0] == n_pad:
        return a
    pad = np.zeros((n_pad - a.shape[0],) + a.shape[1:], dtype=a.dtype)
    return np.concatenate([a, pad], axis=0)


def _pad_ids(ids: np.ndarray, n_pad: int) -> np.ndarray:
    """Pad the object-id vector with -1 so padding rows are recognizable."""
    if ids.shape[0] == n_pad:
        return ids
    return np.concatenate([ids, np.full(n_pad - ids.shape[0], -1, dtype=ids.dtype)])


def _pad_cols(a: np.ndarray, mult: int = 128) -> np.ndarray:
    d = a.shape[1]
    dp = round_up(max(d, 1), mult)
    if dp == d:
        return a
    return np.concatenate([a, np.zeros((a.shape[0], dp - d), dtype=a.dtype)], axis=1)


#: Content-keyed device-upload cache for encoded corpus matrices.
#: Re-encoding the same corpus (exact-scan gold + HNSW + vptree over
#: one dataset — the standard benchmark/experiment shape) used to
#: re-upload the full matrix per encode; over a remote-TPU link a 1M x
#: 128 f32 upload measured ~140 s (r4_buildprof.jsonl silent-gap
#: attribution), so the second index build paid more for transfer than
#: for construction. Keyed by (blake2b of the transformed bytes, shape,
#: dtype) — content-exact, safe across stores holding equal data. Two
#: entries, LRU: a corpus + a query-side slab.
_UPLOAD_CACHE: dict = {}
_UPLOAD_ORDER: list = []


def clear_upload_cache() -> int:
    """Release the cached device slabs (ADVICE r4: they pin up to two
    full corpus uploads in HBM for the process lifetime, even after the
    indexes that used them are freed). Returns the number of entries
    dropped. Exposed as ``tpu_knn.clear_upload_cache``."""
    n = len(_UPLOAD_CACHE)
    _UPLOAD_CACHE.clear()
    _UPLOAD_ORDER.clear()
    return n


def _cached_upload(xt: np.ndarray):
    import hashlib

    h = hashlib.blake2b(digest_size=16)
    h.update(np.ascontiguousarray(xt).data)
    key = (h.hexdigest(), xt.shape, str(xt.dtype))
    arr = _UPLOAD_CACHE.get(key)
    if arr is None:
        arr = jnp.asarray(xt)
        _UPLOAD_CACHE[key] = arr
        _UPLOAD_ORDER.append(key)
        while len(_UPLOAD_ORDER) > 2:
            _UPLOAD_CACHE.pop(_UPLOAD_ORDER.pop(0), None)
    return arr


def ensure_cert_metadata(data) -> None:
    """Certificate metadata for the reduced-precision pass-1 scan
    (methods/seq_search.py _pass1_eps), computed lazily on first use and
    cached in ``data.extra``: max squared row norm of the transformed
    matrix plus the exactly-computed bf16 rounding residual norms —
    |x - bf16(x)| per row and the second-level |lo - bf16(lo)| — the
    data-adaptive Cauchy-Schwarz bound ~10x tighter than the worst-case
    u*|q||x| coefficient. 1.01 headroom covers the f32 reductions.
    Padding rows are zero and cannot raise the maxima."""
    if "max_lo_norm" in data.extra or data.count == 0:
        return
    if not hasattr(data, "vecs") or data.vecs.dtype == jnp.int8:
        return  # int8 pass 1 is exact; no certificate needed
    x = data.vecs.astype(jnp.float32)
    data.extra["max_sq_norm"] = jnp.max(jnp.sum(x * x, axis=1)) * 1.01
    lo = x - x.astype(jnp.bfloat16).astype(jnp.float32)
    data.extra["max_lo_norm"] = jnp.sqrt(jnp.max(jnp.sum(lo * lo, axis=1))) * 1.01
    ble = lo - lo.astype(jnp.bfloat16).astype(jnp.float32)
    data.extra["max_blo_err"] = jnp.sqrt(jnp.max(jnp.sum(ble * ble, axis=1))) * 1.01


class DenseSpace(Space):
    """Shared encode/slice machinery for dense float spaces.

    Subclasses define ``_transform_x/_transform_q`` (element transforms),
    ``_term_x/_term_q`` (per-row scalar terms) and ``_block_impl``.
    """

    data_kind = DataKind.DENSE
    np_dtype = np.float32

    # --- hooks ---
    def _transform_x(self, v: np.ndarray) -> np.ndarray:
        return v

    def _transform_q(self, v: np.ndarray) -> np.ndarray:
        return v

    def _term_x(self, v: np.ndarray):
        return None

    def _term_q(self, v: np.ndarray):
        return None

    def _block_impl(self, qenc: dict, xc: dict, precision: str) -> jax.Array:
        raise NotImplementedError

    # --- Space interface ---
    def encode_dataset(self, store: DataStore, row_multiple: int = 8) -> DenseDeviceData:
        mat = store.dense_matrix().astype(np.float32)
        n, dim = mat.shape
        n_pad = round_up(max(n, 1), row_multiple)
        xt = _pad_cols(self._transform_x(mat).astype(np.float32))
        # ONE upload per distinct corpus content (_cached_upload); row
        # padding happens on device so seq_search/hnsw/vptree encodes
        # with different row multiples share the same uploaded slab
        dev = _cached_upload(xt)
        if n_pad != n:
            vecs = jnp.concatenate(
                [dev, jnp.zeros((n_pad - n, xt.shape[1]), dev.dtype)], axis=0
            )
        else:
            vecs = dev
        # per-row term from the device matrix where it is a function of
        # the stored row (term_from_rows) — the host _term_x path for l2
        # uploaded the whole matrix a SECOND time just to compute norms
        row_term = self.term_from_rows(vecs)
        if row_term is None:
            term = self._term_x(mat)
            if term is not None:
                row_term = jnp.asarray(
                    _pad_rows(np.asarray(term, np.float32), n_pad)
                )
        pad = np.zeros(n_pad, np.float32)
        pad[n:] = PAD_TERM
        ids = _pad_ids(np.asarray(store.ids, np.int32).reshape(-1), n_pad)
        data = DenseDeviceData(
            vecs=vecs,
            ids=jnp.asarray(ids),
            count=n,
            dim=dim,
            row_term=row_term,
        )
        data.extra["pad"] = jnp.asarray(pad)
        # Certificate metadata for the reduced-precision pass-1 scan is
        # computed LAZILY (ensure_cert_metadata below): the default f32
        # tier never reads it, and eagerly paying three full-matrix
        # passes at every encode (1M x 128 = ~1GB of temporaries) for an
        # opt-in feature measured neutral-to-negative was pure overhead.
        return data

    def encode_queries(self, points) -> dict:
        q = np.asarray(points, dtype=np.float32)
        if q.ndim == 1:
            q = q[None, :]
        term = self._term_q(q)
        qt = _pad_cols(self._transform_q(q).astype(np.float32))
        enc = {"q": jnp.asarray(qt)}
        if term is not None:
            enc["q_term"] = jnp.asarray(np.asarray(term, np.float32))
        return enc

    #: Packed query transport (ops/qpack.py): subclasses whose query
    #: encode is pure host numpy + (optionally) a q_term derivable on
    #: device in complete_queries opt in. Spaces with bespoke
    #: encode_queries / eager terms (Bregman family, sift-u8, embed,
    #: fusion, sqfd) stay on the eager path.
    SUPPORTS_HOST_QENC = False

    def encode_queries_host(self, points):
        if not self.SUPPORTS_HOST_QENC:
            return None
        q = np.asarray(points, dtype=np.float32)
        if q.ndim == 1:
            q = q[None, :]
        return {"q": _pad_cols(self._transform_q(q).astype(np.float32))}

    def slice_data(self, data: DenseDeviceData, start, size) -> dict:
        xc = {"x": jax.lax.dynamic_slice_in_dim(data.vecs, start, size, 0)}
        xc["pad"] = jax.lax.dynamic_slice_in_dim(data.extra["pad"], start, size, 0)
        if data.row_term is not None:
            xc["x_term"] = jax.lax.dynamic_slice_in_dim(data.row_term, start, size, 0)
        for k, v in data.extra.items():
            # per-row arrays only; 0-d entries (max_sq_norm) are metadata
            if k not in ("pad",) and getattr(v, "ndim", 0) >= 1:
                xc[k] = jax.lax.dynamic_slice_in_dim(v, start, size, 0)
        return xc

    def block(self, qenc, xc, precision: str = "float32") -> jax.Array:
        d = self._block_impl(qenc, xc, precision)
        return d + xc["pad"][None, :]


# ---------------- Lp family ----------------


class LpSpaceBase(DenseSpace):
    """Lp norms (reference: space_lp.h:49-67, distcomp_lp.cc). p == 2 goes
    through the MXU norm identity; p in {1, inf} and generic p use the
    blocked VPU path."""

    SUPPORTS_HOST_QENC = True

    def __init__(self, params: Params | None = None, p: float = 2.0):
        super().__init__(params)
        self.p = float(p)
        self.term_recompute = self.p == 2.0

    def _term_x(self, v):
        return D.sq_norms(jnp.asarray(v)) if self.p == 2.0 else None

    def _term_q(self, v):
        return D.sq_norms(jnp.asarray(v)) if self.p == 2.0 else None

    def complete_queries(self, qenc):
        # packed transport: |q|^2 on device (padding columns are zero,
        # so the padded-row norm equals the eager unpadded one)
        if self.p == 2.0 and "q_term" not in qenc:
            qenc = dict(qenc)
            qenc["q_term"] = D.sq_norms(qenc["q"])
        return qenc

    def pass1_affine(self):
        return (-2.0, 1.0, 1.0) if self.p == 2.0 else None

    def pass1_post(self, s, qenc):
        return jnp.sqrt(jnp.maximum(s, 0.0))

    def term_from_rows(self, rows):
        return jnp.sum(rows * rows, axis=-1) if self.p == 2.0 else None

    def rows_as_queries(self, rows):
        # _transform_x == _transform_q == identity for p=2: a corpus row
        # IS its own query encoding (term recomputed from the row)
        if self.p != 2.0:
            return None
        return {"q": rows, "q_term": jnp.sum(rows * rows, axis=-1)}

    def _block_impl(self, qenc, xc, precision):
        if self.p == 2.0:
            d2 = D.factored(
                qenc["q"], xc["x"], qenc["q_term"], xc["x_term"], scale=-2.0, precision=precision
            )
            return jnp.sqrt(jnp.maximum(d2, 0.0))
        if self.p == 1.0:
            return D.l1_blocked(qenc["q"], xc["x"])
        if math.isinf(self.p):
            return D.linf_blocked(qenc["q"], xc["x"])
        return D.lp_blocked(qenc["q"], xc["x"], self.p)


@register_space("l2")
class L2Space(LpSpaceBase):
    name = "l2"

    def __init__(self, params=None):
        super().__init__(params, p=2.0)


@register_space("l1")
class L1Space(LpSpaceBase):
    name = "l1"

    def __init__(self, params=None):
        super().__init__(params, p=1.0)


@register_space("linf")
class LinfSpace(LpSpaceBase):
    name = "linf"

    def __init__(self, params=None):
        super().__init__(params, p=math.inf)


@register_space("lp")
class LpSpace(LpSpaceBase):
    name = "lp"

    def __init__(self, params=None):
        pm = ParamManager(params)
        p = pm.get("p", 2.0, float)
        pm.check_unused()
        if p <= 0:
            raise InvalidArgumentError("lp requires p > 0")
        super().__init__(params, p=p)


# ---------------- scalar-product family ----------------


def _normalize_rows(v: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(v, axis=1, keepdims=True)
    return np.where(n > 0, v / np.maximum(n, _TINY), v)


@register_space("cosinesimil")
class CosineSpace(DenseSpace):
    """1 - cos. Rows pre-normalized at encode, matching the reference's
    HNSW optimization (hnsw.cc:441-446) but applied universally."""

    SUPPORTS_HOST_QENC = True

    name = "cosinesimil"

    def pass1_affine(self):
        return (-1.0, 0.0, 0.0)

    def pass1_post(self, s, qenc):
        return jnp.maximum(0.0, 1.0 + s)

    def rows_as_queries(self, rows):
        # corpus rows are pre-normalized at encode; normalizing again is
        # the identity, so a row is its own query encoding
        return {"q": rows}

    def _transform_x(self, v):
        return _normalize_rows(v)

    def _transform_q(self, v):
        return _normalize_rows(v)

    def _block_impl(self, qenc, xc, precision):
        return D.cosine_blocked(qenc["q"], xc["x"], precision)


@register_space("angulardist")
class AngularSpace(DenseSpace):
    name = "angulardist"
    SUPPORTS_HOST_QENC = True

    def pass1_affine(self):
        return (-1.0, 0.0, 0.0)

    def pass1_post(self, s, qenc):
        return jnp.arccos(jnp.clip(-s, -1.0, 1.0))

    def rows_as_queries(self, rows):
        return {"q": rows}  # pre-normalized at encode, as in cosinesimil

    def _transform_x(self, v):
        return _normalize_rows(v)

    def _transform_q(self, v):
        return _normalize_rows(v)

    def _block_impl(self, qenc, xc, precision):
        return D.angular_blocked(qenc["q"], xc["x"], precision)


@register_space("negdotprod")
class NegDotProdSpace(DenseSpace):
    name = "negdotprod"
    SUPPORTS_HOST_QENC = True

    def rows_as_queries(self, rows):
        return {"q": rows}  # both transforms are the identity

    def pass1_affine(self):
        return (-1.0, 0.0, 0.0)

    def _block_impl(self, qenc, xc, precision):
        return D.negdot_blocked(qenc["q"], xc["x"], precision)


# ---------------- Bregman divergences ----------------


def _safe_log(v):
    return np.log(np.maximum(v, _TINY))


class KLDivSpace(DenseSpace):
    """KL divergence family (reference: space_bregman.h,
    distcomp_bregman.cc). ``generalized`` adds the (-sum q + sum x) terms
    of the generalized KL; ``reversed`` ("rq") computes KL(x||q)."""

    def __init__(self, params=None, generalized=False, reversed_=False):
        super().__init__(params)
        self.generalized = generalized
        self.reversed = reversed_

    def _transform_x(self, v):
        return v if self.reversed else _safe_log(v)

    def _transform_q(self, v):
        return _safe_log(v) if self.reversed else v

    def _term_x(self, v):
        if self.reversed:
            # sum x log x (+ generalized: - sum x ... note sign below)
            t = np.sum(v * _safe_log(v), axis=1)
            if self.generalized:
                t = t - np.sum(v, axis=1)
            return t
        return np.sum(v, axis=1) if self.generalized else None

    def _term_q(self, v):
        if self.reversed:
            return np.sum(v, axis=1) if self.generalized else None
        t = np.sum(v * _safe_log(v), axis=1)
        if self.generalized:
            t = t - np.sum(v, axis=1)
        return t

    def pass1_affine(self):
        return (-1.0, 1.0, 1.0)

    def _block_impl(self, qenc, xc, precision):
        g = D.matmul(qenc["q"], xc["x"], precision)  # q . log x  (or log q . x)
        d = -g
        if "q_term" in qenc:
            d = d + qenc["q_term"][:, None]
        if "x_term" in xc:
            d = d + xc["x_term"][None, :]
        return d


@register_space("kldivfast")
class KLDivFast(KLDivSpace):
    name = "kldivfast"


@register_space("kldivfastrq")
class KLDivFastRQ(KLDivSpace):
    name = "kldivfastrq"

    def __init__(self, params=None):
        super().__init__(params, reversed_=True)


@register_space("kldivgenfast")
class KLDivGenFast(KLDivSpace):
    name = "kldivgenfast"

    def __init__(self, params=None):
        super().__init__(params, generalized=True)


@register_space("kldivgenfastrq")
class KLDivGenFastRQ(KLDivSpace):
    name = "kldivgenfastrq"

    def __init__(self, params=None):
        super().__init__(params, generalized=True, reversed_=True)


@register_space("kldivgenslow")
class KLDivGenSlow(KLDivSpace):
    name = "kldivgenslow"

    def __init__(self, params=None):
        super().__init__(params, generalized=True)


class ItakuraSaitoSpace(DenseSpace):
    """IS(q,x) = q.(1/x) - sum log q + sum log x - d."""

    def __init__(self, params=None, reversed_=False):
        super().__init__(params)
        self.reversed = reversed_

    def _transform_x(self, v):
        return v if self.reversed else 1.0 / np.maximum(v, _TINY)

    def _transform_q(self, v):
        return 1.0 / np.maximum(v, _TINY) if self.reversed else v

    def _term_x(self, v):
        s = np.sum(_safe_log(v), axis=1)
        return -s if self.reversed else s

    def _term_q(self, v):
        s = np.sum(_safe_log(v), axis=1)
        return s if self.reversed else -s

    def pass1_affine(self):
        return (1.0, 1.0, 1.0)

    def pass1_post(self, s, qenc):
        return s - qenc["_dim"]

    def _block_impl(self, qenc, xc, precision):
        g = D.matmul(qenc["q"], xc["x"], precision)
        return g + qenc["q_term"][:, None] + xc["x_term"][None, :] - qenc["_dim"]

    def encode_queries(self, points):
        enc = super().encode_queries(points)
        d = np.asarray(points)
        enc["_dim"] = jnp.float32(d.shape[-1] if d.ndim > 1 else d.shape[0])
        return enc


@register_space("itakurasaitofast")
class ISFast(ItakuraSaitoSpace):
    name = "itakurasaitofast"


@register_space("itakurasaitoslow")
class ISSlow(ItakuraSaitoSpace):
    name = "itakurasaitoslow"


@register_space("itakurasaitofastrq")
class ISFastRQ(ItakuraSaitoSpace):
    name = "itakurasaitofastrq"

    def __init__(self, params=None):
        super().__init__(params, reversed_=True)


# ---------------- Jensen-Shannon ----------------


class JSDivSpace(DenseSpace):
    """JS divergence, blocked VPU (not matmul-factorable because of
    log(q+x); reference: distcomp_js.cc)."""

    def _block_impl(self, qenc, xc, precision):
        return D.js_div_blocked(qenc["q"], xc["x"])


@register_space("jsdivslow")  # C++ registry spelling (space_js.h:29)
@register_space("js_div_slow")  # Zig-whitelist spelling (lib.zig)
class JSDivSlow(JSDivSpace):
    name = "js_div_slow"


@register_space("jsdivfast")  # C++ registry spelling (space_js.h:30)
@register_space("js_div_fast")
class JSDivFast(JSDivSpace):
    name = "js_div_fast"


@register_space("jsdivfastapprox")  # C++ registry spelling (space_js.h:31)
@register_space("js_div_fast_approx")
class JSDivFastApprox(JSDivSpace):
    name = "js_div_fast_approx"


class JSMetricSpace(JSDivSpace):
    """JS *metric* = sqrt(JS divergence) (reference: space_js.h kJSFast*
    metric variants, init_spaces.h:69-71 — registered but absent from the
    Zig whitelist)."""

    def _block_impl(self, qenc, xc, precision):
        return jnp.sqrt(jnp.maximum(super()._block_impl(qenc, xc, precision), 0.0))


@register_space("jsmetrslow")
class JSMetricSlow(JSMetricSpace):
    name = "jsmetrslow"


@register_space("jsmetrfast")
class JSMetricFast(JSMetricSpace):
    name = "jsmetrfast"


@register_space("jsmetrfastapprox")
class JSMetricFastApprox(JSMetricSpace):
    name = "jsmetrfastapprox"


# ---------------- alpha-beta / Renyi divergences ----------------


class AlphaBetaDivSpace(DenseSpace):
    """Alpha-beta divergence (reference: space_ab_diverg.h,
    src/distcomp_diverg.cc), alpha, beta != 0, alpha+beta != 0."""

    def __init__(self, params=None):
        pm = ParamManager(params)
        self.alpha = pm.get("alpha", 1.0, float)
        self.beta = pm.get("beta", 1.0, float)
        pm.check_unused()
        if self.alpha == 0 or self.beta == 0 or self.alpha + self.beta == 0:
            raise InvalidArgumentError(
                "abdiv requires alpha != 0, beta != 0, alpha+beta != 0"
            )
        super().__init__(params)

    def _transform_x(self, v):
        return np.maximum(v, _TINY) ** self.beta

    def _transform_q(self, v):
        return np.maximum(v, _TINY) ** self.alpha

    def _term_x(self, v):
        return np.sum(np.maximum(v, _TINY) ** (self.alpha + self.beta), axis=1)

    def _term_q(self, v):
        return np.sum(np.maximum(v, _TINY) ** (self.alpha + self.beta), axis=1)

    def pass1_affine(self):
        a, b = self.alpha, self.beta
        s = a + b
        return (-1.0 / (a * b), 1.0 / (s * b), 1.0 / (s * a))

    def _block_impl(self, qenc, xc, precision):
        return D.abdiv_blocked(
            qenc["q"], xc["x"], qenc["q_term"], xc["x_term"], self.alpha, self.beta, precision
        )


@register_space("abdiv_fast")
class ABDivFast(AlphaBetaDivSpace):
    name = "abdiv_fast"


@register_space("abdiv_slow")
class ABDivSlow(AlphaBetaDivSpace):
    name = "abdiv_slow"


class RenyiDivSpace(DenseSpace):
    """Renyi divergence D_a(q||x) = log(sum q^a x^(1-a)) / (a-1), a != 1."""

    def __init__(self, params=None):
        pm = ParamManager(params)
        self.alpha = pm.get("alpha", 0.5, float)
        pm.check_unused()
        if self.alpha == 1.0 or self.alpha <= 0:
            raise InvalidArgumentError("renyidiv requires alpha > 0, alpha != 1")
        super().__init__(params)

    def _transform_x(self, v):
        return np.maximum(v, _TINY) ** (1.0 - self.alpha)

    def _transform_q(self, v):
        return np.maximum(v, _TINY) ** self.alpha

    def _block_impl(self, qenc, xc, precision):
        return D.renyi_blocked(qenc["q"], xc["x"], self.alpha, precision)


@register_space("renyidiv_fast")
class RenyiDivFast(RenyiDivSpace):
    name = "renyidiv_fast"


@register_space("renyidiv_slow")
class RenyiDivSlow(RenyiDivSpace):
    name = "renyidiv_slow"


# ---------------- uint8 SIFT integer L2^2 ----------------


@register_space("l2sqr_sift")
class L2SqrSiftSpace(DenseSpace):
    """Exact integer squared-L2 over uint8[128] descriptors (reference:
    space_l2sqr_sift.cc:136-150, distcomp_l2sqr_sift.cc:41-151).

    MXU int8 path: the u8 values shift to int8 (a = x - 128) so the dot
    runs on the int8 systolic array (exact i32 accumulation, ~4x the f32
    matmul rate). With sa = sum(a) per row:

        <x, y> = <a_x, a_y> + 128(sa_x + sa_y) + 16384*d
        |x-y|^2 = (|x|^2 - 256 sa_x) + (|y|^2 - 256 sa_y)
                  - 2<a_x, a_y> - 32768*d

    so the affine factored form holds with q/x terms |.|^2 - 256*sa and
    the constant -32768*d applied in pass1_post. All quantities are
    < 2^24, exact in f32."""

    name = "l2sqr_sift"
    data_kind = DataKind.UINT8
    dist_kind = DistKind.INT
    np_dtype = np.uint8
    term_recompute = True

    def term_from_rows(self, rows):
        # term = |x|^2 - 256*sum(a) = sum(a^2) + 16384*d, a = x - 128;
        # all integers < 2^24, bitwise-equal to the encode-time value
        a = rows.astype(jnp.float32)
        return jnp.sum(a * a, axis=-1) + 16384.0 * rows.shape[-1]

    def _encode_mat(self, mat: np.ndarray):
        fm = mat.astype(np.float32)
        a = (mat.astype(np.int16) - 128).astype(np.int8)
        term = (np.sum(fm * fm, axis=1) - 256.0 * np.sum(fm - 128.0, axis=1)).astype(
            np.float32
        )
        return a, term

    def encode_dataset(self, store: DataStore, row_multiple: int = 8):
        mat = store.dense_matrix()  # uint8
        if mat.shape[0] and mat.shape[1] != 128:
            raise InvalidArgumentError("l2sqr_sift requires 128-byte descriptors")
        n, dim = mat.shape if mat.ndim == 2 else (0, 128)
        n_pad = round_up(max(n, 1), row_multiple)
        a, term = self._encode_mat(mat if n else np.zeros((0, 128), np.uint8))
        x = _pad_rows(a, n_pad)  # int8; padding rows = 0 (masked by pad term)
        x_term = _pad_rows(term, n_pad)
        pad = np.zeros(n_pad, np.float32)
        pad[n:] = PAD_TERM
        ids = _pad_ids(np.asarray(store.ids, np.int32).reshape(-1), n_pad)
        data = DenseDeviceData(
            vecs=jnp.asarray(x), ids=jnp.asarray(ids), count=n, dim=max(dim, 128),
            row_term=jnp.asarray(x_term),
        )
        data.extra["pad"] = jnp.asarray(pad)
        return data

    def encode_queries(self, points):
        q = np.asarray(points, dtype=np.uint8)
        if q.ndim == 1:
            q = q[None, :]
        a, term = self._encode_mat(q)
        return {
            "q": jnp.asarray(a),
            "q_term": jnp.asarray(term),
            "_dimconst": jnp.float32(32768.0 * q.shape[1]),
        }

    def encode_queries_host(self, points):
        # packed transport: the shift/term math is host numpy; the dim
        # constant re-derives on device from the (never padded: 128-byte
        # contract) query width in complete_queries
        q = np.asarray(points, dtype=np.uint8)
        if q.ndim == 1:
            q = q[None, :]
        a, term = self._encode_mat(q)
        return {"q": a, "q_term": term}

    def complete_queries(self, qenc):
        if "_dimconst" not in qenc:
            qenc = dict(qenc)
            qenc["_dimconst"] = jnp.float32(32768.0 * qenc["q"].shape[1])
        return qenc

    def pass1_affine(self):
        return (-2.0, 1.0, 1.0)

    def rows_as_queries(self, rows):
        # corpus rows are the shifted int8 descriptors; the query encode
        # applies the same shift, so rows are their own query encodings
        # (terms recomputed exactly — integers < 2^24 in f32)
        return {
            "q": rows,
            "q_term": self.term_from_rows(rows),
            "_dimconst": jnp.float32(32768.0 * rows.shape[-1]),
        }

    def pass1_post(self, s, qenc):
        return jnp.maximum(s - qenc["_dimconst"], 0.0)

    def _block_impl(self, qenc, xc, precision):
        g = jax.lax.dot_general(
            qenc["q"],
            xc["x"],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32)
        d = (
            qenc["q_term"][:, None]
            + xc["x_term"][None, :]
            - 2.0 * g
            - qenc["_dimconst"]
        )
        return jnp.maximum(d, 0.0)


# ---------------- dummy ----------------


@register_space("dummy")
class DummySpace(DenseSpace):
    """Trivial example space (reference: space_dummy.h): L1 on dense
    vectors — enough to exercise the method machinery end-to-end."""

    name = "dummy"

    def _block_impl(self, qenc, xc, precision):
        return D.l1_blocked(qenc["q"], xc["x"])
