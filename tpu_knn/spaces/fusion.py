"""sparse_dense_fusion space (reference:
include/space/space_sparse_dense_fusion.h,
src/space/space_sparse_dense_fusion.cc).

Distance = -sum_c weight_c * dot_c over the object's components, where
each component is either a dense vector (ScalarProductSIMD) or a sparse
vector (SparseScalarProductFast), and the weight set differs between
index time and query time (compDistance(isQueryTime)). The reference
reads objects from a custom binary-packed text file and weights from a
"queryWeights:/indexWeights:" file; here objects are JSON strings

    {"dense": [[...f32...], ...], "sparse": [[[ids...],[vals...]], ...]}

added via add_string_batch, and weights come either from the same
weight-file format (``weightfile`` param) or directly as
``indexWeights``/``queryWeights`` comma-separated params.
"""

from __future__ import annotations

import json

import jax
import jax.numpy as jnp
import numpy as np

from ..core.dataset import (
    DataKind,
    DataStore,
    DistKind,
    SparsePoint,
    round_up,
)
from ..core.errors import DataIOError, InvalidArgumentError
from ..core.params import ParamManager, Params
from ..core.registry import register_space
from ..ops import distance as D
from ..ops import sparse as S
from .base import Space
from .dense import PAD_TERM
from .sparse import _pack_csr


def _parse_weights(v) -> list[float]:
    if isinstance(v, (list, tuple)):
        return [float(x) for x in v]
    return [float(x) for x in str(v).split(",") if x.strip()]


def _read_weight_file(path: str) -> tuple[list[float], list[float]]:
    qw = iw = None
    try:
        with open(path, "r", encoding="utf-8") as f:
            for line in f:
                line = line.strip()
                if line.startswith("queryWeights:"):
                    qw = _parse_weights(line[len("queryWeights:") :])
                elif line.startswith("indexWeights:"):
                    iw = _parse_weights(line[len("indexWeights:") :])
    except OSError as e:
        raise DataIOError(f"Cannot open file: '{path}' for reading: {e}")
    if not qw or not iw or len(qw) != len(iw):
        raise InvalidArgumentError(
            "Zero or non-matching # of weights in the file "
            f"'{path}' # of index weights: {0 if not iw else len(iw)} "
            f"# of query weights: {0 if not qw else len(qw)}"
        )
    return iw, qw


@register_space("sparse_dense_fusion")
class SparseDenseFusionSpace(Space):
    name = "sparse_dense_fusion"
    data_kind = DataKind.STRING
    dist_kind = DistKind.FLOAT
    preferred_chunk = 512

    def __init__(self, params: Params | None = None):
        super().__init__(params)
        pm = ParamManager(self.params)
        wfile = pm.get("weightfile", None, str)
        iw = pm.get("indexWeights", None)
        qw = pm.get("queryWeights", None)
        pm.check_unused()
        if wfile:
            self.index_weights, self.query_weights = _read_weight_file(wfile)
        else:
            self.index_weights = _parse_weights(iw) if iw is not None else None
            self.query_weights = _parse_weights(qw) if qw is not None else None
        if (self.index_weights is None) != (self.query_weights is None):
            raise InvalidArgumentError(
                "sparse_dense_fusion needs both indexWeights and queryWeights"
            )
        # no per-encode schema on the instance: the component layout is
        # derived from the encoded dicts' keys at scoring time and the
        # two weight sets are fixed at construction — mutable space state
        # was the round-1 advisor's stale-vocab failure pattern
        self._index_view: SparseDenseFusionSpace | None = None

    def construction_space(self):
        """Space view scoring with indexWeights — used for index-time
        distance computations (graph construction), mirroring the
        reference's compDistance(isQueryTime=false). Queries keep using
        this instance (queryWeights)."""
        if self.index_weights == self.query_weights or self.index_weights is None:
            return self
        if self._index_view is None:
            view = object.__new__(SparseDenseFusionSpace)
            view.__dict__.update(self.__dict__)
            view.query_weights = self.index_weights  # block() reads these
            view._index_view = view
            self._index_view = view
        return self._index_view

    # -- component parsing --
    @staticmethod
    def _parse(points) -> list[dict]:
        out = []
        for p in points:
            s = p.decode("utf-8") if isinstance(p, bytes) else str(p)
            try:
                obj = json.loads(s)
            except json.JSONDecodeError as e:
                raise InvalidArgumentError(f"bad fusion object JSON: {e}")
            out.append(
                {
                    "dense": [np.asarray(v, np.float32) for v in obj.get("dense", [])],
                    "sparse": [
                        DataStore.validate_sparse((np.asarray(i), np.asarray(v)))
                        for i, v in obj.get("sparse", [])
                    ],
                }
            )
        return out

    def _n_comp(self, parsed) -> int:
        if not parsed:
            return 0
        n = len(parsed[0]["dense"]) + len(parsed[0]["sparse"])
        for p in parsed:
            if len(p["dense"]) + len(p["sparse"]) != n:
                raise InvalidArgumentError("fusion objects have differing component counts")
        return n

    def _check_weights(self, n: int) -> None:
        """Weight-count validation against the component count (host-side,
        at encode time). Matches the reference: too FEW weights is an
        error, extras are ignored (space_sparse_dense_fusion.cc only
        indexes i < weights.size()); n == 0 (empty batch) checks nothing."""
        if n == 0:
            return
        for label, w in (("index", self.index_weights), ("query", self.query_weights)):
            if w is not None and len(w) < n:
                raise InvalidArgumentError(
                    f"Too few {label} weights: {len(w)} < {n} components"
                )

    def _encode_components(self, parsed, n_pad: int, query: bool):
        """Returns ({key: array}, layout) with dense comps as matrices and
        sparse comps as padded CSR."""
        arrays, layout = {}, []
        if not parsed:
            return arrays, layout
        nd = len(parsed[0]["dense"])
        ns = len(parsed[0]["sparse"])
        for c in range(nd):
            mat = np.stack([p["dense"][c] for p in parsed]).astype(np.float32)
            dpad = np.zeros((n_pad, round_up(mat.shape[1], 8)), np.float32)
            dpad[: mat.shape[0], : mat.shape[1]] = mat
            arrays[f"d{c}"] = dpad
            layout.append(("dense", f"d{c}"))
        pad_col = S.PAD_Q if query else S.PAD_X
        for c in range(ns):
            pts = [p["sparse"][c] for p in parsed]
            col, val, _ = _pack_csr(pts, n_pad, pad_col=pad_col)
            arrays[f"sc{c}"] = col
            arrays[f"sv{c}"] = val
            layout.append(("sparse", f"sc{c}", f"sv{c}"))
        return arrays, layout

    # -- Space interface --
    def encode_dataset(self, store: DataStore, row_multiple: int = 8):
        from ..core.dataset import StringDeviceData

        parsed = self._parse(store.strings())
        n = len(parsed)
        n_pad = round_up(max(n, 1), row_multiple)
        arrays, layout = self._encode_components(parsed, n_pad, query=False)
        pad = np.zeros(n_pad, np.float32)
        pad[n:] = PAD_TERM
        ids = np.full(n_pad, -1, np.int32)
        ids[:n] = np.asarray(store.ids, np.int32)
        data = StringDeviceData(
            chars=jnp.zeros((n_pad, 1), jnp.int32),  # unused; fusion keeps components
            length=jnp.zeros(n_pad, jnp.int32),
            ids=jnp.asarray(ids),
            count=n,
        )
        data.extra["pad"] = jnp.asarray(pad)
        for k, v in arrays.items():
            data.extra[k] = jnp.asarray(v)
        # _n_comp rejects mixed schemas (objects with differing component
        # counts — reference CHECK_MSG(start1 == datalength))
        self._check_weights(self._n_comp(parsed))
        return data

    def encode_queries(self, points):
        parsed = self._parse(points)
        arrays, layout = self._encode_components(parsed, len(parsed), query=True)
        enc = {f"q_{k}": jnp.asarray(v) for k, v in arrays.items()}
        self._check_weights(self._n_comp(parsed))
        return enc

    @staticmethod
    def _layout_of(keys) -> list[tuple]:
        """Component layout derived from the encoded dict's OWN keys
        ('d{c}' dense matrices, 'sc{c}'/'sv{c}' sparse CSR pairs, with or
        without the query 'q_' prefix) — schema travels with the data."""
        names = {k.removeprefix("q_") for k in keys}
        layout: list[tuple] = []
        c = 0
        while f"d{c}" in names:  # dense components first (encode order)
            layout.append(("dense", f"d{c}"))
            c += 1
        c = 0
        while f"sc{c}" in names:
            layout.append(("sparse", f"sc{c}", f"sv{c}"))
            c += 1
        return layout

    def slice_data(self, data, start, size) -> dict:
        sl = lambda a: jax.lax.dynamic_slice_in_dim(a, start, size, 0)
        xc = {"pad": sl(data.extra["pad"])}
        for k, v in data.extra.items():
            if k != "pad":
                xc[k] = sl(v)
        return xc

    def corpus_dict(self, data) -> dict:
        layout = self._layout_of(data.extra.keys())
        c = {
            "vecs": data.extra[layout[0][1]] if layout else data.extra["pad"],
            "pad": data.extra["pad"],
            "count": data.count,  # static pad mask in gather paths
        }
        for k, v in data.extra.items():
            if k != "pad":
                c[k] = v  # includes row_mask when deletions installed one
        return c

    def block(self, qenc, xc, precision: str = "float32"):
        layout = self._layout_of(k for k in qenc if k.startswith("q_"))
        weights = self.query_weights or [1.0] * len(layout)
        res = None
        for comp, w in zip(layout, weights):
            # reference parity: compDistance skips any weight <= FLT_MIN
            # (space_sparse_dense_fusion.cc:297), so zero/negative weights
            # drop the component
            if w <= np.finfo(np.float32).tiny:
                continue
            if comp[0] == "dense":
                k = comp[1]
                val = D.matmul(qenc[f"q_{k}"], xc[k], precision)
            else:
                _, ck, vk = comp
                val = S.dot_blocked(qenc[f"q_{ck}"], qenc[f"q_{vk}"], xc[ck], xc[vk])
            res = val * w if res is None else res + val * w
        if res is None:
            q0 = next(v for k, v in qenc.items() if hasattr(v, "shape"))
            res = jnp.zeros((q0.shape[0], xc["pad"].shape[0]), jnp.float32)
        return -res + xc["pad"][None, :]
