"""Space abstraction (reference: include/space.h:130-276, rebuilt for TPU).

A reference ``Space`` computes one distance per object pair and owns
object serialization. Here a Space owns:

  * ``encode_dataset``  — DataStore -> padded device arrays, applying the
    space's element transform once (the analog of precomputed-log /
    precomputed-norm object layouts, distcomp.h:99-154,
    space_l2sqr_sift.cc:136-150) and any normalization (hnsw.cc:441-446).
  * ``encode_queries``  — raw query points -> transformed device arrays.
  * ``block``           — the blocked distance: (encoded queries, slice of
    encoded corpus) -> [Q, C] distances. This is the only hot op; every
    index method is built on it.
  * ``slice_data``      — traceable corpus chunk extraction for streaming
    scans.
  * ``pairwise``        — one-pair distance for getDistance
    (reference: nmslib_c.cpp nmslib_get_distance).

The reference's index/query-phase distance distinction (HiddenDistance vs
IndexTimeDistance, space.h:136-142) is a mutability guard that functional
JAX makes unnecessary; both phases call ``block``.
"""

from __future__ import annotations

from typing import Any

import numpy as np

from ..core.dataset import DataKind, DataStore, DistKind
from ..core.errors import InvalidArgumentError
from ..core.params import Params


class Space:
    name: str = "abstract"
    dist_kind: DistKind = DistKind.FLOAT
    data_kind: DataKind = DataKind.DENSE

    def __init__(self, params: Params | None = None):
        self.params = Params.of(params)

    # -- corpus --
    def encode_dataset(self, store: DataStore):
        raise NotImplementedError

    def slice_data(self, data, start, size):
        """Return the chunk [start:start+size) of encoded corpus rows as the
        structure ``block`` expects for its second argument. Must be
        jit-traceable (start may be a traced index)."""
        raise NotImplementedError

    # -- queries --
    def encode_queries(self, points: Any):
        """points: host-side raw query batch in the store's native format."""
        raise NotImplementedError

    def encode_queries_host(self, points: Any):
        """Host-only half of the packed query transport (ops/qpack.py):
        return a dict of NUMPY arrays such that uploading them and then
        applying :meth:`complete_queries` inside the search jit
        reproduces :meth:`encode_queries`. Spaces whose query encode
        needs eager device work they can't express in
        complete_queries return None (the caller falls back to the
        eager path). Opt-in per class via SUPPORTS_HOST_QENC."""
        return None

    def complete_queries(self, qenc):
        """Derive device-side query terms missing from a packed qenc
        (runs INSIDE search jits; must be jit-traceable and a no-op on
        eagerly-encoded dicts that already carry the terms)."""
        return qenc

    # -- distances --
    def block(self, qenc, xchunk, precision: str = "float32"):
        raise NotImplementedError

    def pass1_affine(self):
        """If the distance is affine-monotone in the factored matmul —
        order(dist) == order(scale*<q,x> + sq*q_term + sx*x_term) — return
        (scale, sq, sx) so the fused Pallas group-min kernel
        (ops/pallas_scan.py) can run pass 1 of the exact two-pass scan and
        gather-based scoring can use one batched einsum (ops/graph.py
        score_gathered). Monotone post-transforms (sqrt, arccos∘neg) are
        dropped for candidate *selection*; :meth:`pass1_post` maps the
        affine surrogate back to the true distance. Return None when the
        distance doesn't factor this way."""
        return None

    def pass1_post(self, s, qenc):
        """Map the affine surrogate of :meth:`pass1_affine` to the true
        distance (e.g. sqrt for l2). Must be exact, not just monotone."""
        return s

    def term_from_rows(self, rows):
        """Recompute the per-row term from (gathered, transformed) corpus
        rows, when possible. Gather paths use this instead of a separate
        1-D term gather: profiled on v5e, a scalar (4B-granule) gather
        costs ~5x the row gather it accompanies, while recomputing e.g.
        a squared norm from rows already in registers is ~free. Return
        None when the term isn't a function of the stored row (e.g. KL's
        precomputed-log layout)."""
        return None

    # -- graph-search support (ops/graph.py, methods/hnsw.py) --
    def corpus_dict(self, data) -> dict:
        """Row-indexed corpus arrays for gather-based graph search.

        'vecs' is gathered into block()'s ``x`` slot. Row masking: by
        default the dict carries 'count' (static) and padding rows are
        detected as ids >= count with NO pad gather; a method that masks
        real rows dynamically (sw-graph deletions) installs a 'row_mask'
        array in data.extra, which is gathered instead. The per-row term
        is included only when :meth:`term_from_rows` can't recompute it.
        """
        c = {"vecs": data.vecs, "count": data.count}
        if "row_mask" in data.extra:
            c["row_mask"] = data.extra["row_mask"]
        if getattr(data, "row_term", None) is not None and not self.term_recompute:
            c["term"] = data.row_term
        return c

    #: True when term_from_rows reconstructs the row term exactly.
    term_recompute: bool = False

    def rows_as_queries(self, rows):
        """Query encodings built directly from (already-encoded) corpus
        rows, for spaces whose corpus and query transforms coincide
        (l2, cosine family, l2sqr_sift). Lets construction-time scoring
        (ops/nndescent.py) derive both sides of a distance from corpus
        slices/gathers alone — no second encoded corpus copy, no qenc
        row gathers. Return None when the encodes differ (Bregman KL's
        log layout, word_embed, fusion)."""
        return None

    def store_as_query_points(self, store: DataStore):
        """The store's raw points in encode_queries' input format, index-
        addressable (used to score corpus points against each other
        during graph construction)."""
        if self.data_kind in (DataKind.DENSE, DataKind.UINT8):
            return store.dense_matrix()
        if self.data_kind is DataKind.SPARSE:
            return np.asarray(store.sparse_points(), dtype=object)
        return np.asarray(store.strings(), dtype=object)

    def pairwise(self, a, b) -> float:
        """One-pair distance on raw points."""
        qenc = self.encode_queries([a])
        data = self._encode_raw_points([b])
        d = self.block(qenc, self.slice_data(data, 0, 1))
        v = np.asarray(d)[0, 0]
        return int(round(float(v))) if self.dist_kind is DistKind.INT else float(v)

    def _encode_raw_points(self, points):
        """Encode a small list of raw points as corpus data (for pairwise)."""
        store = DataStore(self.data_kind)
        if self.data_kind is DataKind.DENSE:
            store.add_dense_batch(np.asarray(points, dtype=np.float32))
        elif self.data_kind is DataKind.UINT8:
            store.add_uint8_batch(np.asarray(points, dtype=np.uint8))
        elif self.data_kind is DataKind.SPARSE:
            store.add_sparse_batch(points)
        else:
            store.add_string_batch(points)
        return self.encode_dataset(store)

    # -- misc --
    def approx_equal(self, a, b, tol: float = 1e-5) -> bool:
        """Reference: Space::ApproxEqual (space.h:203-207), testing aid."""
        return bool(abs(self.pairwise(a, b)) <= tol)

    def construction_space(self):
        """Space used for index-time distance computations (the
        reference's compDistance(isQueryTime=false) distinction). Almost
        every space scores identically at both times and returns itself;
        sparse_dense_fusion overrides with its indexWeights view."""
        return self

    def __repr__(self):
        return f"<Space {self.name}>"


def require_positive(value, what: str):
    if value is None or value <= 0:
        raise InvalidArgumentError(f"{what} must be positive, got {value}")
    return value
