"""simple_invindx — document-at-a-time (DAAT) top-k retrieval over
sparse vectors (reference: include/method/simple_inverted_index.h,
src/method/simple_inverted_index.cc).

The reference builds per-term posting lists sorted by doc id and merges
them document-at-a-time with a heap, accumulating query-value x
doc-value products; it works ONLY with the negdotprod_sparse_fast space
(simple_inverted_index.h:40-50) and only answers kNN (range throws).

TPU equivalence: a posting-list DAAT merge *is* the sparse dot product
evaluated corpus-major. The padded-CSR negdotprod kernel computes the
identical scores in blocked form, so this method is the sparse exact
scan with the space contract enforced. dist_comps counts only documents
with a non-empty posting intersection (what DAAT would touch).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..core.dataset import DataStore
from ..core.errors import IndexNotBuiltError, SpaceIncompatibleError
from ..core.params import ParamManager, Params
from ..core.registry import register_method
from ..ops import sparse as S
from ..ops import topk as T
from .base import Method


@partial(jax.jit, static_argnames=("space", "k", "chunk"))
def _daat_knn(space, qenc, data, k: int, chunk: int):
    n_pad = data.ids.shape[0]
    b = qenc["qcol"].shape[0]

    def chunk_dists(ci):
        xc = space.slice_data(data, ci * chunk, chunk)
        return space.block(qenc, xc)

    d, pos = T.streaming_smallest_k(chunk_dists, n_pad // chunk, chunk, b, k)
    # touched docs = those sharing at least one term with the query
    def touched(ci):
        xc = space.slice_data(data, ci * chunk, chunk)
        inter = S.intersect_count_blocked(qenc["qcol"], xc["cols"])
        return jnp.sum(inter > 0, axis=1)  # per query (int32-safe)

    nd = jnp.sum(jax.lax.map(touched, jnp.arange(n_pad // chunk)), axis=0)
    ids = jnp.where(pos >= 0, data.ids[jnp.clip(pos, 0, n_pad - 1)], -1)
    return d, ids, nd


@register_method("simple_invindx")
class SimpleInvIndex(Method):
    name = "simple_invindx"
    supports_range = False  # "Range search is not supported!" (reference)

    def __init__(self, space, params: Params | None = None):
        super().__init__(space, params)
        if space.name not in ("negdotprod_sparse", "negdotprod_sparse_fast"):
            raise SpaceIncompatibleError(
                "The method simple_invindx works only with the space "
                "negdotprod_sparse_fast"
            )
        pm = ParamManager(self.index_params)
        pm.get("dummyParam", 0, int)  # the reference's only index param
        pm.check_unused()

    def set_query_time_params(self, params: Params | None) -> None:
        pm = ParamManager(Params.of(params))
        pm.get("dummyParam", 0, int)
        pm.check_unused()
        super().set_query_time_params(params)

    def create_index(self, store: DataStore, params: Params | None = None) -> None:
        self.store = store
        n = max(len(store), 1)
        pref = getattr(self.space, "preferred_chunk", 256)
        chunk = max(8, min(pref, ((n + 7) // 8) * 8))
        self._chunk = ((chunk + 7) // 8) * 8
        self.data = self.space.encode_dataset(store, row_multiple=self._chunk)

    def knn(self, points, k: int):
        if self.data is None:
            raise IndexNotBuiltError("simple_invindx: index not built")
        qenc = self.space.encode_queries(points)
        d, ids, nd = _daat_knn(self.space, qenc, self.data, k, self._chunk)
        self._add_dist_comps(nd)
        return self._finalize_knn(d, ids)
