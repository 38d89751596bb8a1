"""Index-method abstraction (reference: include/index.h:30-113).

A Method owns encoded corpus data plus whatever acceleration structure it
builds (graph, tree, inverted index) and answers batched kNN / range
queries. Differences from the reference, by design:

  * Queries are *batched* host arrays; the batch dimension replaces the
    reference's per-index thread pool (SURVEY.md §2.6).
  * Search functions are pure and jitted; query-time params participate
    in the jit cache key.
  * ``add_batch``/``delete_batch`` raise unless the method supports
    incremental maintenance (only sw-graph does in the reference,
    small_world_rand.cc:141-338).
"""

from __future__ import annotations

from typing import Any, Sequence

import numpy as np

from ..core.dataset import DataStore
from ..core.errors import SpaceIncompatibleError, RuntimeNmsError
from ..core.params import Params
from ..spaces.base import Space

#: Distances at or above this are padding/masked sentinels, never results.
RESULT_DIST_CUTOFF = 1e29


def stream_range_results(counts: np.ndarray, data, collect):
    """Shared tail of the streamed two-pass range scan (seq_search and
    vptree): size the result cap from the counts pass (128-bucketed so
    the jit cache stays small across radii), run the collect pass, and
    slice per-query (ids, dists) lists. ``collect(cap)`` returns
    ([Q, cap] dists, [Q, cap] corpus positions) ascending with
    (+inf, -1) pads. Device memory stays O(Q*cap), never [Q, N]."""
    from ..core.dataset import round_up

    f32 = np.zeros(0, np.float32)
    if counts.max(initial=0) == 0:
        return [(np.zeros(0, np.int32), f32) for _ in range(counts.shape[0])]
    cap = min(int(round_up(int(counts.max()), 128)), data.ids.shape[0])
    dk, pos = collect(cap)
    dk, pos = np.asarray(dk), np.asarray(pos)
    ids = np.asarray(data.ids)
    return [
        (ids[pos[i, :c]].copy(), dk[i, :c].copy()) for i, c in enumerate(counts)
    ]


class Method:
    name: str = "abstract"
    supports_range: bool = True
    supports_incremental: bool = False

    def __init__(self, space: Space, params: Params | None = None):
        self.space = space
        self.index_params = Params.of(params)
        self.query_params = Params()
        self.data = None  # encoded corpus
        self.store: DataStore | None = None
        self._dc_base = 0
        self._dc_pending: list = []

    # -- distance-computation counter (reference: query.h:33) --
    # Converting the device scalar eagerly would force a blocking
    # host-device sync on EVERY query call (profiled: ~40% of query wall
    # time over a remote link); counts are accumulated as device scalars
    # and only materialized when the counter is read.
    @property
    def dist_comps(self) -> int:
        if self._dc_pending:
            import numpy as np

            # pending items may be device scalars OR per-query i32
            # vectors (methods whose batch totals could overflow int32 on
            # device — e.g. 2048 queries x 1M-corpus range scans — report
            # per-query counts; the exact total is formed here in int64)
            self._dc_base += sum(
                int(np.asarray(x).astype(np.int64).sum()) for x in self._dc_pending
            )
            self._dc_pending.clear()
        return self._dc_base

    @dist_comps.setter
    def dist_comps(self, v) -> None:
        self._dc_base = int(v)
        self._dc_pending.clear()

    def _add_dist_comps(self, nd) -> None:
        self._dc_pending.append(nd)

    # -- lifecycle --
    def create_index(self, store: DataStore, params: Params | None = None) -> None:
        raise NotImplementedError

    def set_query_time_params(self, params: Params | None) -> None:
        self.query_params = Params.of(params)

    # -- queries --
    def knn(self, points: Any, k: int) -> tuple[np.ndarray, np.ndarray]:
        """Batched kNN. Returns (dists[B,k], ids[B,k]) sorted ascending;
        missing results (k > corpus) have id -1 and dist +inf."""
        raise NotImplementedError

    def range(self, points: Any, radius: float) -> list[tuple[np.ndarray, np.ndarray]]:
        raise SpaceIncompatibleError(f"Range search is not supported by {self.name}!")

    def knn_async(self, points: Any, k: int):
        """Dispatch a kNN batch without blocking on the results: return
        a zero-arg callable that materializes (dists, ids). Methods on
        the packed transport (ops/qpack.py) override this to leave the
        result on device so a caller can overlap the next batch's
        upload/compute with this one's download — per-batch transfers
        dominate wall time on remote-device links. Default: synchronous
        (already materialized)."""
        d, i = self.knn(points, k)
        return lambda: (d, i)

    # -- persistence (reference: index.h:56-63) --
    def save(self, path: str) -> None:
        raise RuntimeNmsError(f"save not supported by {self.name}")

    def load(self, path: str, store: DataStore) -> None:
        raise RuntimeNmsError(f"load not supported by {self.name}")

    # -- persistence state hooks (used by io/persist.py) --
    def state_arrays(self) -> dict:
        """Method-specific index state as host arrays (graph adjacency,
        trees, postings). Default: nothing — restore() rebuilds."""
        return {}

    def restore(self, store: DataStore, state: dict, params: Params | None = None) -> None:
        """Reconstruct from saved state; default rebuilds from the data."""
        self.create_index(store, params)

    def aux_device_arrays(self):
        """Device arrays beyond .data/.graph that count toward the index
        footprint (memory_usage_bytes) — e.g. upper-level adjacencies or
        replicated neighbor stores. Default: none."""
        return ()

    # -- incremental maintenance --
    def add_batch(self, store: DataStore, new_positions: Sequence[int]) -> None:
        raise RuntimeNmsError(f"{self.name} does not support incremental addition")

    def delete_batch(self, positions: Sequence[int], strategy: str = "none") -> None:
        raise RuntimeNmsError(f"{self.name} does not support deletion")

    # -- helpers --
    def _finalize_knn(self, dists, ids) -> tuple[np.ndarray, np.ndarray]:
        """Convert device results to host, mapping masked sentinels to
        (+inf, -1)."""
        d = np.asarray(dists)
        i = np.asarray(ids)
        bad = d >= RESULT_DIST_CUTOFF
        d = np.where(bad, np.inf, d)
        i = np.where(bad, -1, i)
        return d, i
