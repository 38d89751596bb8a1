"""Public Index API — the L4 layer (reference: lib.zig:495-1270).

Preserved semantics (SURVEY.md §1 L4):
  * deferred data insertion: add*Batch only fills a host-side store; the
    device index is materialized by buildIndex (lib.zig:625-681);
  * auto-build on first query/save/param call (lib.zig:800, 890, ...);
  * "cosine" canonicalized to "cosinesimil" with reverse aliasing in
    get_space_type (lib.zig:530-533, 1234-1239);
  * sparse element ids >= 1 strictly increasing (lib.zig:728-738);
  * validation: leven requires Int dist, l2*/cosine* require dim,
    uint8 data requires Int dist (lib.zig:351-378);
  * thread-pool size is a stored knob (the batch dimension does the
    actual parallel work; reference stores-but-ignores it too,
    nmslib_c.cpp:1507-1535, README.md:209).

Deliberately fixed (documented reference quirks, SURVEY.md §1 L3):
  * set_query_time_params is *honored* per query instead of being reset
    to efSearch=200 on every knn call (nmslib_c.cpp:330, 986);
  * save/load persists the actual space+method in the header instead of
    hardcoding l2+hnsw on load (nmslib_c.cpp:1421-1429).
"""

from __future__ import annotations

from typing import Any, Sequence

import numpy as np

from .core.dataset import DataKind, DataStore, DistKind
from .core.errors import (
    IndexNotBuiltError,
    InvalidArgumentError,
)
from .core.params import Params
from .core.registry import (
    canonical_space_name,
    create_method,
    create_space,
    is_valid_space_type,
)
from .utils.logging import log


class QueryResult:
    """ids + distances for one query (reference: lib.zig:380-411)."""

    __slots__ = ("ids", "dists")

    def __init__(self, ids: np.ndarray, dists: np.ndarray):
        self.ids = ids
        self.dists = dists

    def __len__(self):
        return len(self.ids)

    def __repr__(self):
        return f"QueryResult(ids={self.ids.tolist()}, dists={self.dists.tolist()})"


class KnnFuture:
    """Handle for a dispatched-but-unread kNN batch
    (:meth:`Index.knn_query_batch_async`). ``result()`` blocks on the
    device transfer and returns the same (dists, ids) pair
    ``knn_query_batch`` would; it is idempotent."""

    __slots__ = ("_materialize", "_value")

    def __init__(self, materialize):
        self._materialize = materialize
        self._value = None

    def result(self) -> tuple[np.ndarray, np.ndarray]:
        if self._materialize is not None:
            self._value = self._materialize()
            self._materialize = None
        return self._value


class Index:
    """The user-facing index handle."""

    def __init__(
        self,
        space: str,
        space_params: Params | dict | None = None,
        method: str = "hnsw",
        data_type: DataKind | str = DataKind.DENSE,
        dist_type: DistKind | str = DistKind.FLOAT,
        mesh: Any = None,
    ):
        """``mesh``: scale the index over a device mesh — an int N (an
        N-device jax.sharding.Mesh is created at build time), or a Mesh.
        Supported methods: hnsw (per-shard subgraphs, parallel/
        hnsw_sharded.py) and seq_search/brute_force (sharded exact scan,
        parallel/sharded.py). The corpus is row-sharded, queries are
        replicated, per-shard top-k merges over ICI."""
        if isinstance(data_type, str):
            data_type = DataKind(data_type)
        if isinstance(dist_type, str):
            dist_type = DistKind(dist_type)
        self._requested_space = space
        self.space_name = canonical_space_name(space)
        self.method_name = method
        self.data_type = data_type
        self.dist_type = dist_type
        self.space_params = Params.of(space_params)
        self._validate_create_inputs()
        self.space = create_space(self.space_name, self.space_params)
        if self.space.data_kind is not data_type:
            raise InvalidArgumentError(
                f"space {self.space_name!r} holds {self.space.data_kind}, "
                f"but index was created with {data_type}"
            )
        if self.space.dist_kind is not dist_type:
            raise InvalidArgumentError(
                f"space {self.space_name!r} uses {self.space.dist_kind.value} distances, "
                f"but index was created with {dist_type.value}"
            )
        self.mesh = mesh
        if mesh is not None and method not in ("hnsw", "seq_search", "brute_force"):
            raise InvalidArgumentError(
                f"method {method!r} has no distributed implementation; "
                "mesh= supports hnsw and seq_search/brute_force"
            )
        self.store = DataStore(data_type)
        self.method = None
        self.built = False
        self._index_params: Params | None = None
        self._query_params: Params | None = None
        self._thread_pool_size = 0
        #: pad query batches to power-of-two buckets (see knn_query_batch)
        self.query_batch_bucketing = True

    # ---------------- validation (reference: lib.zig:351-378) ----------------

    def _validate_create_inputs(self) -> None:
        s = self.space_name
        if s == "leven" and self.dist_type is not DistKind.INT:
            raise InvalidArgumentError("leven requires Int distance type")
        if (
            (s.startswith("l2") or s.startswith("cosine"))
            and "sparse" not in s
            and s != "l2sqr_sift"  # fixed 128-byte SIFT layout needs no dim
            and not self.space_params.has("dim")
        ):
            raise InvalidArgumentError(f"space {s!r} requires a 'dim' space parameter")
        if (
            self.data_type is DataKind.UINT8
            and self.dist_type is not DistKind.INT
            and not s.startswith("bit_")
        ):
            # bit_jaccard is registered for float dist in the reference
            # (init_spaces.h) despite the uint8 data kind.
            raise InvalidArgumentError("dense uint8 vectors require Int distance type")

    # ---------------- insertion (deferred; lib.zig:625-681) ----------------

    def add_dense_batch(
        self,
        vectors: Any,
        ids: Sequence[int] | None = None,
        labels: Sequence[int] | None = None,
    ) -> None:
        self._check_dim(np.asarray(vectors))
        old = len(self.store)
        self.store.add_dense_batch(vectors, ids, labels)
        self._mark_dirty(old)

    def add_sparse_batch(self, points, ids: Sequence[int] | None = None) -> None:
        old = len(self.store)
        self.store.add_sparse_batch(points, ids)
        self._mark_dirty(old)

    def add_uint8_batch(self, vectors: Any, ids: Sequence[int] | None = None) -> None:
        old = len(self.store)
        self.store.add_uint8_batch(vectors, ids)
        self._mark_dirty(old)

    def add_bit_batch_packed(
        self,
        words: Any,
        n_bits: int | None = None,
        ids: Sequence[int] | None = None,
    ) -> None:
        """Add u32-word-packed bit vectors (the reference's native bit
        format, space_bit_hamming.h:43-52): bit j of word i is element
        32*i+j; pass ``n_bits`` to drop last-word padding. Unpacked to
        0/1 uint8 rows at ingestion — the TPU kernels popcount on the
        MXU over unpacked rows (spaces/bits.py)."""
        from .spaces.bits import unpack_bit_vectors

        self.add_uint8_batch(unpack_bit_vectors(words, n_bits), ids)

    def add_string_batch(self, strings: Sequence[str | bytes], ids: Sequence[int] | None = None) -> None:
        old = len(self.store)
        self.store.add_string_batch(strings, ids)
        self._mark_dirty(old)

    def delete_batch(self, positions: Sequence[int], strategy: str = "none") -> None:
        """Incremental deletion by store position; supported only by
        methods with incremental maintenance (reference: only sw-graph,
        small_world_rand.cc DeleteBatch)."""
        self._ensure_built()
        self.method.delete_batch(positions, strategy)

    def _check_dim(self, arr: np.ndarray) -> None:
        want = self.space_params.get("dim")
        if want is not None and arr.ndim >= 1:
            d = arr.shape[-1]
            if int(want) != d:
                raise InvalidArgumentError(f"dim param is {want} but batch has dim {d}")

    def _mark_dirty(self, old_count: int) -> None:
        # Methods with incremental maintenance (sw-graph) absorb post-build
        # additions in place (reference: AddBatch, small_world_rand.cc:141);
        # for everything else added data invalidates the device index and the
        # next query auto-rebuilds (the reference forbids post-build mutation
        # instead, index.h:35 DATA_MUTATION_ERROR_MSG — rebuilding is the fix).
        if (
            self.built
            and self.method is not None
            and self.method.supports_incremental
        ):
            self.method.add_batch(self.store, range(old_count, len(self.store)))
            return
        self.built = False

    # ---------------- build ----------------

    def _resolve_mesh(self):
        """int -> Mesh at first use (device enumeration is deferred so an
        Index can be constructed before the backend is chosen)."""
        if isinstance(self.mesh, int):
            from .parallel.mesh import make_mesh

            self.mesh = make_mesh(self.mesh)
        return self.mesh

    def _make_method(self, params: Params):
        """Method factory honoring the mesh routing (also used by the
        load path, io/persist.py)."""
        if self.mesh is not None:
            mesh = self._resolve_mesh()
            if self.method_name in ("seq_search", "brute_force"):
                from .parallel.sharded import DistributedSeqSearch

                return DistributedSeqSearch(self.space, mesh, params)
            from .parallel.hnsw_sharded import ShardedHnsw

            return ShardedHnsw(self.space, mesh, params)
        return create_method(self.method_name, self.space, params)

    def build_index(self, index_params: Params | dict | None = None, print_progress: bool = False) -> None:
        params = Params.of(index_params) if index_params is not None else (self._index_params or Params())
        self._index_params = params
        if print_progress:
            log("INFO", f"building {self.method_name} over {len(self.store)} objects")
        self.method = self._make_method(params)
        self.method.progress = print_progress  # per-wave logging (hnsw)
        self.method.create_index(self.store, params)
        if self._query_params is not None:
            self.method.set_query_time_params(self._query_params)
        self.built = True

    def _ensure_built(self) -> None:
        """Auto-build on first use (reference: lib.zig:800 et al.)."""
        if not self.built:
            self.build_index(self._index_params)

    def clear_index_cache(self) -> None:
        """Drop the built index, keep the data (reference: lib.zig clearIndexCache)."""
        self.method = None
        self.built = False

    def reset(self) -> None:
        """Drop index AND data (reference: lib.zig Index.reset)."""
        self.clear_index_cache()
        self.store = DataStore(self.data_type)

    # ---------------- queries ----------------

    def knn_query(self, point: Any, k: int) -> QueryResult:
        if k <= 0:
            raise InvalidArgumentError("k must be positive")
        d, i = self.knn_query_batch([point] if self.data_type is not DataKind.DENSE else np.asarray(point)[None, :], k)
        return self._trim(d[0], i[0])

    def knn_query_batch(self, points: Any, k: int) -> tuple[np.ndarray, np.ndarray]:
        """Batched kNN: returns (dists[B,k], ids[B,k]); missing slots are
        (+inf, -1). The reference's batch API is a serial loop
        (nmslib_c.cpp:1003-1031); here the batch dimension is the TPU's
        parallelism.

        Batch sizes are bucketed to the next power of two (padding with
        copies of the first query, results sliced back) so ragged
        workloads reuse compiled programs instead of recompiling per
        shape — XLA keys the jit cache on the batch dimension. Set
        ``index.query_batch_bucketing = False`` to disable. Distance-
        computation counters reflect the padded (performed) work.
        """
        if k <= 0:
            raise InvalidArgumentError("k must be positive")
        self._ensure_built()
        pts, b = self._bucket_query_points(points)
        d, i = self.method.knn(pts, k)
        d, i = d[:b], i[:b]
        if self.dist_type is DistKind.INT:
            d = np.where(np.isfinite(d), np.rint(d), d)
        return d, i

    def _bucket_query_points(self, points):
        """Prep + pad a query batch to its power-of-two bucket (copies
        of the first query; results are sliced back to the true batch).
        Returns (padded_points, true_batch_size)."""
        pts = self._prep_query_points(points)
        b = len(pts)
        bb = b
        if self.query_batch_bucketing and b > 0:
            bb = max(8, 1 << (b - 1).bit_length())
        if bb != b:
            if isinstance(pts, np.ndarray):
                pts = np.concatenate([pts, np.repeat(pts[:1], bb - b, axis=0)], 0)
            else:
                pts = list(pts) + [pts[0]] * (bb - b)
        return pts, b

    def knn_query_batch_results(self, points: Any, k: int) -> list[QueryResult]:
        d, i = self.knn_query_batch(points, k)
        return [self._trim(dr, ir) for dr, ir in zip(d, i)]

    def knn_query_batch_async(self, points: Any, k: int) -> "KnnFuture":
        """Dispatch a kNN batch and return immediately; call
        ``.result()`` for the same (dists, ids) knn_query_batch returns.

        Per-batch wall time on a remote-device link is dominated by
        transfer round trips (measured ~1.9x the device compute even on
        the packed transport); issuing the next batch before reading
        the previous one overlaps its upload/compute with this one's
        download, so a pipelined caller approaches device-bound
        throughput. Methods without a device-resident result path run
        synchronously inside this call (the future is pre-materialized).
        The reference has no analog — its queries share the index's
        address space (nmslib_c.cpp Search loops)."""
        if k <= 0:
            raise InvalidArgumentError("k must be positive")
        self._ensure_built()
        pts, b = self._bucket_query_points(points)
        done = self.method.knn_async(pts, k)

        def materialize():
            d, i = done()
            d, i = d[:b], i[:b]
            if self.dist_type is DistKind.INT:
                d = np.where(np.isfinite(d), np.rint(d), d)
            return d, i

        return KnnFuture(materialize)

    def range_query(self, point: Any, radius: float) -> QueryResult:
        return self.range_query_batch(
            [point] if self.data_type is not DataKind.DENSE
            else np.asarray(point)[None, :],
            radius,
        )[0]

    def range_query_batch(self, points: Any, radius: float) -> list[QueryResult]:
        """Batched range search: one QueryResult per query (ids/dists of
        every corpus point within ``radius``). The reference's RangeQuery
        is per-point (nmslib_c.cpp RangeSearch loop); here the batch
        dimension is the TPU's parallelism, same as knn_query_batch —
        results stream chunked device-side (no [Q, N] host matrix)."""
        self._ensure_built()
        pts = self._prep_query_points(points)
        res = self.method.range(pts, radius)
        out = []
        for ids, dists in res:
            if self.dist_type is DistKind.INT:
                dists = np.rint(dists)
            out.append(QueryResult(ids, dists))
        return out

    def _prep_query_points(self, points: Any):
        if self.data_type is DataKind.SPARSE:
            return [DataStore.validate_sparse(p) if not hasattr(p, "ids") else p for p in points]
        if self.data_type is DataKind.DENSE:
            arr = np.asarray(points, dtype=np.float32)
            if arr.ndim == 1:
                arr = arr[None, :]
            self._check_dim(arr)
            return arr
        if self.data_type is DataKind.UINT8:
            arr = np.asarray(points, dtype=np.uint8)
            return arr[None, :] if arr.ndim == 1 else arr
        return [p.encode("utf-8") if isinstance(p, str) else bytes(p) for p in points]

    @staticmethod
    def _trim(dists: np.ndarray, ids: np.ndarray) -> QueryResult:
        keep = ids >= 0
        return QueryResult(ids[keep], dists[keep])

    # ---------------- params / metadata ----------------

    def set_query_time_params(self, params: Params | dict | None) -> None:
        self._ensure_built()
        self._query_params = Params.of(params) if params is not None else None
        self.method.set_query_time_params(self._query_params)

    def set_thread_pool_size(self, n: int) -> None:
        if n < 0:
            raise InvalidArgumentError("thread pool size must be >= 0")
        self._thread_pool_size = n

    def get_thread_pool_size(self) -> int:
        return self._thread_pool_size

    def data_qty(self) -> int:
        return len(self.store)

    def get_space_type(self) -> str:
        # Reverse alias (reference: lib.zig:1234-1239).
        return self._requested_space if self._requested_space == "cosine" else self.space_name

    def get_method(self) -> str:
        return self.method_name

    def get_data_type(self) -> DataKind:
        return self.data_type

    def get_dist_type(self) -> DistKind:
        return self.dist_type

    # ---------------- data access ----------------

    def get_distance(self, pos_a: int, pos_b: int):
        """Space distance between two stored points (reference:
        nmslib_get_distance)."""
        a = self.store.get_point(pos_a)
        b = self.store.get_point(pos_b)
        return self.space.pairwise(self._raw(a), self._raw(b))

    def get_data_point(self, position: int):
        return self.store.get_point(position)

    def borrow_data_dense(self, position: int) -> np.ndarray:
        return np.asarray(self.store.get_point(position))

    def borrow_data_sparse(self, position: int):
        return self.store.get_point(position)

    def borrow_data_point_string(self, position: int) -> str:
        return self.store.get_point(position).decode("utf-8")

    def _raw(self, p):
        return p

    # ---------------- persistence ----------------

    def save(self, path: str, save_data: bool = True) -> None:
        self._ensure_built()
        from .io.persist import save_index

        save_index(self, path, save_data)

    @classmethod
    def load(cls, path: str, load_data: bool = True) -> "Index":
        from .io.persist import load_index

        return load_index(path, load_data)

    def memory_usage_bytes(self) -> int:
        """Device-side footprint estimate (reference:
        nmslib_index_memory_usage, nmslib_c.cpp:1546-1565)."""
        import jax

        total = 0
        if self.method is not None and self.method.data is not None:
            for leaf in jax.tree_util.tree_leaves(self.method.data):
                if hasattr(leaf, "nbytes"):
                    total += leaf.nbytes
            for leaf in jax.tree_util.tree_leaves(getattr(self.method, "graph", None) or ()):
                if hasattr(leaf, "nbytes"):
                    total += leaf.nbytes
            # upper-level adjacencies, replicated neighbor stores, ...
            for leaf in jax.tree_util.tree_leaves(list(self.method.aux_device_arrays())):
                if hasattr(leaf, "nbytes"):
                    total += leaf.nbytes
        return total
