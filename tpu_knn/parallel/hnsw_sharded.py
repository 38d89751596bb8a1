"""Corpus-sharded HNSW: one subgraph per device, searched in parallel.

The TPU-native scale-out of SURVEY.md §7 step 9: the corpus is split
into equal shards, each shard gets its own HNSW built by the wave
builder (methods/hnsw.py), the per-shard graphs and encoded corpus
arrays (space.corpus_dict — generic over dense/sparse/string layouts)
are stacked on a leading shard axis, and a query batch runs the batched
beam search on every shard simultaneously under shard_map, with one
all_gather + top-k merge over ICI at the end.

Recall note: searching S subgraphs with the same ef is slightly *more*
accurate than one big graph at equal total work, so recall parity with
the single-chip path holds by construction; tests assert it on the
8-device CPU mesh.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from jax.sharding import Mesh, PartitionSpec as P

from ..core.dataset import DataKind, DataStore
from ..core.params import Params, _convert
from ..methods.hnsw import Hnsw, make_wave_step
from ..ops import graph as G
from ..utils.logging import log
from .mesh import SHARD_AXIS
from .sharded import merge_sharded_topk


def _pad_rows_to(a: jnp.ndarray, n: int, fill) -> jnp.ndarray:
    if a.shape[0] == n:
        return a
    pad = jnp.full((n - a.shape[0],) + a.shape[1:], fill, a.dtype)
    return jnp.concatenate([a, pad], axis=0)


def _pad_to_shape(a: jnp.ndarray, shape: tuple, fill) -> jnp.ndarray:
    """Pad every axis of ``a`` up to ``shape`` with ``fill``. Per-shard
    encodes legitimately differ in padded widths (sparse nnz_max, padded
    vocabulary): stacking requires one common shape, and the fill must
    be the layout's own padding sentinel so widened rows stay inert."""
    if tuple(a.shape) == tuple(shape):
        return a
    out = a
    for ax, (have, want) in enumerate(zip(out.shape, shape)):
        if have == want:
            continue
        pad_shape = out.shape[:ax] + (want - have,) + out.shape[ax + 1 :]
        out = jnp.concatenate(
            [out, jnp.full(pad_shape, fill, out.dtype)], axis=ax
        )
    return out


def _stack_fill(key: str):
    """Padding sentinel per corpus/query-encoding key (sparse layouts:
    ops/sparse.py PAD_Q/PAD_X contract; masks pad with +big)."""
    if key in ("pad", "row_mask"):
        return 1e30
    if key == "cols":
        from ..ops.sparse import PAD_X

        return int(PAD_X)
    if key == "qcol":
        from ..ops.sparse import PAD_Q

        return int(PAD_Q)
    return 0


def _subset_store(store: DataStore, lo: int, hi: int, dense_mat=None) -> DataStore:
    """``dense_mat``: pass ``store.dense_matrix()`` hoisted out of a
    per-shard loop — dense_matrix re-stacks the WHOLE corpus on every
    call (O(n*S) host copies at build/restore otherwise)."""
    sub = DataStore(store.kind)
    ids = store.ids[lo:hi]
    if store.kind in (DataKind.DENSE, DataKind.UINT8):
        mat = (dense_mat if dense_mat is not None else store.dense_matrix())[lo:hi]
        if store.kind is DataKind.DENSE:
            labels = store.labels[lo:hi] if store.labels else None
            sub.add_dense_batch(mat, ids, labels=labels)
        else:
            sub.add_uint8_batch(mat, ids)
    elif store.kind is DataKind.SPARSE:
        sub.add_sparse_batch(store.sparse_points()[lo:hi], ids)
    else:
        sub.add_string_batch(store.strings()[lo:hi], ids)
    return sub


class ShardedHnsw:
    """Builds and queries S per-shard HNSW graphs under one mesh.

    Duck-types the Method protocol (methods/base.py) so Index can route
    to it directly via ``Index(..., mesh=...)`` — the reference's
    index-method contract (hnsw.cc CreateIndex/Search) over a device
    mesh instead of a thread pool."""

    name = "hnsw"
    supports_range = False
    supports_incremental = False
    progress = False

    def __init__(self, space, mesh: Mesh, index_params: Params | None = None,
                 axis: str = SHARD_AXIS):
        self.space = space
        self.mesh = mesh
        self.axis = axis
        pm = Params.of(index_params)
        # parallelBuild=1 (default): build all shard subgraphs at once
        # under shard_map — one insertion-wave program, S devices each
        # advancing their own subgraph. 0: one shard at a time (the
        # original path; also the fallback when a shard would be empty).
        self.parallel_build = _convert(pm.get("parallelBuild", True), bool)
        # build routing (VERDICT r4 item 4 — NND must not silently
        # degrade to waves under a mesh): "waves" runs the stacked
        # shard_map wave program; "nndescent" builds each shard's
        # subgraph with the single-device NND pipeline (device-resident
        # programs driven per shard); "auto" resolves per SHARD size
        # with the same threshold as the single-device router (each
        # shard is its own graph, so per-shard n is the right scale).
        self.build_algo = str(pm.get("buildAlgo", "auto"))
        if self.build_algo not in ("auto", "waves", "nndescent"):
            raise ValueError(f"bad buildAlgo {self.build_algo!r}")
        self.build_algo_auto_n = _convert(pm.get("buildAlgoAutoN", 300_000), int)
        d = pm.as_dict()
        d.pop("parallelBuild", None)
        self.params = Params(d)
        self.ef_search = 20
        self.expand = 4
        self._stacked = None
        self._shard_meta: list[dict] = []  # per-shard host state (persistence)
        self.dist_comps = 0
        self.store: DataStore | None = None

    # ---------------- Method protocol (methods/base.py duck type) ----

    @property
    def data(self):
        """Stacked per-shard corpus encodings (memory accounting)."""
        return self._stacked["corpus"] if self._stacked else None

    @property
    def graph(self):
        if not self._stacked:
            return None
        return {"level0": self._stacked["level0"], "upper": self._stacked["upper"]}

    def aux_device_arrays(self):
        return (self._stacked["ids"],) if self._stacked else ()

    def create_index(self, store: DataStore, params: Params | None = None) -> None:
        self.build(store)

    def knn_is_exact(self) -> bool:
        return False

    def range(self, points, radius: float):
        from ..core.errors import RuntimeNmsError

        raise RuntimeNmsError("sharded hnsw does not support range queries")

    def add_batch(self, store, new_positions):
        from ..core.errors import RuntimeNmsError

        raise RuntimeNmsError("sharded hnsw does not support incremental addition")

    def delete_batch(self, positions, strategy="none"):
        from ..core.errors import RuntimeNmsError

        raise RuntimeNmsError("sharded hnsw does not support deletion")

    # ---------------- build ----------------

    def _shard_bounds(self, n: int, s: int) -> list[tuple[int, int]]:
        """Balanced split: every shard non-empty whenever n >= s."""
        sizes = [n // s + (1 if i < n % s else 0) for i in range(s)]
        lo, out = 0, []
        for sz in sizes:
            out.append((lo, lo + sz))
            lo += sz
        return out

    def build(self, store: DataStore) -> None:
        self.store = store
        s = self.mesh.devices.size
        n = len(store)
        bounds = self._shard_bounds(n, s)
        algo = self.build_algo
        if algo == "auto":
            # sparse corpora ride the sketch proxy and stay on waves,
            # same as the single-device auto rule
            n_per = (n + s - 1) // max(s, 1)
            algo = (
                "nndescent"
                if n_per >= self.build_algo_auto_n
                and store.kind in (DataKind.DENSE, DataKind.UINT8)
                else "waves"
            )
        if algo == "nndescent":
            # per-shard NND: each shard's subgraph is built by the
            # proven single-device NND pipeline (methods/hnsw.py
            # _build_nndescent) on its corpus slice — honest routing of
            # the flagship construction algorithm under a mesh; the
            # stacked query program is identical to the wave path's.
            self._build_sequential(store, bounds, algo="nndescent")
        elif self.parallel_build and s > 1 and n >= s:
            self._build_parallel(store, bounds)
        else:
            self._build_sequential(store, bounds)

    @staticmethod
    def _dense_mat(store: DataStore):
        """dense_matrix() hoisted out of the per-shard loops (it
        re-stacks the whole corpus per call)."""
        if store.kind in (DataKind.DENSE, DataKind.UINT8) and len(store):
            return store.dense_matrix()
        return None

    def _global_vocab_floor(self, store: DataStore) -> int:
        """Max term id over the WHOLE corpus, so per-shard sparse encodes
        all pad to one vocabulary width (ids are sorted per point, so the
        last id is the per-point max)."""
        if store.kind is not DataKind.SPARSE:
            return 0
        return max(
            (int(p.ids[-1]) for p in store.sparse_points() if len(p.ids)),
            default=0,
        )

    def _configure_shard(self, h: Hnsw, vocab_floor: int) -> None:
        """Shared-projection knobs: every shard encodes against the same
        padded vocabulary and seeds its JL sketch proxy identically, so
        all shards share one R matrix (methods/hnsw.py _encode_store) —
        sketches from different shards live in the same proxy space and
        the stacked build program sees uniform widths."""
        h.vocab_floor = vocab_floor
        h.sketch_seed = int(self.params.get("seed", 0) or 0)

    def _build_sequential(self, store: DataStore, bounds, algo: str = "waves") -> None:
        vf = self._global_vocab_floor(store)
        mat = self._dense_mat(store)
        shards: list[Hnsw] = []
        for si, (lo, hi) in enumerate(bounds):
            h = Hnsw(self.space, Params.of(self.params, seed=self._seed(si),
                                           buildAlgo=algo))
            self._configure_shard(h, vf)
            h.create_index(_subset_store(store, lo, hi, mat))
            shards.append(h)
        self._stack(shards)

    def _seed(self, si: int) -> int:
        return int(self.params.get("seed", 0) or 0) + si

    def _build_parallel(self, store: DataStore, bounds) -> None:
        """Build every shard's subgraph simultaneously: prepare each shard
        on host (level sampling, reorder, encode, empty graph), stack the
        states on the shard axis, then run the batched insertion waves for
        ALL shards in one shard_map program — each device advances its own
        subgraph, no collectives needed until query time. The sequential
        path runs the same wave step one shard at a time, so the resulting
        graphs are identical distribution-wise (per-shard seeds match)."""
        vf = self._global_vocab_floor(store)
        mat = self._dense_mat(store)
        shards: list[Hnsw] = []
        for si, (lo, hi) in enumerate(bounds):
            # pin waves: the stacked program needs the corpus-as-queries
            # encodings that _prepare would skip for an NND-routed shard
            h = Hnsw(self.space, Params.of(self.params, seed=self._seed(si),
                                           buildAlgo="waves"))
            self._configure_shard(h, vf)
            h._prepare(_subset_store(store, lo, hi, mat))
            shards.append(h)
        self._stack(shards)  # stacks corpus/ids + the (empty) level0/upper
        self._run_stacked_waves(shards)
        log("DEBUG", f"sharded hnsw: parallel build of {len(shards)} shards done")

    def _run_stacked_waves(self, shards: list[Hnsw]) -> None:
        cfg = shards[0]
        s = len(shards)
        per = max(h._n_total for h in shards)
        w = int(min(cfg.wave, per))
        # ramped wave schedule (methods/hnsw._run_waves): every shard
        # subgraph starts EMPTY, so a full-width first wave would leave
        # each shard a mates-only backbone — the small-corpus recall
        # collapse measured in round 4 (0.53 at waveSize/n=0.5), hit
        # HARDER here because per-shard n is corpus/S. Head waves ramp
        # 128,128,256,... so each links into a frozen prefix its own
        # size; one compiled program per distinct width (cached).
        # Same w > per/64 threshold as the single-device builder (the
        # ramp hurts near-tied construction order when the first wave
        # is already a tiny fraction — r4_sparse.jsonl rampab).
        # honor the WAVE_RAMP A/B flag the single-device builder uses
        # (ADVICE r4: flipping it for order-sensitivity studies must
        # affect sharded builds too)
        from ..methods.hnsw import WAVE_RAMP

        schedule: list[tuple[int, int]] = []
        pos = 0
        if w > 128 and w > per // 64 and WAVE_RAMP:
            ramp, sz = [128, 128], 256
            while sz <= w // 2:
                ramp.append(sz)
                sz *= 2
            for sz in ramp:
                sz = min(sz, per - pos)
                if sz <= 0:
                    break
                schedule.append((pos, sz))
                pos += sz
        while pos < per:
            schedule.append((pos, w))
            pos += w
        num_waves = len(schedule)
        max_level = max(h._max_level for h in shards)

        # stacked per-node query encodings, row-padded to a common count;
        # non-per-point entries (static/config leaves) stay replicated
        n_q = per
        qenc_st, per_point = self._stack_qenc(
            [h._qenc_all for h in shards], shards, n_q
        )

        # sparse shards carry a shared-R sketch proxy (methods/hnsw.py
        # _encode_store): the stacked build then runs on the dense proxy
        # corpus — the same proven MXU wave path as single-chip sparse
        # builds — with the host-space corpus riding along for the exact
        # base/pair refinement (exactBase/exactPairs).
        use_proxy = shards[0]._proxy is not None
        st = self._stacked
        if use_proxy:
            n_pad = max(h.data.ids.shape[0] for h in shards)
            build_corpus = self._stack_corpus(
                [
                    self._corpus_with_mask(
                        h._graph_space.corpus_dict(h._graph_data),
                        h._graph_data.extra["pad"],
                    )
                    for h in shards
                ],
                n_pad,
            )
            build_space = shards[0]._graph_space
        else:
            build_corpus = st["corpus"]
            # index-time scoring space (fusion indexWeights view; self for
            # every other space) — matches the single-chip build path
            build_space = self.space.construction_space()
        exact = use_proxy and shards[0]._exact_qenc_all is not None
        if exact:
            eqenc_st, e_per_point = self._stack_qenc(
                [h._exact_qenc_all for h in shards], shards, n_q
            )
            ecorpus_st = st["corpus"]  # host-space stack already built
        else:
            eqenc_st, e_per_point, ecorpus_st = {}, set(), {}

        # per-shard level arrays over the padded wave range (-1 pads are
        # no-ops: the wave step never connects wl<0 rows)
        wl_width = max(off for off, _ in schedule) + w
        wl_st = np.full((s, wl_width), -1, np.int32)
        for si, h in enumerate(shards):
            wl_st[si, : len(h.levels)] = h.levels
        wl_st = jnp.asarray(wl_st)

        n_upper = len(st["upper"])
        axis = self.axis

        in_specs = (
            P(axis),
            tuple(P(axis) for _ in range(n_upper)),
            P(axis),
            jax.tree_util.tree_map(lambda _: P(axis), build_corpus),
            {k: (P(axis) if k in per_point else P()) for k in qenc_st},
            jax.tree_util.tree_map(lambda _: P(axis), ecorpus_st),
            {k: (P(axis) if k in e_per_point else P()) for k in eqenc_st},
            P(),
            P(),
        )

        def make_f(width: int):
            step = make_wave_step(
                build_space,
                n_q,
                width,
                max_level,
                efc=cfg.ef_construction,
                m=cfg.M,
                m0cap=cfg.maxM0,
                mcap=cfg.maxM,
                mates=min(cfg.wave_mates, width),
                expand=cfg.construction_expand,
                selection="none" if cfg.delaunay_type == 0 else "heur",
                exact_space=self.space if exact else None,
                exact_pairs=exact and bool(cfg.exact_pairs),
                exact_base=bool(cfg.exact_base),
            )

            def local(level0_l, upper_l, wl_l, corpus_l, qenc_l, ecorpus_l,
                      eqenc_l, start, limit):
                corpus = {k: v[0] for k, v in corpus_l.items()}
                qe = {k: (v[0] if k in per_point else v) for k, v in qenc_l.items()}
                ec = {k: v[0] for k, v in ecorpus_l.items()} or None
                eq = {
                    k: (v[0] if k in e_per_point else v) for k, v in eqenc_l.items()
                } or None
                wl = jax.lax.dynamic_slice_in_dim(wl_l[0], start, width)
                l0, up = step(
                    level0_l[0], [u[0] for u in upper_l], start, wl,
                    jnp.int32(0), limit, corpus, qe, ec, eq,
                )
                return l0[None], tuple(u[None] for u in up)

            return jax.jit(
                jax.shard_map(
                    local,
                    mesh=self.mesh,
                    in_specs=in_specs,
                    out_specs=(P(axis), tuple(P(axis) for _ in range(n_upper))),
                    check_vma=False,
                ),
                donate_argnums=(0, 1),
            )

        fs: dict = {}

        def get_f(width: int):
            if width not in fs:
                fs[width] = make_f(width)
            return fs[width]

        level0, upper = st["level0"], st["upper"]
        for off, width in schedule:
            level0, upper = get_f(width)(
                level0, upper, wl_st, build_corpus, qenc_st, ecorpus_st,
                eqenc_st, jnp.int32(off), jnp.int32(off)
            )
        for _ in range(cfg.post):
            for off, width in reversed(schedule):
                level0, upper = get_f(width)(
                    level0, upper, wl_st, build_corpus, qenc_st, ecorpus_st,
                    eqenc_st, jnp.int32(off), jnp.int32(n_q)
                )
        st["level0"], st["upper"] = level0, tuple(upper)

    @staticmethod
    def _stack_qenc(dicts: list[dict], shards: list[Hnsw], n_q: int):
        """Stack per-shard query-encoding dicts on a leading shard axis.
        Per-point arrays (leading axis == the shard's point count) pad
        rows to ``n_q`` and other axes to the per-key max; static/config
        leaves stay replicated. Returns (stacked, per_point_keys)."""
        ref = dicts[0]
        per_point = {
            k
            for k, v in ref.items()
            if hasattr(v, "ndim") and v.ndim >= 1 and v.shape[0] == shards[0]._n_total
        }
        out = {}
        for k, v0 in ref.items():
            if v0 is None:
                continue
            if k in per_point:
                tgt = (n_q,) + tuple(
                    max(d[k].shape[ax] for d in dicts) for ax in range(1, v0.ndim)
                )
                fill = _stack_fill(k)
                out[k] = jnp.stack([_pad_to_shape(d[k], tgt, fill) for d in dicts])
            else:
                out[k] = v0
        return out, per_point

    @staticmethod
    def _corpus_with_mask(c: dict, pad) -> dict:
        """Per-shard counts differ, so the static-count row masking of
        ops/graph.py can't apply across the stack: every shard gets an
        explicit row_mask instead."""
        c.pop("count", None)
        c.setdefault("row_mask", pad)
        return {k: v for k, v in c.items() if v is not None}

    @staticmethod
    def _stack_corpus(per_shard_c: list[dict], n_pad: int, stacked: bool = True):
        """Unify per-shard corpus dicts to common shapes and stack them on
        a leading shard axis (``stacked=False`` returns the padded lists).
        Only keys every shard produced survive (e.g. one shard's
        vocabulary may exceed the dense gate and omit vocab_mark)."""
        corpus_keys = [
            k for k in per_shard_c[0] if all(k in c for c in per_shard_c)
        ]
        corpus_stacks: dict[str, list] = {}
        for k in corpus_keys:
            # per-row arrays (leading axis == the shard's corpus rows) pad
            # rows to n_pad; every other axis — and non-row-indexed arrays
            # like vocab_mark — pads to the per-key max across shards
            per_row = k != "vocab_mark" and all(
                c[k].shape[0] == c["vecs"].shape[0] for c in per_shard_c
            )
            tgt = tuple(
                max(c[k].shape[ax] for c in per_shard_c)
                for ax in range(per_shard_c[0][k].ndim)
            )
            if per_row:
                tgt = (n_pad,) + tgt[1:]
            fill = _stack_fill(k)
            corpus_stacks[k] = [_pad_to_shape(c[k], tgt, fill) for c in per_shard_c]
        if stacked:
            return {k: jnp.stack(v) for k, v in corpus_stacks.items()}
        return corpus_stacks

    def _stack(self, shards: list[Hnsw]) -> None:
        n_pad = max(h.data.ids.shape[0] for h in shards)
        max_lv = max(len(h._upper) for h in shards)
        m = shards[0].maxM
        u_rows = [
            max((h._upper[l].shape[0] if l < len(h._upper) else 1) for h in shards)
            for l in range(max_lv)
        ]
        per_shard_c = [
            self._corpus_with_mask(self.space.corpus_dict(h.data), h.data.extra["pad"])
            for h in shards
        ]
        corpus_stacks = self._stack_corpus(per_shard_c, n_pad, stacked=False)
        ids, lvl0 = [], []
        uppers: list[list] = [[] for _ in range(max_lv)]
        for h in shards:
            ids.append(_pad_rows_to(h.data.ids, n_pad, -1))
            lvl0.append(_pad_rows_to(h.graph["level0"], n_pad, -1))
            for l in range(max_lv):
                u = h._upper[l] if l < len(h._upper) else jnp.full((1, m), -1, jnp.int32)
                uppers[l].append(_pad_rows_to(u, u_rows[l], -1))
        self._stacked = {
            "corpus": {k: jnp.stack(v) for k, v in corpus_stacks.items()},
            "ids": jnp.stack(ids),
            "level0": jnp.stack(lvl0),
            "upper": tuple(jnp.stack(u) for u in uppers),
        }
        # small host-side per-shard state: enough to restore each shard's
        # Hnsw (methods/hnsw.py state_arrays contract) from the stacked
        # graph arrays without rebuilding
        self._shard_meta = [
            {
                "levels": np.asarray(h.levels),
                "order": np.asarray(h.order),
                "meta": np.asarray(
                    [h.M, h.maxM, h.maxM0, h.ef_construction, h._entry]
                ),
                "rows": int(h.data.ids.shape[0]),
                "upper_rows": [int(u.shape[0]) for u in h._upper],
            }
            for h in shards
        ]
        self._shard_devices()

    def _shard_devices(self) -> None:
        from jax.sharding import NamedSharding

        sh = NamedSharding(self.mesh, P(self.axis))
        st = self._stacked
        st["corpus"] = {k: jax.device_put(v, sh) for k, v in st["corpus"].items()}
        st["ids"] = jax.device_put(st["ids"], sh)
        st["level0"] = jax.device_put(st["level0"], sh)
        st["upper"] = tuple(jax.device_put(u, sh) for u in st["upper"])

    # ---------------- persistence (io/persist.py hooks) ----------------

    def state_arrays(self) -> dict:
        """Stacked graph arrays + the small per-shard host state needed
        to re-slice them into shard Hnsw states on restore."""
        if self._stacked is None:
            return {}
        st = self._stacked
        out = {
            "mesh_size": np.asarray([len(self._shard_meta)]),
            "level0": np.asarray(st["level0"]),
        }
        for l, u in enumerate(st["upper"]):
            out[f"upper_{l}"] = np.asarray(u)
        for si, m in enumerate(self._shard_meta):
            out[f"s{si}_levels"] = m["levels"]
            out[f"s{si}_order"] = m["order"]
            out[f"s{si}_meta"] = m["meta"]
            out[f"s{si}_rows"] = np.asarray([m["rows"]])
            out[f"s{si}_upper_rows"] = np.asarray(m["upper_rows"], np.int64)
        return out

    def restore(self, store: DataStore, state: dict, params: Params | None = None) -> None:
        if not state:
            self.build(store)
            return
        s = self.mesh.devices.size
        saved = int(np.asarray(state["mesh_size"])[0])
        if saved != s:
            from ..core.errors import InvalidArgumentError

            raise InvalidArgumentError(
                f"sharded index was saved with {saved} shards; current mesh has {s}"
            )
        bounds = self._shard_bounds(len(store), s)
        mat = self._dense_mat(store)
        shards = []
        for si, (lo, hi) in enumerate(bounds):
            sub = _subset_store(store, lo, hi, mat)
            h = Hnsw(self.space, Params.of(self.params, seed=self._seed(si)))
            # the graph arrays are already built; the sketch proxy is a
            # construction-only artifact (queries traverse the host space),
            # so skip the proxy encode on restore. vocab_floor still
            # applies: the stacked corpus widths must match the saved ones.
            h.sketch_dim = 0
            h.vocab_floor = self._global_vocab_floor(store)
            rows = int(np.asarray(state[f"s{si}_rows"])[0])
            sh_state = {
                "level0": np.asarray(state["level0"])[si][:rows],
                "levels": state[f"s{si}_levels"],
                "order": state[f"s{si}_order"],
                "meta": state[f"s{si}_meta"],
            }
            for l, ur in enumerate(np.asarray(state[f"s{si}_upper_rows"]).tolist()):
                sh_state[f"upper_{l}"] = np.asarray(state[f"upper_{l}"])[si][: int(ur)]
            h.restore(sub, sh_state)
            shards.append(h)
        self._stack(shards)
        self.store = store

    # ---------------- search ----------------

    #: method default efSearch (mirrors methods/hnsw.py)
    DEFAULT_EF_SEARCH = 20
    DEFAULT_EXPAND = 4

    def set_query_time_params(self, params: Params | None) -> None:
        # mirror the single-chip Hnsw's validation: unknown keys and
        # ef/efSearch conflicts raise instead of silently running at
        # stale defaults
        from ..core.params import ParamManager

        if params is None:  # reset to defaults (Index passes None)
            self.ef_search = self.DEFAULT_EF_SEARCH
            self.expand = self.DEFAULT_EXPAND
            return
        pm = ParamManager(Params.of(params))
        self.ef_search = pm.get_synonym(["ef", "efSearch"], self.ef_search, int)
        pm.get("algoType", "hybrid", str)  # parity no-op
        if pm.has("searchExpand"):
            self.expand = pm.get("searchExpand", self.expand, int)
        pm.check_unused()

    def knn(self, points, k: int):
        qenc = self.space.encode_queries(points)
        ef = max(self.ef_search, k)
        st = self._stacked
        d, ids, nd = _sharded_search(
            self.space, qenc, st["corpus"], st["ids"],
            st["level0"], st["upper"], ef, k, self.expand, self.mesh, self.axis,
        )
        d = np.asarray(d)
        ids = np.asarray(ids)
        # candidate scorings across ALL shards (reference dist-comp
        # counter, query.h:33); the np.asarray above already synced
        self.dist_comps += int(nd)
        bad = ~np.isfinite(d) | (d >= 1e29)
        return np.where(bad, np.inf, d), np.where(bad, -1, ids)


@partial(
    jax.jit,
    static_argnames=("space", "ef", "k", "expand", "mesh", "axis"),
)
def _sharded_search(space, qenc, corpus_st, ids, level0, upper, ef, k, expand,
                    mesh, axis):
    def local(qenc_l, corpus_l, ids_l, level0, upper):
        # strip the leading local-shard axis of size 1
        corpus = {kk: v[0] for kk, v in corpus_l.items()}
        ids_one, level0 = ids_l[0], level0[0]
        upper = tuple(u[0] for u in upper)
        b = next(v.shape[0] for v in qenc_l.values() if hasattr(v, "ndim") and v.ndim >= 1)
        cur = jnp.zeros(b, jnp.int32)
        cur_d = G.score_rows(space, qenc_l, corpus, cur[:, None])[:, 0]
        for adj in reversed(upper):
            cur, cur_d = G.greedy_descent(space, qenc_l, corpus, adj, None, cur, cur_d)
        beam_d, beam_i, nd = G.beam_search(
            space, qenc_l, corpus, level0, None, cur, ef=ef, expand=expand
        )
        d, pos = beam_d[:, :k], beam_i[:, :k]
        out_ids = jnp.where(pos >= 0, ids_one[jnp.clip(pos, 0, ids_one.shape[0] - 1)], -1)
        md, mi = merge_sharded_topk(d, out_ids, k, axis)
        return md, mi, jax.lax.psum(nd, axis)

    specs = (
        jax.tree_util.tree_map(lambda _: P(), qenc),
        jax.tree_util.tree_map(lambda _: P(axis), corpus_st),
        P(axis),
        P(axis),
        tuple(P(axis) for _ in upper),
    )
    f = jax.shard_map(
        local, mesh=mesh, in_specs=specs, out_specs=(P(), P(), P()),
        check_vma=False,
    )
    return f(qenc, corpus_st, ids, level0, upper)
