"""Experiment driver + cross-test-set aggregation (reference:
include/experiments.h Experiments::RunAll/Execute,
include/experimentconf.h ExperimentConfig, include/meta_analysis.h
MetaAnalysis, include/report.h).

``ExperimentConfig`` does the bootstrap index/query splitting of the
reference (experimentconf.h:40-150): ``test_set_qty`` random splits,
each holding out ``query_qty`` points as queries. ``Experiments.run``
sweeps query-time parameter sets, timing batched kNN and collecting the
eval_metrics quality numbers plus the reference's efficiency numbers
(QPS, improvement in distance computations vs sequential scan).
``MetaAnalysis`` aggregates per-split results into mean/std/confidence.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

import numpy as np

from ..core.dataset import DataStore
from ..core.params import Params
from ..utils.rng import np_rng
from .gold_standard import GoldStandard
from .metrics import per_query_metrics, summarize


@dataclass
class ExperimentConfig:
    """Bootstrap splitting of one dataset into index data + query sets."""

    test_set_qty: int = 1
    query_qty: int = 100
    seed: int = 0

    def split(self, n: int):
        """Yields (index_positions, query_positions) per test set."""
        rng = np_rng(self.seed)
        for _ in range(self.test_set_qty):
            perm = rng.permutation(n)
            q = min(self.query_qty, max(n - 1, 1))
            yield np.sort(perm[q:]), np.sort(perm[:q])


def _subset_store(store: DataStore, positions: np.ndarray) -> DataStore:
    sub = DataStore(store.kind)
    ids = [store.ids[p] for p in positions]
    pts = [store.get_point(int(p)) for p in positions]
    from ..core.dataset import DataKind

    if store.kind is DataKind.DENSE:
        sub.add_dense_batch(np.stack(pts), ids)
    elif store.kind is DataKind.UINT8:
        sub.add_uint8_batch(np.stack(pts), ids)
    elif store.kind is DataKind.SPARSE:
        sub.add_sparse_batch(pts, ids)
    else:
        sub.add_string_batch(pts, ids)
    return sub


def _query_points(store: DataStore, positions: np.ndarray):
    from ..core.dataset import DataKind

    pts = [store.get_point(int(p)) for p in positions]
    if store.kind in (DataKind.DENSE, DataKind.UINT8):
        return np.stack(pts)
    return pts


class Experiments:
    """Param-sweep benchmark runner over one (index data, queries) pair."""

    def __init__(self, space, index_store: DataStore, queries, k: int = 10):
        self.space = space
        self.store = index_store
        self.queries = queries
        self.k = k
        self.gold = GoldStandard(space, index_store)
        self.exact_d, self.exact_ids = self.gold.compute_knn(queries, k)
        self.n = len(index_store)
        self._labels = (
            index_store.label_of_id()
            if any(l != -1 for l in index_store.labels)
            else None
        )

    def run(self, method, query_param_sets: list[Params | dict | None], warmup: bool = True):
        """Returns one result row (dict) per query-time param set."""
        rows = []
        nq = self.exact_d.shape[0]
        for qp in query_param_sets:
            method.set_query_time_params(Params.of(qp) if qp is not None else None)
            if warmup:
                method.knn(self.queries, self.k)  # compile outside the timing
            dc0 = getattr(method, "dist_comps", 0)
            t0 = time.perf_counter()
            ad, aids = method.knn(self.queries, self.k)
            dt = max(time.perf_counter() - t0, 1e-9)
            dc = getattr(method, "dist_comps", 0) - dc0
            m = per_query_metrics(self.exact_d, self.exact_ids, ad, aids)
            row = summarize(m)
            if self._labels is not None:
                from .metrics import class_accuracy

                lab = np.vectorize(lambda i: self._labels.get(int(i), -1))
                row["class_accuracy"] = float(
                    np.mean(class_accuracy(lab(self.exact_ids), lab(aids)))
                )
            row["qps"] = nq / dt
            row["query_time_ms"] = dt * 1e3 / nq
            # improvement in dist comps vs the sequential scan (query.h:33,
            # experiments.h:136-140)
            row["improv_dist_comp"] = (nq * self.n) / max(dc, 1) if dc else float("inf")
            row["dist_comps"] = int(dc)
            row["params"] = Params.of(qp).as_dict() if qp is not None else {}
            rows.append(row)
        return rows


@dataclass
class MetaAnalysis:
    """Aggregates result rows across test splits (meta_analysis.h)."""

    rows: list[dict] = field(default_factory=list)

    def add(self, row: dict) -> None:
        self.rows.append(row)

    def aggregate(self) -> dict:
        if not self.rows:
            return {}
        keys = [k for k, v in self.rows[0].items() if isinstance(v, (int, float))]
        out = {}
        for k in keys:
            vals = np.asarray([r[k] for r in self.rows], float)
            finite = vals[np.isfinite(vals)]
            mean = float(np.mean(finite)) if finite.size else float("inf")
            std = float(np.std(finite, ddof=1)) if finite.size > 1 else 0.0
            out[k] = {
                "mean": mean,
                "std": std,
                # normal-approx 95% CI half-width, as meta_analysis.h reports
                "ci95": 1.96 * std / np.sqrt(max(len(finite), 1)),
            }
        return out


def run_full_experiment(
    space,
    store: DataStore,
    method_factory,
    config: ExperimentConfig,
    query_param_sets,
    k: int = 10,
):
    """RunAll analog: split -> build -> sweep -> aggregate."""
    metas: dict[int, MetaAnalysis] = {}
    for idx_pos, q_pos in config.split(len(store)):
        sub = _subset_store(store, idx_pos)
        queries = _query_points(store, q_pos)
        method = method_factory(space)
        method.create_index(sub)
        ex = Experiments(space, sub, queries, k)
        for i, row in enumerate(ex.run(method, query_param_sets)):
            metas.setdefault(i, MetaAnalysis()).add(row)
    return [m.aggregate() for _, m in sorted(metas.items())]
