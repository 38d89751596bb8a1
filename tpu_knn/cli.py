"""Experiment CLI — the reference's ``experiment`` binary surface
(reference: include/params_def.h flag names, include/cmd_options.h,
src/params_cmdline.cc; the binary itself is not built by the reference's
build.zig, but the flag surface is part of the harness).

Usage:
    python -m tpu_knn --spaceType l2 --dataFile vectors.txt \
        --method hnsw --createIndex M=16,efConstruction=200 \
        --queryTimeParams efSearch=50 --queryTimeParams efSearch=200 \
        --knn 10 --testSetQty 2 --maxNumQuery 200

Dense data files are whitespace-separated vectors, one per line; sparse
files are "id:val" pairs per line (1-based ascending ids); string spaces
read raw lines. Results print as a table per k/range value (report.h).
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

from .core.dataset import DataKind, DataStore, DistKind
from .core.params import Params
from .core.registry import create_method, create_space
from .eval.experiments import ExperimentConfig, Experiments, MetaAnalysis
from .eval.report import format_table
from .utils.logging import LOGGER, log


def _parse_kv(s: str) -> Params:
    return Params([kv.strip() for kv in s.split(",") if kv.strip()])


def _read_dense(path: str) -> np.ndarray:
    """Dense matrix from whitespace text or fvecs/bvecs/ivecs binary
    (by extension)."""
    if path.rsplit(".", 1)[-1].lower() in ("fvecs", "bvecs", "ivecs"):
        from .io.native import read_vecs

        return read_vecs(path)
    from .io.native import read_dense_text

    return read_dense_text(path)


def _load_store(space, path: str, max_num: int) -> DataStore:
    kind = space.data_kind
    store = DataStore(kind)
    if kind is DataKind.DENSE:
        mat = _read_dense(path).astype(np.float32, copy=False)
        if max_num:
            mat = mat[:max_num]
        store.add_dense_batch(mat)
    elif kind is DataKind.UINT8:
        mat = _read_dense(path).astype(np.uint8)
        if max_num:
            mat = mat[:max_num]
        store.add_uint8_batch(mat)
    elif kind is DataKind.SPARSE:
        from .io.native import read_sparse_text

        row_len, ids, vals = read_sparse_text(path)
        pts, off = [], 0
        for n in row_len[: max_num or None]:
            pts.append((ids[off : off + n], vals[off : off + n]))
            off += int(n)
        store.add_sparse_batch(pts)
    else:
        with open(path, "rb") as f:
            lines = [ln.rstrip(b"\n") for ln in f if ln.strip()]
        if max_num:
            lines = lines[:max_num]
        store.add_string_batch(lines)
    return store


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="tpu_knn", description="similarity-search experiment harness"
    )
    a = p.add_argument
    a("--spaceType", "-s", required=True, help="space type, e.g., l1, l2, lp")
    a("--spaceParams", default="", help="space parameters key=value[,key=value]")
    a("--distType", default="float", choices=["int", "float"], help="distance value type")
    a("--dataFile", "-i", required=True, help="input data file")
    a("--maxNumData", "-D", type=int, default=0, help="use only the first maxNumData elements")
    a("--queryFile", "-q", default="", help="query file")
    a("--maxNumQuery", "-Q", type=int, default=0, help="number of queries (bootstrapping)")
    a("--testSetQty", "-b", type=int, default=1, help="# of bootstrap test sets (ignored if queryFile)")
    a("--method", "-m", default="hnsw", help="index method")
    a("--createIndex", "-c", default="", help="index-time parameters")
    a("--queryTimeParams", "-t", action="append", default=[], help="query-time parameter set (repeatable)")
    a("--knn", "-k", default="", help="comma-separated K values for k-NN search")
    a("--range", "-r", dest="range_", default="", help="comma-separated radii for range searches")
    a("--saveIndex", "-S", default="", help="location to save the index to")
    a("--loadIndex", "-L", default="", help="location to load the index from")
    a("--cachePrefixGS", "-g", default="", help="gold-standard cache file prefix")
    a("--recallOnly", action="store_true", help="compute only recall")
    a("--logFile", "-l", default="", help="log file")
    a("--outFile", "-o", default="", help="result output file (default stdout)")
    a("--platform", default="", help="JAX platform pin (cpu/tpu); defaults to $JAX_PLATFORMS")
    return p


def _pin_platform(requested: str) -> None:
    """Apply the platform choice before first device use. The env var
    alone does not stick on images whose site hook pre-selects an
    experimental platform — jax.config.update is the reliable path."""
    plat = requested or os.environ.get("JAX_PLATFORMS", "")
    if not plat:
        return
    import jax

    try:
        jax.config.update("jax_platforms", plat)
    except Exception:
        pass  # backend already initialized; env choice already took


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    _pin_platform(args.platform)
    from .utils.jitcache import enable_persistent_cache

    enable_persistent_cache()  # TPU_KNN_JIT_CACHE=0 disables
    if args.logFile:
        LOGGER.set_file(args.logFile)
    out = open(args.outFile, "w") if args.outFile else sys.stdout

    space = create_space(args.spaceType, _parse_kv(args.spaceParams))
    from .core.dataset import DistKind
    from .core.errors import InvalidArgumentError

    if DistKind(args.distType) is not space.dist_kind:
        raise InvalidArgumentError(
            f"--distType {args.distType} does not match space "
            f"{args.spaceType!r} ({space.dist_kind.value} distances)"
        )
    if (args.saveIndex or args.loadIndex) and not args.queryFile:
        raise InvalidArgumentError(
            "--saveIndex/--loadIndex require --queryFile: bootstrap test "
            "splits build a different index per split"
        )
    loaded_method = None
    if args.loadIndex:
        from .api import Index

        lidx = Index.load(args.loadIndex)
        store = lidx.store
        space = lidx.space
        loaded_method = lidx.method
        log("INFO", f"loaded index from {args.loadIndex} ({len(store)} points)")
    else:
        store = _load_store(space, args.dataFile, args.maxNumData)
        log("INFO", f"loaded {len(store)} data points from {args.dataFile}")
    qsets = [q for q in (args.queryTimeParams or [None])]
    qparams = [_parse_kv(q) if q else None for q in qsets]
    ks = [int(v) for v in args.knn.split(",") if v.strip()]
    radii = [float(v) for v in args.range_.split(",") if v.strip()]

    def method_factory(sp):
        return create_method(args.method, sp, _parse_kv(args.createIndex))

    def _save_built(method, sub) -> None:
        """Persist through the two-artifact format Index.load reads."""
        from .api import Index

        sidx = Index(
            args.spaceType, _parse_kv(args.spaceParams), args.method,
            store.kind, args.distType,
        )
        sidx.space = space  # the exact instance the method was built with
        sidx.store = sub
        sidx.method = method
        sidx._index_params = _parse_kv(args.createIndex)
        sidx.built = True
        sidx.save(args.saveIndex)
        log("INFO", f"saved index to {args.saveIndex}")

    if args.queryFile:
        qstore = _load_store(space, args.queryFile, args.maxNumQuery)
        splits = [(None, qstore)]
    else:
        cfg = ExperimentConfig(
            test_set_qty=max(args.testSetQty, 1),
            query_qty=args.maxNumQuery or 100,
        )
        splits = list(cfg.split(len(store)))

    for k in ks:
        metas: dict[int, MetaAnalysis] = {}
        for split in splits:
            if args.queryFile:
                sub, queries = store, _store_points(space, split[1])
            else:
                from .eval.experiments import _query_points, _subset_store

                sub = _subset_store(store, split[0])
                queries = _query_points(store, split[1])
            if loaded_method is not None:
                method = loaded_method  # already built on the full store
            else:
                method = method_factory(space)
                method.create_index(sub)
                if args.saveIndex:
                    _save_built(method, sub)
            ex = Experiments(space, sub, queries, k)
            for i, row in enumerate(ex.run(method, qparams)):
                metas.setdefault(i, MetaAnalysis()).add(row)
            if args.cachePrefixGS:
                # after run(): the kNN gold standard is computed lazily on
                # the first run() (saving earlier would raise)
                ex.gold.save_cache(f"{args.cachePrefixGS}.k{k}")
        rows = []
        for i, m in sorted(metas.items()):
            agg = m.aggregate()
            row = {"params": str(qparams[i].as_dict() if qparams[i] else {})}
            cols = ["recall"] if args.recallOnly else [
                "recall", "recall@1", "number_closer", "log_rel_pos_error",
                "precision_of_approx", "qps", "improv_dist_comp",
            ]
            for c in cols:
                if c in agg:
                    row[c] = agg[c]["mean"]
            rows.append(row)
        print(f"\n=== kNN k={k} (method={args.method}, space={args.spaceType}) ===", file=out)
        print(format_table(rows, ["params"] + [c for c in rows[0] if c != "params"]), file=out)

    # range sweeps: one index build per split, all radii against it (the
    # index does not depend on the radius)
    rmetas: dict[tuple[float, int], MetaAnalysis] = {}
    if radii:
        for split in splits:
            if args.queryFile:
                sub, queries = store, _store_points(space, split[1])
            else:
                from .eval.experiments import _query_points, _subset_store

                sub = _subset_store(store, split[0])
                queries = _query_points(store, split[1])
            if loaded_method is not None:
                method = loaded_method
            else:
                method = method_factory(space)
                method.create_index(sub)
                if args.saveIndex and not ks:
                    _save_built(method, sub)  # kNN loop didn't save one
            ex = Experiments(space, sub, queries)
            for r in radii:
                for i, row in enumerate(ex.run_range(method, r, qparams)):
                    rmetas.setdefault((r, i), MetaAnalysis()).add(row)
    for r in radii:
        rows = []
        for (rr, i), m in sorted(rmetas.items()):
            if rr != r:
                continue
            agg = m.aggregate()
            row = {"params": str(qparams[i].as_dict() if qparams[i] else {})}
            cols = ["recall"] if args.recallOnly else [
                "recall", "number_closer", "log_rel_pos_error",
                "precision_of_approx", "qps", "improv_dist_comp",
                "mean_result_size",
            ]
            for c in cols:
                if c in agg:
                    row[c] = agg[c]["mean"]
            rows.append(row)
        print(f"\n=== range r={r} (method={args.method}, space={args.spaceType}) ===", file=out)
        print(format_table(rows, ["params"] + [c for c in rows[0] if c != "params"]), file=out)

    if args.outFile:
        out.close()
    return 0


def _store_points(space, qstore: DataStore):
    from .eval.experiments import _query_points

    return _query_points(qstore, np.arange(len(qstore)))


if __name__ == "__main__":
    raise SystemExit(main())
