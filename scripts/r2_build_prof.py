"""Attribute HNSW construction time on the chip.

1M builds run ~800 s (1.25k pts/s) vs the reference's 231 s/core
(4.3k pts/s) — the one headline where the reference still wins. The
build is a host loop of one jitted wave step per 1024 points, so the
candidates are (a) device compute inside the wave step (beam search vs
heuristic vs reverse-link updates), (b) per-wave dispatch/upload round
trips over the link. This profiles a 10-wave window mid-build at 300k
(device_duration_ps per op + source attribution) and compares the
window's device total against the build's per-wave wall.

Appends JSON to /tmp/r2_bprof.jsonl.
"""

import glob
import gzip
import json
import os
import time
import traceback
from collections import defaultdict

import numpy as np

LOG = "/tmp/r2_bprof.jsonl"
N, W = 300_000, 1024
TDIR = "/tmp/jax_trace_build"


def emit(**kw):
    with open(LOG, "a") as f:
        f.write(json.dumps(kw) + "\n")
    print(json.dumps(kw), flush=True)


def parse_trace(tdir):
    paths = sorted(glob.glob(os.path.join(tdir, "plugins/profile/*/*.trace.json.gz")))
    if not paths:
        return None
    with gzip.open(paths[-1], "rt") as f:
        tr = json.load(f)
    by_op = defaultdict(float)
    srcs = {}
    total = 0.0
    for ev in tr.get("traceEvents", []):
        args = ev.get("args") or {}
        dur = args.get("device_duration_ps")
        if dur is None:
            continue
        ms = float(dur) / 1e9
        total += ms
        name = ev.get("name", "?")[:70]
        by_op[name] += ms
        for key in ("source", "tf_op", "long_name", "hlo_category"):
            if key in args and name not in srcs:
                srcs[name] = str(args[key])[:120]
    top = sorted(by_op.items(), key=lambda kv: -kv[1])[:20]
    return {
        "total_device_ms": round(total, 2),
        "top_ops": [(k, round(v, 2), srcs.get(k, "")) for k, v in top],
    }


def main():
    from tpu_knn import Index, Params
    from tpu_knn.eval.datasets import sift_like

    x = sift_like(N, 128, seed=0)
    try:
        idx = Index("l2", Params(dim=128), method="hnsw")
        idx.add_dense_batch(x)
        params = Params(M=16, efConstruction=100, waveSize=W)
        m = idx._make_method(params)
        m.profile_wave_window = (40, 49, TDIR)
        t0 = time.perf_counter()
        m.create_index(idx.store, params)
        import jax.numpy as jnp

        float(jnp.sum(m.graph["level0"]))
        build_s = time.perf_counter() - t0
        waves = (N + W - 1) // W
        win_wall = getattr(m, "_prof_wall_s", None)
        emit(event="build_ok", build_s=round(build_s, 1), waves=waves,
             per_wave_wall_ms=round(build_s / waves * 1e3, 1),
             window_wall_ms_per_wave=round(win_wall / 10 * 1e3, 1)
             if win_wall else None)
        prof = parse_trace(TDIR)
        if prof:
            prof["per_wave_device_ms"] = round(prof["total_device_ms"] / 10, 1)
            emit(kind="wave_window", **prof)
    except Exception:
        emit(event="crash", err=traceback.format_exc()[-900:])
        raise SystemExit(2)


if __name__ == "__main__":
    main()
