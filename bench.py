"""Benchmark driver: prints ONE JSON line.

Primary metric this round: exact-kNN throughput on a synthetic SIFT-1M
style workload (1M x 128-d corpus, k=10) on one chip — BASELINE.md
config 2 ("seq_search brute-force exact kNN ... GFLOP/s"). The baseline
denominator is a CPU BLAS scan of the same workload measured in-process
(an upper bound on the reference's per-pair SIMD scan, so vs_baseline
is conservative).

Run: python bench.py            (real TPU chip)
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def _sync(x):
    # block_until_ready is unreliable over the axon tunnel; a host read of
    # a scalar is the dependable sync.
    import jax.numpy as jnp

    return float(jnp.sum(x[0]) if isinstance(x, tuple) else jnp.sum(x))


def bench_exact_knn(n=1_000_000, d=128, q=2048, k=10, chunk=16384, iters=5):
    import jax
    import jax.numpy as jnp

    from tpu_knn.core.dataset import DataKind, DataStore
    from tpu_knn.core.params import Params
    from tpu_knn.core.registry import create_space
    from tpu_knn.methods.seq_search import _knn_device_twopass as _knn_device

    rng = np.random.default_rng(0)
    # SIFT-like: non-negative, clustered-ish uint8 range
    x = (rng.random((n, d)) * 255).astype(np.float32)
    queries = (rng.random((q, d)) * 255).astype(np.float32)

    space = create_space("l2", Params(dim=d))
    store = DataStore(DataKind.DENSE)
    store.add_dense_batch(x)
    data = space.encode_dataset(store, row_multiple=chunk)
    qenc = space.encode_queries(queries)

    # warm-up / compile
    out = _knn_device(space, qenc, data, k, chunk, "float32")
    _sync(out)

    t0 = time.perf_counter()
    for _ in range(iters):
        out = _knn_device(space, qenc, data, k, chunk, "float32")
    _sync(out)
    dt = (time.perf_counter() - t0) / iters
    qps = q / dt
    gflops = 2.0 * q * n * d / dt / 1e9
    return qps, gflops, dt


def bench_cpu_baseline(n=100_000, d=128, q=256, k=10):
    """CPU BLAS equivalent of the reference's seq_search scan."""
    rng = np.random.default_rng(1)
    x = (rng.random((n, d)) * 255).astype(np.float32)
    queries = (rng.random((q, d)) * 255).astype(np.float32)
    xs = (x * x).sum(1)
    t0 = time.perf_counter()
    g = queries @ x.T
    dd = (queries * queries).sum(1)[:, None] + xs[None, :] - 2 * g
    idx = np.argpartition(dd, k, axis=1)[:, :k]
    _ = np.take_along_axis(dd, idx, axis=1)
    dt = time.perf_counter() - t0
    return q / dt


def main():
    cpu_qps = bench_cpu_baseline()
    qps, gflops, dt = bench_exact_knn()
    result = {
        "metric": "exact_knn_qps_sift1m_synth_k10",
        "value": round(qps, 1),
        "unit": "queries/s/chip (1M x 128d f32 exact scan)",
        "vs_baseline": round(qps / cpu_qps, 2),
    }
    print(json.dumps(result))
    print(
        f"# detail: {gflops:.0f} GFLOP/s sustained, {dt*1e3:.1f} ms per 2048-query sweep, "
        f"cpu-blas baseline {cpu_qps:.0f} qps",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
