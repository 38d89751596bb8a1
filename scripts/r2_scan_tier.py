"""Re-measure the certified reduced-precision pass-1 tiers ON THE NEW
GROUP-MIN KERNEL. The round-2 'neutral-to-negative' verdict (high tier
39.6 ms vs 35.9 f32 end-to-end) predates the layout/tq kernel
resolution, which moved pass 1 from 28.5 -> 19.1 ms f32 and 11.4 ms
bf16x3 — the ratio changed materially, so the one standing instruction
against re-litigating (same part, same batch) no longer applies.

1M x 128 l2, 2048 queries, k=10: end-to-end exact-scan wall per tier,
plus an exactness check of 'high' vs the f32 path (certificate must
hold or fall back per 256-query block — results must be identical).

Appends JSON to /tmp/r2_tier.jsonl.
"""

import json
import time
import traceback

import numpy as np

LOG = "/tmp/r2_tier.jsonl"
N, NQ, K, CHUNK = 1_000_000, 2048, 10, 16384


def emit(**kw):
    with open(LOG, "a") as f:
        f.write(json.dumps(kw) + "\n")
    print(json.dumps(kw), flush=True)


def main():
    import jax.numpy as jnp

    from tpu_knn.core.dataset import DataKind, DataStore
    from tpu_knn.core.params import Params
    from tpu_knn.core.registry import create_space
    from tpu_knn.methods.seq_search import _knn_device_twopass
    from tpu_knn.spaces.dense import ensure_cert_metadata
    from tpu_knn.eval.datasets import sift_like

    pts = sift_like(N + NQ, 128, seed=0)
    space = create_space("l2", Params(dim=128))
    store = DataStore(DataKind.DENSE)
    store.add_dense_batch(pts[:N])
    data = space.encode_dataset(store, row_multiple=CHUNK)
    ensure_cert_metadata(data)
    qenc = space.encode_queries(pts[N:])

    def sync(out):
        return float(jnp.sum(out[0]))

    try:
        ref_ids = None
        for tier in ("float32", "high", "bfloat16"):
            out = _knn_device_twopass(space, qenc, data, K, CHUNK,
                                      "float32", tier)
            sync(out)
            t0 = time.perf_counter()
            for _ in range(5):
                out = _knn_device_twopass(space, qenc, data, K, CHUNK,
                                          "float32", tier)
            sync(out)
            dt = (time.perf_counter() - t0) / 5
            ids = np.asarray(out[1])
            if ref_ids is None:
                ref_ids = ids
                match = 1.0
            else:
                match = float(np.mean(ids == ref_ids))
            emit(tier=tier, ms=round(dt * 1e3, 1), qps=round(NQ / dt, 1),
                 ids_match_f32=round(match, 6))
    except Exception:
        emit(event="crash", err=traceback.format_exc()[-900:])
        raise SystemExit(2)


if __name__ == "__main__":
    main()
