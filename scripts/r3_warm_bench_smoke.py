"""Warm the executable-cache entries bench.py's range smoke needs
(512-query k=10 two-pass scan + streamed range at 1M) so the driver's
round-end bench run never compiles cold."""
import sys, time
sys.path.insert(0, ".")
import numpy as np
from tpu_knn.utils.jitcache import enable_persistent_cache

enable_persistent_cache()
from tpu_knn import Index, Params
from tpu_knn.eval.datasets import sift_like

pts = sift_like(1_000_000 + 512, 128, seed=0)
ex = Index("l2", Params(dim=128), method="seq_search")
ex.add_dense_batch(pts[:1_000_000])
t0 = time.time()
dd, _ = ex.knn_query_batch(pts[1_000_000:], 10)
print("knn512 ok", round(time.time() - t0, 1))
radius = float(np.median(np.asarray(dd)[:, 9]))
t0 = time.time()
res = ex.range_query_batch(pts[1_000_000:], radius)
print("range ok", round(time.time() - t0, 1), "mean",
      float(np.mean([len(r.ids) for r in res])))
