"""Group-min kernel binding-factor hunt (VERDICT item 4), one TPU session.

Hypothesis: the epilogue's cross-lane group min (7 rotate-mins per vreg
in the [tq, tc] layout) binds the kernel, not the MXU. The transposed
[tc, tq] layout reduces along sublanes (~6x fewer VPU ops).

Measures at 1M x 128, 2048 queries:
  - both layouts x {float32, high, bfloat16} x tq in {256, 512}
  - XLA fused matmul+FULL-row-min (the known 28.5ms f32 / roofline ref)
Appends JSON lines to /tmp/r2_groupmin.jsonl.
"""

import json
import time

import numpy as np

LOG = "/tmp/r2_groupmin.jsonl"
N, D, Q = 1_000_000, 128, 2048
REPS = 10


def emit(**kw):
    with open(LOG, "a") as f:
        f.write(json.dumps(kw) + "\n")
    print(json.dumps(kw), flush=True)


def main():
    import jax
    import jax.numpy as jnp

    import tpu_knn.ops.pallas_scan as PS
    from tpu_knn.eval.datasets import sift_like

    pts = sift_like(N + Q, D, seed=0)
    x = jnp.asarray(pts[:N])
    q = jnp.asarray(pts[N : N + Q])
    qt = jnp.sum(q * q, axis=1)
    xt = jnp.sum(x * x, axis=1)
    sync = lambda a: float(jnp.sum(a))

    def timeit(fn):
        sync(fn())  # compile + warm
        t0 = time.perf_counter()
        outs = [fn() for _ in range(REPS)]
        sync(outs[-1])
        return (time.perf_counter() - t0) / REPS

    flops = 2.0 * N * D * Q

    # XLA reference: fused matmul + full-row min
    @jax.jit
    def xla_rowmin():
        g = jax.lax.dot_general(
            q, x, (((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
        return jnp.min(-2.0 * g + qt[:, None] + xt[None, :], axis=1)

    dt = timeit(xla_rowmin)
    emit(kind="xla_rowmin_f32", ms=round(dt * 1e3, 2), tfs=round(flops / dt / 1e12, 1))

    gold = None
    for lay in ("q", "x"):
        PS.KERNEL_LAYOUT = lay
        jax.clear_caches()
        for prec in ("float32", "high", "bfloat16"):
            for tq in (256, 512):
                try:
                    fn = lambda: PS.fused_groupmin(
                        q, x, qt, xt, -2.0, tq=tq, tc=2048, precision=prec
                    )
                    dt = timeit(fn)
                    out = np.asarray(fn())
                    row = dict(kind="fused", layout=lay, prec=prec, tq=tq,
                               ms=round(dt * 1e3, 2),
                               tfs=round(flops / dt / 1e12, 1))
                    if prec == "float32":
                        if gold is None:
                            gold = out
                        else:
                            row["max_vs_gold"] = float(np.max(np.abs(out - gold)))
                    emit(**row)
                except Exception as e:  # Mosaic rejection etc.
                    emit(kind="fused", layout=lay, prec=prec, tq=tq,
                         err=str(e)[-300:])


if __name__ == "__main__":
    main()
