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
    # pad the corpus to the tc multiple exactly like encode_dataset does
    # in production (1M % 2048 != 0 — the raw array violates the kernel's
    # divisibility contract); pad rows carry +inf terms so mins ignore
    # them. TF/s is reported on the REAL flops for comparability.
    TC = 2048
    n_pad = ((N + TC - 1) // TC) * TC
    xh = np.zeros((n_pad, D), np.float32)
    xh[:N] = pts[:N]
    x = jnp.asarray(xh)
    q = jnp.asarray(pts[N : N + Q])
    qt = jnp.sum(q * q, axis=1)
    xt = jnp.where(jnp.arange(n_pad) < N, jnp.sum(x * x, axis=1), 1e30)
    sync = lambda a: float(jnp.sum(a))

    def timeit(fn):
        sync(fn())  # compile + warm
        t0 = time.perf_counter()
        outs = [fn() for _ in range(REPS)]
        sync(outs[-1])
        return (time.perf_counter() - t0) / REPS

    flops = 2.0 * N * D * Q

    # XLA references: fused matmul + full-row reduction, f32-HIGHEST and
    # bf16, with min and sum epilogues. A no-epilogue control would be
    # DCE'd or HBM-write-bound (8GB product), so the sum variant is the
    # control: same product, same data volume, different reduction op —
    # if sum == min, the epilogue op is free and the bind is the matmul
    # pipeline itself.
    # arrays MUST be jit ARGUMENTS: closing over the 512MB corpus bakes
    # it into the program as constants and the remote-compile request
    # overflows (HTTP 413 / endless upload — this stalled the first
    # batch run for its whole 40-min budget with zero rows emitted)
    import functools

    @functools.partial(jax.jit, static_argnames=("p", "red"))
    def _rowred(qb, xb, qt_, xt_, p, red):
        g = jax.lax.dot_general(
            qb, xb, (((1,), (1,)), ((), ())),
            precision=p, preferred_element_type=jnp.float32,
        )
        z = -2.0 * g + qt_[:, None] + xt_[None, :]
        return jnp.min(z, axis=1) if red == "min" else jnp.sum(z, axis=1)

    def xla_rowred(prec, red):
        xb = x.astype(jnp.bfloat16) if prec == "bf16" else x
        qb = q.astype(jnp.bfloat16) if prec == "bf16" else q
        p = (jax.lax.Precision.DEFAULT if prec == "bf16"
             else jax.lax.Precision.HIGHEST)
        return lambda: _rowred(qb, xb, qt, xt, p=p, red=red)

    for prec in ("f32", "bf16"):
        for red in ("min", "sum"):
            try:
                dt = timeit(xla_rowred(prec, red))
                emit(kind=f"xla_row{red}_{prec}",
                     ms=round(dt * 1e3, 2), tfs=round(flops / dt / 1e12, 1))
            except Exception as e:
                emit(kind=f"xla_row{red}_{prec}", err=str(e)[-300:])

    # TERM-FOLDING probe (the working model says the VPU epilogue —
    # scale + two term adds + group-min — binds at ~2.5us/tile): fold
    # scale into q and xt into an extra contraction column, so the
    # epilogue is (two zero adds +) the min tree only; qt would be added
    # post-min in a production kernel (1 op per 128 outputs). d=129 pads
    # to 136 for sublane alignment (+6% MXU work). If this wins big, the
    # remaining epilogue is the min tree itself.
    zeros_q = jnp.zeros_like(qt)
    zeros_x = jnp.zeros_like(xt)
    qf = jnp.concatenate(
        [-2.0 * q, jnp.ones((Q, 1), jnp.float32), jnp.zeros((Q, 7), jnp.float32)], 1
    )
    xf = jnp.concatenate(
        [x, xt[:, None], jnp.zeros((x.shape[0], 7), jnp.float32)], 1
    )
    for prec in ("float32", "bfloat16"):
        try:
            fn = lambda: PS.fused_groupmin(
                qf, xf, zeros_q, zeros_x, 1.0, tq=256, tc=2048, precision=prec
            )
            dt = timeit(fn)
            emit(kind="fused_folded", prec=prec, ms=round(dt * 1e3, 2),
                 tfs=round(flops / dt / 1e12, 1))
        except Exception as e:
            emit(kind="fused_folded", prec=prec, err=str(e)[-300:])

    # contraction-depth probe: same kernel at d=256 (2x FLOPs). If the
    # K=128 contraction depth binds the MXU pipeline (weight-tile swap
    # every pass), time grows by LESS than 2x and TF/s rises.
    x2 = jnp.concatenate([x, x], axis=1)
    q2 = jnp.concatenate([q, q], axis=1)
    qt2, xt2 = 2.0 * qt, 2.0 * xt
    for prec in ("float32", "bfloat16"):
        try:
            fn = lambda: PS.fused_groupmin(
                q2, x2, qt2, xt2, -2.0, tq=256, tc=2048, precision=prec
            )
            dt = timeit(fn)
            emit(kind="fused_d256", prec=prec, ms=round(dt * 1e3, 2),
                 tfs=round(2 * flops / dt / 1e12, 1))
        except Exception as e:
            emit(kind="fused_d256", prec=prec, err=str(e)[-300:])

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
