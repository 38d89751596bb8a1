"""Resume scripts/r2_groupmin_layout.py after a timeout: re-reads
/tmp/r2_groupmin.jsonl and measures only the configs that have no
successful row yet (same keys, same log file). Safe to run repeatedly;
exits immediately when nothing is missing.
"""

import functools
import json
import os
import time

import numpy as np

LOG = os.environ.get("GM_LOG", "/tmp/r2_groupmin.jsonl")
N = int(os.environ.get("GM_N", 1_000_000))
D, Q = 128, int(os.environ.get("GM_Q", 2048))
REPS = int(os.environ.get("GM_REPS", 10))


def done_keys():
    keys = set()
    if not os.path.exists(LOG):
        return keys
    with open(LOG) as f:
        for line in f:
            try:
                row = json.loads(line)
            except ValueError:
                continue
            if "err" in row:
                continue  # failed configs get retried
            keys.add(
                (
                    row.get("kind"),
                    row.get("layout"),
                    row.get("prec"),
                    row.get("tq"),
                )
            )
    return keys


def emit(**kw):
    with open(LOG, "a") as f:
        f.write(json.dumps(kw) + "\n")
    print(json.dumps(kw), flush=True)


def main():
    have = done_keys()

    def missing(kind, layout=None, prec=None, tq=None):
        return (kind, layout, prec, tq) not in have

    todo_xla = [
        (p, r) for p in ("f32", "bf16") for r in ("min", "sum")
        if missing(f"xla_row{r}_{p}")
    ]
    # XLA GROUP-min probes (the rowmin refs measured 6.05ms bf16 =
    # 86.6 TF/s with a FREE reduction epilogue — 2x our Pallas kernel;
    # if either grouped formulation keeps that fusion, XLA wins pass 1):
    # "reshape": one [Q,N] matmul + reshape-to-[Q,G,128] min (round-1
    # note says this broke fusion at 64ms f32 — re-anchor at bf16);
    # "batched": G-batched [Q,d]x[d,128] dot_general + min over the
    # 128-lane axis, min fusable per batch.
    todo_xgm = [
        (p, f) for p in ("f32", "bf16") for f in ("reshape", "batched")
        if missing(f"xla_groupmin_{f}_{p}")
    ]
    todo_folded = [p for p in ("float32", "bfloat16") if missing("fused_folded", prec=p)]
    todo_d256 = [p for p in ("float32", "bfloat16") if missing("fused_d256", prec=p)]
    # decision-critical first: the "x" layout at tq=256 decides the
    # shipped default (and f32 establishes gold); q-layout re-anchors and
    # tq=512 variants are nice-to-have — at ~6-10 min of tunnel time per
    # new 1M program, order IS coverage under a timeout.
    todo_fused = [
        (lay, p, tq)
        for lay in ("x", "q")
        for tq in (256, 512)
        for p in ("float32", "bfloat16", "high")
        if missing("fused", lay, p, tq)
    ]
    todo_fused.sort(key=lambda t: (t[2] != 256, t[0] != "x"))
    if not (todo_xla or todo_folded or todo_d256 or todo_fused or todo_xgm):
        print("nothing missing")
        return

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
        sync(fn())
        t0 = time.perf_counter()
        outs = [fn() for _ in range(REPS)]
        sync(outs[-1])
        return (time.perf_counter() - t0) / REPS

    flops = 2.0 * N * D * Q

    # arrays MUST be jit ARGUMENTS: closing over the 512MB corpus bakes
    # it into the program as constants and the remote-compile request
    # overflows (HTTP 413 / endless upload — this stalled the first
    # batch run for its whole 40-min budget with zero rows emitted)
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

    gold = None
    last_lay = None
    for lay, prec, tq in todo_fused:
        if lay != last_lay:
            PS.KERNEL_LAYOUT = lay
            jax.clear_caches()
            last_lay = lay
        try:
            fn = lambda: PS.fused_groupmin(
                q, x, qt, xt, -2.0, tq=tq, tc=2048, precision=prec
            )
            dt = timeit(fn)
            out = np.asarray(fn())
            row = dict(kind="fused", layout=lay, prec=prec, tq=tq,
                       ms=round(dt * 1e3, 2), tfs=round(flops / dt / 1e12, 1),
                       at=time.strftime("%H:%M:%S"))
            if prec == "float32":
                if gold is None:
                    gold = out
                else:
                    row["max_vs_gold"] = float(np.max(np.abs(out - gold)))
            emit(**row)
        except Exception as e:
            emit(kind="fused", layout=lay, prec=prec, tq=tq, err=str(e)[-300:])

    if todo_folded:
        zeros_q = jnp.zeros_like(qt)
        zeros_x = jnp.zeros_like(xt)
        qf = jnp.concatenate(
            [-2.0 * q, jnp.ones((Q, 1), jnp.float32), jnp.zeros((Q, 7), jnp.float32)], 1
        )
        xf = jnp.concatenate([x, xt[:, None], jnp.zeros((x.shape[0], 7), jnp.float32)], 1)
        for prec in todo_folded:
            try:
                fn = lambda: PS.fused_groupmin(
                    qf, xf, zeros_q, zeros_x, 1.0, tq=256, tc=2048, precision=prec
                )
                dt = timeit(fn)
                emit(kind="fused_folded", prec=prec, ms=round(dt * 1e3, 2),
                     tfs=round(flops / dt / 1e12, 1))
            except Exception as e:
                emit(kind="fused_folded", prec=prec, err=str(e)[-300:])

    if todo_d256:
        x2 = jnp.concatenate([x, x], axis=1)
        q2 = jnp.concatenate([q, q], axis=1)
        qt2, xt2 = 2.0 * qt, 2.0 * xt
        for prec in todo_d256:
            try:
                fn = lambda: PS.fused_groupmin(
                    q2, x2, qt2, xt2, -2.0, tq=256, tc=2048, precision=prec
                )
                dt = timeit(fn)
                emit(kind="fused_d256", prec=prec, ms=round(dt * 1e3, 2),
                     tfs=round(2 * flops / dt / 1e12, 1))
            except Exception as e:
                emit(kind="fused_d256", prec=prec, err=str(e)[-300:])
        del x2, q2

    @functools.partial(jax.jit, static_argnames=("p", "form"))
    def _xgm(qb, xb, qt_, xt_, p, form):
        G = xb.shape[0] // 128
        if form == "reshape":
            g = jax.lax.dot_general(
                qb, xb, (((1,), (1,)), ((), ())),
                precision=p, preferred_element_type=jnp.float32,
            )
            z = -2.0 * g + qt_[:, None] + xt_[None, :]
            return jnp.min(z.reshape(z.shape[0], G, 128), axis=2)
        xg = xb.reshape(G, 128, xb.shape[1])
        # [G, Q, 128] batched dot: contract d, batch over groups
        gb = jax.lax.dot_general(
            jnp.broadcast_to(qb, (G,) + qb.shape), xg,
            (((2,), (2,)), ((0,), (0,))),
            precision=p, preferred_element_type=jnp.float32,
        )
        z = -2.0 * gb + qt_[None, :, None] + xt_.reshape(G, 1, 128)
        return jnp.min(z, axis=2).T  # [Q, G]

    for prec, form in todo_xgm:
        xb = x.astype(jnp.bfloat16) if prec == "bf16" else x
        qb = q.astype(jnp.bfloat16) if prec == "bf16" else q
        p = (jax.lax.Precision.DEFAULT if prec == "bf16"
             else jax.lax.Precision.HIGHEST)
        try:
            dt = timeit(lambda: _xgm(qb, xb, qt, xt, p=p, form=form))
            emit(kind=f"xla_groupmin_{form}_{prec}",
                 ms=round(dt * 1e3, 2), tfs=round(flops / dt / 1e12, 1),
                 at=time.strftime("%H:%M:%S"))
        except Exception as e:
            emit(kind=f"xla_groupmin_{form}_{prec}", err=str(e)[-300:])

    for prec, red in todo_xla:
        try:
            dt = timeit(xla_rowred(prec, red))
            emit(kind=f"xla_row{red}_{prec}",
                 ms=round(dt * 1e3, 2), tfs=round(flops / dt / 1e12, 1),
                 at=time.strftime("%H:%M:%S"))
        except Exception as e:
            emit(kind=f"xla_row{red}_{prec}", err=str(e)[-300:])


if __name__ == "__main__":
    main()
