"""Pallas TPU kernel: fused matmul-factored distance + 128-column
group-min — pass 1 of the exact two-pass kNN scan (group-min
containment theorem, ops/topk.py GROUP note; full pipeline in
methods/seq_search.py).

Why a kernel: XLA fuses a full-row min into the matmul epilogue (the
distance block never hits HBM), but a *grouped* min (reshape + reduce)
breaks that fusion and each [Q, C] f32 block round-trips through HBM —
measured 64ms vs 29ms for the fused row-min on a v5e at SIFT-1M scale.
Here the [TQ, TC] distance tile lives in VMEM only, and only the
[TQ, TC/128] group mins are written out.

Covers every matmul-factored space (ops/distance.py factored():
dist = scale * <q, x> + q_term + x_term, any *monotone* post-transform
dropped — pass 1 only needs the ordering, pass 2 re-scores exactly).
Spaces opt in via ``pass1_factored()`` returning (scale,) or None.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

GROUP = 128

#: kernel tile orientation: "q" = [tq, tc] tile + cross-lane group min
#: (round-1 layout), "x" = transposed [tc, tq] tile + sublane group min
#: (fewer VPU epilogue ops). Module-level for the TPU A/B harness.
KERNEL_LAYOUT = "x"

#: pass-1 engine: "pallas" = the hand-tiled kernel below; "xla_batched"
#: = G-batched dot_general + per-batch lane min (the formulation XLA
#: can fuse into the matmul epilogue); "xla_reshape" = one [Q, N]
#: matmul + reshape-min (historically broke epilogue fusion — kept for
#: the A/B harness). scripts/r2_groupmin_rest.py decides the default;
#: flag changes need jax.clear_caches() (read at trace time).
GROUPMIN_BACKEND = "pallas"


_DIMS = (((1,), (1,)), ((), ()))


def _bf16_dot(a, b):
    """Single-pass bf16 MXU matmul with f32 accumulation."""
    return jax.lax.dot_general(
        a.astype(jnp.bfloat16),
        b.astype(jnp.bfloat16),
        dimension_numbers=_DIMS,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )


def _kernel(
    q_ref, x_ref, qt_ref, xt_ref, out_ref, *, scale: float, tq: int, tc: int, prec: str
):
    """Pass-1 precision tiers for f32 inputs (Mosaic only lowers DEFAULT
    and HIGHEST dot precisions, so bf16x3 is spelled out manually):
      'float32'  — Precision.HIGHEST: bf16x6 passes, exact f32;
      'high'     — manual bf16x3: hi/lo split, omits only the lo*lo term
                   (error <= 2^-16 |q||x| by Cauchy-Schwarz, ~2x faster);
      'bfloat16' — single bf16 pass (error <= ~2^-7 |q||x|, ~6x faster).
    The two-pass scan stays provably exact at the reduced tiers via the
    certificate in methods/seq_search.py."""
    if q_ref.dtype == jnp.int8:
        # MXU int8 path (l2sqr_sift): exact i32 accumulation, ~4x f32 rate
        g = jax.lax.dot_general(
            q_ref[:],
            x_ref[:],
            dimension_numbers=_DIMS,
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32)
    elif prec == "bfloat16":
        g = _bf16_dot(q_ref[:], x_ref[:])
    elif prec == "high":
        q = q_ref[:]
        x = x_ref[:]
        q_hi = q.astype(jnp.bfloat16)
        x_hi = x.astype(jnp.bfloat16)
        q_lo = q - q_hi.astype(jnp.float32)
        x_lo = x - x_hi.astype(jnp.float32)
        g = _bf16_dot(q_hi, x_hi) + (_bf16_dot(q_hi, x_lo) + _bf16_dot(q_lo, x_hi))
    else:
        g = jax.lax.dot_general(
            q_ref[:],
            x_ref[:],
            dimension_numbers=_DIMS,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
    d = scale * g + qt_ref[0, :][:, None] + xt_ref[0, :][None, :]
    mins = jnp.min(d.reshape(tq, tc // GROUP, GROUP), axis=2)  # [tq, tc/128]
    # output is laid out [groups, queries]: a [tc/128, tq] block keeps the
    # lane dimension 128-aligned (tq) — Mosaic rejects a 16-wide lane dim
    out_ref[:] = mins.T


def _kernel_t(
    q_ref, x_ref, qt_ref, xt_ref, out_ref, *, scale: float, tq: int, tc: int, prec: str
):
    """Transposed-tile variant: computes the [tc, tq] distance tile (x as
    the dot LHS) so the 128-row group axis is SUBLANE-major. The group
    min is then a tree of elementwise vreg mins + a 3-step sublane
    reduction instead of 7 cross-lane rotate-mins per vreg (~6x fewer
    VPU ops — the epilogue, not the MXU, binds the f32/bf16 kernel), and
    the [tc/128, tq] output needs no transpose."""
    if q_ref.dtype == jnp.int8:
        g = jax.lax.dot_general(
            x_ref[:],
            q_ref[:],
            dimension_numbers=_DIMS,
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32)
    elif prec == "bfloat16":
        g = _bf16_dot(x_ref[:], q_ref[:])
    elif prec == "high":
        q = q_ref[:]
        x = x_ref[:]
        q_hi = q.astype(jnp.bfloat16)
        x_hi = x.astype(jnp.bfloat16)
        q_lo = q - q_hi.astype(jnp.float32)
        x_lo = x - x_hi.astype(jnp.float32)
        g = _bf16_dot(x_hi, q_hi) + (_bf16_dot(x_lo, q_hi) + _bf16_dot(x_hi, q_lo))
    else:
        g = jax.lax.dot_general(
            x_ref[:],
            q_ref[:],
            dimension_numbers=_DIMS,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
    d = scale * g + xt_ref[0, :][:, None] + qt_ref[0, :][None, :]  # [tc, tq]
    out_ref[:] = jnp.min(d.reshape(tc // GROUP, GROUP, tq), axis=1)


def _xla_dot(q, x, precision: str):
    """[N_or_G..., D] x [Q, D] -> f32[..., Q] at the named pass-1 tier.

    Outside Mosaic every tier has a first-class XLA spelling: HIGHEST
    (bf16x6 exact f32), HIGH (bf16x3 — rejected by Mosaic, fine in XLA),
    DEFAULT on bf16-cast inputs. int8 accumulates exactly in i32."""
    if q.dtype == jnp.int8:
        return jax.lax.dot_general(
            x, q, (((x.ndim - 1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32)
    if precision == "bfloat16":
        x, q = x.astype(jnp.bfloat16), q.astype(jnp.bfloat16)
        p = jax.lax.Precision.DEFAULT
    else:
        p = (jax.lax.Precision.HIGH if precision == "high"
             else jax.lax.Precision.HIGHEST)
    return jax.lax.dot_general(
        x, q, (((x.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=p,
    )


def _xla_groupmin(q, x, q_term, x_term, scale, precision: str):
    """Pure-XLA pass 1 (see GROUPMIN_BACKEND): same [Q, N/128] group
    mins as the Pallas kernel, computed as either a G-batched matmul
    whose 128-lane min can fuse into the epilogue ("xla_batched") or a
    flat matmul + reshape-min ("xla_reshape")."""
    n, d = x.shape
    g = n // GROUP
    if GROUPMIN_BACKEND == "xla_batched":
        dots = _xla_dot(q, x.reshape(g, GROUP, d), precision)  # [G, 128, Q]
        z = scale * dots + x_term.reshape(g, GROUP)[:, :, None] + q_term[None, None, :]
        return jnp.min(z, axis=1).T  # [Q, G]
    dots = _xla_dot(q, x, precision)  # [N, Q]
    z = scale * dots + x_term[:, None] + q_term[None, :]
    return jnp.min(z.reshape(g, GROUP, -1), axis=1).T


@functools.partial(
    jax.jit, static_argnames=("scale", "tq", "tc", "interpret", "precision")
)
def fused_groupmin(
    q: jax.Array,  # f32/int8[Q, D] (D multiple of 128)
    x: jax.Array,  # f32/int8[N, D] (N multiple of tc)
    q_term: jax.Array,  # f32[Q] (zeros if unused)
    x_term: jax.Array,  # f32[N] (+inf/1e30 on padding rows)
    scale: float,
    tq: int = 256,
    tc: int = 2048,
    interpret: bool = False,  # CPU-testable interpreter mode
    precision: str = "float32",
) -> jax.Array:
    """Group mins f32[Q, N/128] of the factored distance block."""
    qn, d = q.shape
    n = x.shape[0]
    tq = min(tq, qn)
    tc = min(tc, n)
    # HARD divisibility contract: the grid floor-divides, so a ragged
    # tail would be silently skipped and its output rows left
    # UNINITIALIZED (garbage neighbors, no error). Callers pad
    # (methods/seq_search.py buckets query batches; corpora pad to the
    # chunk multiple) — refuse anything else.
    # d only needs sublane alignment (the BlockSpecs take full-width
    # [*, d] tiles; d is not in the grid math) — 128-multiples are best
    # for MXU efficiency but e.g. d=136 (term-folded inputs) is legal
    if qn % tq or n % tc or n % GROUP or d % 8:
        raise ValueError(
            f"fused_groupmin needs qn%tq==0, n%tc==0, n%{GROUP}==0, d%8==0; "
            f"got qn={qn} tq={tq} n={n} tc={tc} d={d}"
        )
    if GROUPMIN_BACKEND != "pallas" and not interpret:
        # interpret=True always exercises the Pallas kernel (its CPU
        # test mode); otherwise the XLA formulations honor the same
        # contract and return identical-shape group mins
        return _xla_groupmin(q, x, q_term, x_term, scale, precision)
    # corpus tile OUTER, query tile INNER (the grid's last axis is the
    # fastest-varying): the big x tile loads from HBM once per sweep and
    # the small q tiles cycle — the reverse order re-reads the whole
    # corpus qn/tq times (measured 5ms/sweep extra at 1M x 2048)
    grid = (n // tc, qn // tq)
    kfn = _kernel_t if KERNEL_LAYOUT == "x" else _kernel
    kern = functools.partial(kfn, scale=scale, tq=tq, tc=tc, prec=precision)
    flops = 2 * qn * n * d
    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tq, d), lambda j, i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tc, d), lambda j, i: (j, 0), memory_space=pltpu.VMEM),
            # terms travel as [1, n] rows: 1-D operands hit XLA/Mosaic
            # layout-tiling mismatches at large n
            pl.BlockSpec((1, tq), lambda j, i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tc), lambda j, i: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (tc // GROUP, tq), lambda j, i: (j, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n // GROUP, qn), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=(qn + n) * d * 4, transcendentals=0
        ),
        interpret=interpret,
    )(q, x, q_term[None, :], x_term[None, :])
    return out.T  # [Q, N/128]


def supported() -> bool:
    """Pallas TPU kernels need a real TPU backend."""
    return jax.default_backend() == "tpu"
