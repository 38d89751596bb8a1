"""Blocked dense distance primitives (the L1 layer of SURVEY.md, rebuilt
TPU-first).

The reference computes one SIMD distance per vector *pair*
(reference: include/distcomp.h:34-274, src/distcomp_*.cc). On TPU the
unit of work is a whole [Q, C] block of pairs, and the key design move is
that almost every NMSLIB distance **factors through a matmul**:

    dist[i, j] = post( scale * <A(q_i), B(x_j)>  +  a(q_i) + b(x_j) + const )

with per-space element transforms A/B and per-row terms a/b precomputed
once at encode time. Examples:

  l2sqr:         |q|^2 + |x|^2 - 2 q.x                    (A=B=identity)
  cosinesimil:   1 - qn.xn                                 (pre-normalized)
  KL(q||x):      sum q log q - q . log x                   (B=log, a=sum q log q)
  Itakura-Saito: q . (1/x) - sum log q + sum log x - d     (B=reciprocal)
  Renyi_a:       1/(a-1) log( q^a . x^(1-a) )              (A=^a, B=^(1-a))
  alpha-beta:    matmuls of q^a . x^b plus row sums
  bit_hamming:   |q| + |x| - 2 popcnt(q&x) = int8 matmul on unpacked bits

This keeps the FLOPs on the MXU instead of translating the reference's
per-pair SIMD loops. The remaining truly elementwise distances (L1, Linf,
generic Lp, Jensen-Shannon) use the blocked VPU path
:func:`elementwise_blocked`.

All public functions take already-encoded (transformed + zero-padded)
arrays; padding columns must be neutral for the given op (handled by the
spaces layer).
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp


#: precision name -> (cast dtype or None, lax.Precision)
#: 'float32'  — true f32 matmul (MXU multi-pass; the exact/gold path)
#: 'high'     — bf16x3 passes, near-f32 accuracy at ~2x bf16 cost
#: 'bfloat16' — single-pass bf16 inputs, f32 accumulation (fast path)
_PRECISIONS = {
    "float32": (None, jax.lax.Precision.HIGHEST),
    "high": (None, jax.lax.Precision.HIGH),
    "bfloat16": (jnp.bfloat16, jax.lax.Precision.DEFAULT),
}


def matmul(q: jax.Array, x: jax.Array, precision: str = "float32") -> jax.Array:
    """[Q,D] @ [C,D]^T -> [Q,C] on the MXU with f32 accumulation.

    NB: JAX's *default* matmul precision is reduced even for f32 inputs,
    which is far too lossy for exact distance ordering — the gold-standard
    path must request Precision.HIGHEST explicitly.
    """
    cast, prec = _PRECISIONS[precision]
    if cast is not None:
        q = q.astype(cast)
        x = x.astype(cast)
    return jax.lax.dot_general(
        q,
        x,
        dimension_numbers=(((q.ndim - 1,), (x.ndim - 1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=prec,
    )


def factored(
    q: jax.Array,
    x: jax.Array,
    q_term: jax.Array | None = None,
    x_term: jax.Array | None = None,
    scale: float = 1.0,
    const: float = 0.0,
    post: Callable[[jax.Array], jax.Array] | None = None,
    precision: str = "float32",
) -> jax.Array:
    """The general matmul-factored distance block: see module docstring."""
    g = matmul(q, x, precision)
    if scale != 1.0:
        g = g * scale
    if q_term is not None:
        g = g + q_term[:, None]
    if x_term is not None:
        g = g + x_term[None, :]
    if const != 0.0:
        g = g + const
    return post(g) if post is not None else g


def batched_dot(q: jax.Array, rows: jax.Array) -> jax.Array:
    """<q_b, rows_bk> as f32[B, K]. int8 inputs take the MXU int8 path
    with exact i32 accumulation (the l2sqr_sift fast path); float inputs
    use f32-HIGHEST."""
    if q.dtype == jnp.int8:
        g = jax.lax.dot_general(
            q,
            rows,
            dimension_numbers=(((1,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.int32,
        )
        return g.astype(jnp.float32)
    return jnp.einsum(
        "bd,bkd->bk",
        q,
        rows,
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )


def pair_dot(qa: jax.Array, rows: jax.Array) -> jax.Array:
    """<qa_bc, rows_be> as f32[B, C, E] (same dtype dispatch as
    :func:`batched_dot`)."""
    if qa.dtype == jnp.int8:
        g = jax.lax.dot_general(
            qa,
            rows,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.int32,
        )
        return g.astype(jnp.float32)
    return jnp.einsum(
        "bcd,bed->bce",
        qa,
        rows,
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )


# ---------------- concrete factored families ----------------


def sq_norms(v: jax.Array) -> jax.Array:
    return jnp.sum(v * v, axis=-1)


def l2sqr_blocked(q, x, q_sq=None, x_sq=None, precision="float32"):
    """Squared L2 via the norm identity (reference kernel analog:
    distcomp.h L2 SIMD + l2SqrSIFTPrecomp, src/distcomp_l2sqr_sift.cc:41-151)."""
    q_sq = sq_norms(q) if q_sq is None else q_sq
    x_sq = sq_norms(x) if x_sq is None else x_sq
    d = factored(q, x, q_sq, x_sq, scale=-2.0, precision=precision)
    return jnp.maximum(d, 0.0)


def l2_blocked(q, x, q_sq=None, x_sq=None, precision="float32"):
    return jnp.sqrt(l2sqr_blocked(q, x, q_sq, x_sq, precision))


def cosine_blocked(qn, xn, precision="float32"):
    """1 - cos over pre-normalized rows (reference: space_scalar.h
    NormCosine; HNSW pre-normalizes storage, hnsw.cc:441-446)."""
    return jnp.maximum(factored(qn, xn, scale=-1.0, const=1.0, precision=precision), 0.0)


def angular_blocked(qn, xn, precision="float32"):
    cos = jnp.clip(matmul(qn, xn, precision), -1.0, 1.0)
    return jnp.arccos(cos)


def negdot_blocked(q, x, precision="float32"):
    return factored(q, x, scale=-1.0, precision=precision)


def kldiv_blocked(q, log_x, q_logq_sum, precision="float32"):
    """KL(q||x) = sum q log q - q . log x. ``log_x`` precomputed at encode
    (reference layout analog: distcomp.h:99-154 precomputed logs)."""
    return factored(q, log_x, q_term=q_logq_sum, scale=-1.0, precision=precision)


def itakura_saito_blocked(q, inv_x, logq_sum, logx_sum, dim, precision="float32"):
    """IS(q,x) = q.(1/x) - sum log q + sum log x - d."""
    return factored(
        q, inv_x, q_term=-logq_sum, x_term=logx_sum, const=-float(dim), precision=precision
    )


def renyi_blocked(q_a, x_1a, alpha, precision="float32"):
    """Renyi_a(q||x) = 1/(a-1) * log( sum q^a x^(1-a) )."""
    g = jnp.maximum(matmul(q_a, x_1a, precision), 1e-30)
    return jnp.log(g) / (alpha - 1.0)


def abdiv_blocked(q_a, x_b, q_ab_sum, x_ab_sum, alpha, beta, precision="float32"):
    """Alpha-beta divergence (Cichocki et al.; reference:
    src/distcomp_diverg.cc): for a,b != 0, a+b != 0:
      AB(q,x) = -1/(a*b) sum[ q^a x^b - a/(a+b) q^(a+b) - b/(a+b) x^(a+b) ]
    The cross term is a matmul of elementwise powers; the rest are row sums.
    """
    s = alpha + beta
    cross = matmul(q_a, x_b, precision)
    val = cross - (alpha / s) * q_ab_sum[:, None] - (beta / s) * x_ab_sum[None, :]
    return -val / (alpha * beta)


# ---------------- blocked elementwise (VPU) path ----------------


def elementwise_blocked(
    fn: Callable[[jax.Array, jax.Array], jax.Array],
    q: jax.Array,
    x: jax.Array,
    reduce: str = "sum",
    chunk: int = 256,
) -> jax.Array:
    """dist[i,j] = reduce_d fn(q[i,d], x[j,d]) computed in corpus chunks to
    bound the [Q, chunk, D] intermediate. Used by L1/Linf/Lp/JS and other
    non-factorable distances (reference per-pair loops in distcomp_lp.cc,
    distcomp_js.cc)."""
    n = x.shape[0]
    chunk = min(chunk, max(n, 1))
    if n == 0:
        return jnp.zeros((q.shape[0], 0), q.dtype)
    # Pad corpus rows to a multiple of chunk, reshape to [n_chunks, chunk, D].
    pad = (-n) % chunk
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad, x.shape[1]), x.dtype)], axis=0)
    xc = x.reshape(-1, chunk, x.shape[1])

    red = {"sum": jnp.sum, "max": jnp.max}[reduce]

    def one_chunk(xb):
        return red(fn(q[:, None, :], xb[None, :, :]), axis=-1)  # [Q, chunk]

    out = jax.lax.map(one_chunk, xc)  # [n_chunks, Q, chunk]
    out = jnp.moveaxis(out, 0, 1).reshape(q.shape[0], -1)
    return out[:, :n]


def l1_blocked(q, x, chunk: int = 256):
    return elementwise_blocked(lambda a, b: jnp.abs(a - b), q, x, "sum", chunk)


def linf_blocked(q, x, chunk: int = 256):
    return elementwise_blocked(lambda a, b: jnp.abs(a - b), q, x, "max", chunk)


def lp_blocked(q, x, p: float, chunk: int = 256):
    d = elementwise_blocked(lambda a, b: jnp.abs(a - b) ** p, q, x, "sum", chunk)
    return d ** (1.0 / p)


def js_div_blocked(q, x, chunk: int = 128):
    """Jensen-Shannon divergence, blocked VPU (reference:
    src/distcomp_js.cc). Elementwise: 0.5*[ q log(2q/(q+x)) + x log(2x/(q+x)) ]
    with 0 log 0 := 0."""

    def term(a, m):
        # a * log(a / m), safe at a == 0.
        r = jnp.where(a > 0, a * (jnp.log(jnp.maximum(a, 1e-38)) - jnp.log(jnp.maximum(m, 1e-38))), 0.0)
        return r

    def fn(a, b):
        m = 0.5 * (a + b)
        return 0.5 * (term(a, m) + term(b, m))

    return elementwise_blocked(fn, q, x, "sum", chunk)
