"""Batched Levenshtein distance (reference: include/distcomp_edist.h,
src/distcomp_edist.cc — a per-pair O(L1*L2) dynamic program).

TPU rebuild: one DP over a whole [Q, C] block of string pairs at once.
The classic row recurrence

    D[i][j] = min(D[i-1][j] + 1, D[i][j-1] + 1, D[i-1][j-1] + cost)

is sequential in j through the D[i][j-1] term. That term unrolls to

    D[i][j] = min_{k <= j} ( E[k] + (j - k) ),
    E[j]    = min(D[i-1][j] + 1, D[i-1][j-1] + cost_j),  E[0] = i

i.e. a *prefix-min* of (E[k] - k) followed by +j — computed in one
``lax.associative_scan`` over the lane axis, fully parallel across the
[Q, C] batch. The scan over corpus characters i is a ``lax.scan`` whose
carry is the DP row i32[Q, C, Lq+1].

Length handling: rows are only updated while i < len(x); the answer is
gathered at column len(q). Cells beyond len(q) never influence cells at
or below it (D[i][j] depends only on j' <= j), so character padding
values are irrelevant.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def levenshtein_blocked(
    qchars: jax.Array,  # i32[Q, Lq]
    qlen: jax.Array,  # i32[Q]
    xchars: jax.Array,  # i32[C, Lx]
    xlen: jax.Array,  # i32[C]
) -> jax.Array:
    """Edit distances i32[Q, C] between every query/corpus string pair."""
    nq, lq = qchars.shape
    nc, lx = xchars.shape
    jcols = jnp.arange(lq + 1, dtype=jnp.int32)  # [Lq+1]

    # D[0][j] = j
    row0 = jnp.broadcast_to(jcols, (nq, nc, lq + 1)).astype(jnp.int32)

    def step(prev, t):
        xt = xchars[:, t]  # [C]
        cost = (qchars[:, None, :] != xt[None, :, None]).astype(jnp.int32)  # [Q,C,Lq]
        # E[j] for j>=1; E[0] = i = t+1
        e_tail = jnp.minimum(prev[:, :, 1:] + 1, prev[:, :, :-1] + cost)
        e0 = jnp.full((nq, nc, 1), t + 1, jnp.int32)
        e = jnp.concatenate([e0, e_tail], axis=2)  # [Q,C,Lq+1]
        pm = jax.lax.associative_scan(jnp.minimum, e - jcols, axis=2)
        new = pm + jcols
        active = (t < xlen)[None, :, None]
        return jnp.where(active, new, prev), None

    final, _ = jax.lax.scan(step, row0, jnp.arange(lx, dtype=jnp.int32))
    # answer at column len(q) per query
    take = jnp.clip(qlen, 0, lq)[:, None, None]  # [Q,1,1]
    out = jnp.take_along_axis(final, jnp.broadcast_to(take, (nq, nc, 1)), axis=2)
    return out[:, :, 0]


def normalized_levenshtein_blocked(qchars, qlen, xchars, xlen) -> jax.Array:
    """leven / max(len1, len2); 0 when both empty (reference:
    space_leven.h:57-68 SpaceLevenshteinNormalized)."""
    d = levenshtein_blocked(qchars, qlen, xchars, xlen).astype(jnp.float32)
    denom = jnp.maximum(qlen[:, None], xlen[None, :]).astype(jnp.float32)
    return jnp.where(denom > 0, d / jnp.maximum(denom, 1.0), 0.0)
