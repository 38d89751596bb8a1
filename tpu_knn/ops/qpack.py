"""Single-buffer query transport for remote-device deployments.

Every host->device transfer over a remote PJRT link (the axon tunnel
here; same story for any disaggregated serving setup) costs a round
trip, and the eager query-encode path pays several per batch: one
upload per query array, plus eager device dispatches for derived terms
(and, before this module, a download+re-upload of the q_term scalar
row). The dense 100k/ef=20 HNSW batch executes in ~30 ms on device but
walled at ~190 ms — the gap is almost entirely these round trips
(BASELINE.md "Dense traversal device-time attribution").

The packed path collapses the query-side transport to ONE upload:

  host:   pack_host({"q": f32[B,D], ...}) -> (uint32[W] buffer, meta)
  device: unpack_device(buf, meta) INSIDE the jitted search program
          (static offsets -> lax.slice + bitcast + reshape, fused by
          XLA into the consumers), then space.complete_queries(qenc)
          derives q_term/q_pterm on device instead of uploading them.

and the result side to one download: pack_results/unpack_results
bitcast the f32 distances into an int32 container alongside the ids so
(d, ids) ride one [B, 2k] array. The container must be the INTEGER
side: see pack_results on the TPU subnormal-flush hazard.

The reference has no analog (its queries live in the same address
space as the index, nmslib_c.cpp Search paths); this is the TPU-native
replacement for that locality.

Everything here is bit-exact data movement: no value ever passes
through a numeric conversion, only .view / bitcast_convert_type.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

#: Route supporting methods/spaces through the packed single-upload
#: query path. Module flag for A/B on the chip; the CPU test suite
#: pins packed == eager results either way.
PACKED_QUERIES = True

_CODES = {
    "float32": "f32",
    "int32": "i32",
    "uint32": "u32",
    "uint8": "u8",
    "int8": "i8",
}
_NP = {
    "f32": np.float32,
    "i32": np.int32,
    "u32": np.uint32,
    "u8": np.uint8,
    "i8": np.int8,
}
_JNP = {
    "f32": jnp.float32,
    "i32": jnp.int32,
    "u32": jnp.uint32,
    "u8": jnp.uint8,
    "i8": jnp.int8,
}


def pack_host(arrays: dict) -> tuple[np.ndarray, tuple]:
    """Pack host numpy arrays into one uint32 buffer.

    Returns (buffer, meta) where meta is a hashable static description
    (key, dtype code, shape, word offset, word count) consumed by
    unpack_device inside a jit. Keys are packed in sorted order so the
    meta (a jit static arg) is deterministic for a given qenc schema.
    """
    metas, chunks, off = [], [], 0
    for key in sorted(arrays):
        a = np.ascontiguousarray(arrays[key])
        code = _CODES[a.dtype.name]
        raw = a.view(np.uint8).reshape(-1)
        pad = (-raw.size) % 4
        if pad:
            raw = np.concatenate([raw, np.zeros(pad, np.uint8)])
        words = raw.view(np.uint32)
        metas.append((key, code, tuple(int(s) for s in a.shape), off, words.size))
        chunks.append(words)
        off += words.size
    buf = np.concatenate(chunks) if chunks else np.zeros(0, np.uint32)
    return buf, tuple(metas)


def unpack_device(buf: jax.Array, meta: tuple) -> dict:
    """Rebuild the query dict from the packed buffer inside a jit.

    Static offsets make every slice a free lax.slice; bitcasts are
    layout no-ops XLA fuses into the first consumer.
    """
    out = {}
    for key, code, shape, off, words in meta:
        seg = lax.slice_in_dim(buf, off, off + words)
        if code in ("u8", "i8"):
            n = int(np.prod(shape)) if shape else 1
            a = lax.bitcast_convert_type(seg, _JNP[code]).reshape(-1)[:n]
        else:
            a = lax.bitcast_convert_type(seg, _JNP[code])
        out[key] = a.reshape(shape)
    return out


def pack_results(dists: jax.Array, ids: jax.Array) -> jax.Array:
    """[B,k] f32 distances + [B,k] i32 ids -> one [B, 2k] int32 array
    (distances bitcast, not converted). In-jit.

    The container is INTEGER on purpose: ids bitcast into f32 lanes are
    subnormals for any id < 2**23 (zero exponent field), and TPU vector
    ops flush subnormals to zero — measured on chip: the f32-container
    concat zeroed id columns k..k+5 of a [B, 2k] pack while k+6..2k-1
    survived the relayout (scripts/r2_packed_diag.py, the batch19
    recall-0.4 collapse). Integer lanes are never FTZ'd, and i32
    transfers are byte-exact over the tunnel (rt:i32 stages)."""
    return jnp.concatenate(
        [lax.bitcast_convert_type(dists, jnp.int32), ids], axis=1
    )


def unpack_results(packed: np.ndarray, k: int) -> tuple[np.ndarray, np.ndarray]:
    """Host inverse of pack_results."""
    packed = np.asarray(packed)
    d = np.ascontiguousarray(packed[:, :k]).view(np.float32)
    ids = packed[:, k:].copy()
    return d, ids
