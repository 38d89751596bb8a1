"""String spaces: Levenshtein and normalized Levenshtein (reference:
include/space/space_leven.h, include/space/space_string.h,
src/distcomp_edist.cc). Objects are raw byte strings; leven is an Int
space, normleven a Float one (init_spaces.h registration)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..core.dataset import (
    DataKind,
    DataStore,
    DistKind,
    StringDeviceData,
    round_up,
)
from ..core.registry import register_space
from ..ops import edit as E
from .base import Space
from .dense import PAD_TERM


def _pack_strings(strings: list[bytes], n_pad: int, l_mult: int = 8):
    """Byte matrix + lengths; native C++ packer when built
    (native/tpu_knn_native.cpp tk_pack_strings), numpy fallback otherwise."""
    from ..io import native

    l_max = round_up(max((len(s) for s in strings), default=1) or 1, l_mult)
    return native.pack_strings(strings, n_pad, l_max)


class StringSpaceBase(Space):
    data_kind = DataKind.STRING
    #: Levenshtein blocks carry an i32[Q, C, Lq+1] DP row.
    preferred_chunk = 128

    def encode_dataset(self, store: DataStore, row_multiple: int = 8) -> StringDeviceData:
        strs = store.strings()
        n = len(strs)
        n_pad = round_up(max(n, 1), row_multiple)
        chars, length = _pack_strings(strs, n_pad)
        pad = np.zeros(n_pad, np.float32)
        pad[n:] = PAD_TERM
        ids = np.full(n_pad, -1, np.int32)
        ids[:n] = np.asarray(store.ids, np.int32)
        data = StringDeviceData(
            chars=jnp.asarray(chars),
            length=jnp.asarray(length),
            ids=jnp.asarray(ids),
            count=n,
        )
        data.extra["pad"] = jnp.asarray(pad)
        return data

    def encode_queries(self, points) -> dict:
        strs = [p.encode("utf-8") if isinstance(p, str) else bytes(p) for p in points]
        chars, length = _pack_strings(strs, len(strs))
        return {"qc": jnp.asarray(chars), "qlen": jnp.asarray(length)}

    def slice_data(self, data: StringDeviceData, start, size) -> dict:
        sl = lambda a: jax.lax.dynamic_slice_in_dim(a, start, size, 0)
        return {
            "x": sl(data.chars),
            "len": sl(data.length),
            "pad": sl(data.extra["pad"]),
        }

    def corpus_dict(self, data: StringDeviceData) -> dict:
        # 'count' lets gather paths mask padding statically (ids >= count,
        # no pad gather — ops/graph._row_pad); 'row_mask' (sw-graph
        # deletions) overrides it when present
        c = {"vecs": data.chars, "len": data.length, "pad": data.extra["pad"],
             "count": data.count}
        if "row_mask" in data.extra:
            c["row_mask"] = data.extra["row_mask"]
        return c

    def block(self, qenc, xc, precision: str = "float32") -> jax.Array:
        d = self._block_impl(qenc, xc)
        return d + xc["pad"][None, :]

    def _block_impl(self, qenc, xc):
        raise NotImplementedError


@register_space("leven")
class LevenSpace(StringSpaceBase):
    name = "leven"
    dist_kind = DistKind.INT

    def _block_impl(self, qenc, xc):
        return E.levenshtein_blocked(
            qenc["qc"], qenc["qlen"], xc["x"], xc["len"]
        ).astype(jnp.float32)


@register_space("normleven")
class NormLevenSpace(StringSpaceBase):
    name = "normleven"
    dist_kind = DistKind.FLOAT

    def _block_impl(self, qenc, xc):
        return E.normalized_levenshtein_blocked(qenc["qc"], qenc["qlen"], xc["x"], xc["len"])
