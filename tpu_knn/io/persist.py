"""Index persistence.

The reference saves two artifacts: ``<path>.dat`` (space data, via
WriteObjectVectorBinData) and ``<path>`` (method index blob)
(reference: nmslib_c.cpp:1369-1397, hnsw.cc:774-806). We keep the same
two-artifact model as ``<path>.dat.npz`` + ``<path>.idx.npz``, but fix
the reference's load quirk (space/method hardcoded to l2+hnsw,
nmslib_c.cpp:1421-1429) by storing the full creation header.

Index-only load (``load_data=False``, nmslib_c.cpp:1399-1456): the
reference can load without re-reading the ``.dat`` because its
optimized HNSW blob embeds the vector payloads in the flat node layout
(hnsw.cc:353-419). The TPU-native equivalent embeds the (compact raw)
data arrays in ``.idx.npz``, so ``load_data=False`` reads one artifact
and restore re-encodes to the device exactly as normal — methods never
see a data-less store, which would break their row-indexed graph/tree
state.

Format v3 (ADVICE r4: v2 wrote the corpus twice): the data arrays live
in exactly ONE artifact — ``save_data=True`` writes them to
``.dat.npz`` only, ``save_data=False`` embeds them in ``.idx.npz``
only. The loader uses embedded arrays when present and falls back to
the ``.dat.npz`` otherwise, so both load modes work for both save
modes and disk/IO at 1M scale is halved vs v2.
"""

from __future__ import annotations

import json

import numpy as np

from ..core.dataset import DataKind, DataStore, DistKind
from ..core.errors import DataIOError
from ..core.params import Params

_FORMAT_VERSION = 3  # v3: data arrays in exactly one artifact (see module doc)


def _store_to_arrays(store: DataStore) -> dict[str, np.ndarray]:
    out: dict[str, np.ndarray] = {
        "ids": np.asarray(store.ids, np.int64),
        "labels": np.asarray(store.labels, np.int64),
    }
    if store.kind in (DataKind.DENSE, DataKind.UINT8):
        out["dense"] = store.dense_matrix()
    elif store.kind is DataKind.SPARSE:
        pts = store.sparse_points()
        lens = np.asarray([len(p.ids) for p in pts], np.int64)
        out["sparse_len"] = lens
        out["sparse_ids"] = (
            np.concatenate([p.ids for p in pts]) if pts else np.zeros(0, np.int32)
        )
        out["sparse_vals"] = (
            np.concatenate([p.values for p in pts]) if pts else np.zeros(0, np.float32)
        )
    else:
        bs = store.strings()
        lens = np.asarray([len(b) for b in bs], np.int64)
        out["str_len"] = lens
        out["str_bytes"] = (
            np.frombuffer(b"".join(bs), dtype=np.uint8) if bs else np.zeros(0, np.uint8)
        )
    return out


def _store_from_arrays(kind: DataKind, arrays) -> DataStore:
    store = DataStore(kind)
    ids = arrays["ids"].tolist()
    if kind in (DataKind.DENSE, DataKind.UINT8):
        mat = arrays["dense"]
        if mat.shape[0]:
            if kind is DataKind.DENSE:
                store.add_dense_batch(mat, ids)
            else:
                store.add_uint8_batch(mat, ids)
    elif kind is DataKind.SPARSE:
        lens = arrays["sparse_len"]
        sids, svals = arrays["sparse_ids"], arrays["sparse_vals"]
        pts, off = [], 0
        for ln in lens:
            pts.append((sids[off : off + ln], svals[off : off + ln]))
            off += int(ln)
        if pts:
            store.add_sparse_batch(pts, ids)
    else:
        lens = arrays["str_len"]
        raw = arrays["str_bytes"].tobytes()
        strs, off = [], 0
        for ln in lens:
            strs.append(raw[off : off + int(ln)])
            off += int(ln)
        if strs:
            store.add_string_batch(strs, ids)
    store.labels = arrays["labels"].tolist()
    return store


def save_index(index, path: str, save_data: bool = True) -> None:
    header = {
        "format_version": _FORMAT_VERSION,
        "space": index._requested_space,
        "space_params": index.space_params.as_dict(),
        "method": index.method_name,
        "data_type": index.data_type.value,
        "dist_type": index.dist_type.value,
        "index_params": (index._index_params or Params()).as_dict(),
        "count": len(index.store),
        # distributed indices record the mesh size; load recreates an
        # equal-size mesh over the then-available devices
        "mesh_devices": (
            int(index.mesh.devices.size)
            if getattr(index, "mesh", None) is not None
            and not isinstance(index.mesh, int)
            else int(index.mesh or 0)
        ),
    }
    state = index.method.state_arrays() if index.method is not None else {}
    try:
        data_arrays = _store_to_arrays(index.store)
        # the data arrays go to exactly one artifact (v3): the separate
        # .dat when save_data=True (reference's two-artifact model,
        # nmslib_c.cpp:1383-1388), embedded in the .idx otherwise so the
        # single artifact stays self-sufficient for load_data=False
        embed = {} if save_data else {f"data_{k}": v for k, v in data_arrays.items()}
        np.savez(
            path + ".idx.npz",
            __header__=np.frombuffer(json.dumps(header).encode(), np.uint8),
            **embed,
            **{f"state_{k}": np.asarray(v) for k, v in state.items()},
        )
        if save_data:
            np.savez(path + ".dat.npz", **data_arrays)
    except OSError as e:
        raise DataIOError(f"failed to save index to {path}: {e}")


def load_index(path: str, load_data: bool = True):
    from ..api import Index

    try:
        idx_npz = np.load(path + ".idx.npz")
    except OSError as e:
        raise DataIOError(f"failed to load index from {path}: {e}")
    header = json.loads(bytes(idx_npz["__header__"].tobytes()).decode())
    index = Index(
        header["space"],
        Params(header["space_params"]) if header["space_params"] else None,
        header["method"],
        DataKind(header["data_type"]),
        DistKind(header["dist_type"]),
        mesh=header.get("mesh_devices", 0) or None,
    )
    index._index_params = Params(header["index_params"])
    if header["format_version"] < 2:
        raise DataIOError(
            f"{path}.idx.npz is a format-v{header['format_version']} "
            "artifact without embedded data; re-save the index"
        )
    embedded = {
        k[len("data_") :]: idx_npz[k]
        for k in idx_npz.files
        if k.startswith("data_")
    }
    if embedded:
        # v2 always embeds; v3 embeds when saved with save_data=False —
        # either way the .idx is self-sufficient (reference parity: the
        # optimized HNSW blob embeds vectors, nmslib_c.cpp:1399-1456)
        dat = embedded
    else:
        # v3 save_data=True artifact: the data lives only in the .dat
        try:
            dat = np.load(path + ".dat.npz")
        except OSError as e:
            raise DataIOError(f"failed to load index data from {path}: {e}")
    index.store = _store_from_arrays(index.data_type, dat)
    state = {
        k[len("state_") :]: idx_npz[k] for k in idx_npz.files if k.startswith("state_")
    }
    index.method = index._make_method(index._index_params)
    index.method.restore(index.store, state, index._index_params)
    index.built = True
    return index
