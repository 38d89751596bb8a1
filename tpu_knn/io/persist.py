"""Index persistence.

The reference saves two artifacts: ``<path>.dat`` (space data, via
WriteObjectVectorBinData) and ``<path>`` (method index blob)
(reference: nmslib_c.cpp:1369-1397, hnsw.cc:774-806). We keep the same
two-artifact model as ``<path>.dat.npz`` + ``<path>.idx.npz``, but fix
the reference's load quirk (space/method hardcoded to l2+hnsw,
nmslib_c.cpp:1421-1429) by storing the full creation header.
"""

from __future__ import annotations

import json

import numpy as np

from ..core.dataset import DataKind, DataStore, DistKind
from ..core.errors import DataIOError
from ..core.params import Params

_FORMAT_VERSION = 1


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
        np.savez(
            path + ".idx.npz",
            __header__=np.frombuffer(json.dumps(header).encode(), np.uint8),
            **{f"state_{k}": np.asarray(v) for k, v in state.items()},
        )
        if save_data:
            np.savez(path + ".dat.npz", **_store_to_arrays(index.store))
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
    if not load_data:
        # every method re-encodes the store on restore (the graph holds
        # corpus ROW indices, not vectors) — restoring against an empty
        # store would "load" an index that silently answers nothing
        from ..core.errors import InvalidArgumentError

        raise InvalidArgumentError(
            "load_data=False is unsupported: the index state references "
            "corpus rows and methods re-encode the store on restore "
            "(two-artifact model, .idx.npz + .dat.npz)"
        )
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
