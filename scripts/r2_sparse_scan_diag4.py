"""Fourth-stage sparse diagnosis: find a scatter formulation the TPU
backend compiles CORRECTLY, and locate the wrong entries.

diag3 proved (post-UB-fix, all comparisons on device, inputs checksum-
verified): the _densify scatter produces wrong table entries for both
the query table (maxabs 2.79 vs host oracle) and the corpus chunks
(driving dot errors of ~24), deterministically, identical under
lax.map and standalone. The production qdense dot is exact where
probed only because its q_dense happens to be right on those entries.
Construction-time pair scoring densifies gathered candidate rows, so
this plausibly IS the 100k sparse HNSW recall gap.

Variants measured here (correctness vs uploaded host-oracle tables,
compared ON DEVICE, plus device timing):
  A. current: OOB-drop sentinels remapped distinct, hints on
  B. no hints: same indices, unique_indices=False, indices_are_sorted=False
  C. in-bounds val-0: pads -> column v_pad-1 with value 0, no hints
  F. padded-width: scatter into [r, v_pad+nnz] (pads -> v_pad+slot, all
     in bounds, val 0, hints honest), slice off the tail
Also dumps the error structure of variant A (rows/cols of wrong
entries). Appends JSON to /tmp/r2_sdiag4.jsonl.
"""

import functools
import json
import time

import numpy as np

LOG = "/tmp/r2_sdiag4.jsonl"
N, NQ = 100_000, 512


def emit(**kw):
    with open(LOG, "a") as f:
        f.write(json.dumps(kw) + "\n")
    print(json.dumps(kw), flush=True)


def main():
    import jax
    import jax.numpy as jnp

    import tpu_knn.ops.sparse as S
    from tpu_knn import Index
    from tpu_knn.core.dataset import DataKind
    from tpu_knn.eval.datasets import sparse_like

    pts = sparse_like(N + NQ, vocab=30_000, nnz=64, seed=0)
    idx = Index("cosinesimil_sparse", method="seq_search",
                data_type=DataKind.SPARSE)
    idx.add_sparse_batch(pts[:N])
    idx.build_index()
    data = idx.method.data
    qenc = idx.method._scan_queries(pts[N:N + NQ])
    v_pad = int(data.extra["vocab_mark"].shape[0])

    def host_table(ci, cv, rows_n):
        qi = np.asarray(ci).astype(np.int64)
        qv = np.asarray(cv).astype(np.float64)
        t = np.zeros((rows_n, v_pad), np.float64)
        rr = np.repeat(np.arange(rows_n), qi.shape[1])
        keep = ((qi >= 1) & (qi <= v_pad)).ravel()
        np.add.at(t, (rr[keep], (qi.ravel() - 1)[keep]), qv.ravel()[keep])
        return jnp.asarray(t.astype(np.float32))

    # ---------- variants ----------
    def dens_A(col, val):
        return S._densify(col, val, v_pad)

    @functools.partial(jax.jit)
    def dens_B(col, val):
        r, nnz = col.shape
        rows = jax.lax.broadcasted_iota(jnp.int32, (r, nnz), 0)
        slot = jax.lax.broadcasted_iota(jnp.int32, (r, nnz), 1)
        cols0 = jnp.where(col > v_pad, v_pad + 1 + slot, col) - 1
        return jnp.zeros((r, v_pad), jnp.float32).at[rows, cols0].add(
            val, mode="drop")

    @functools.partial(jax.jit)
    def dens_C(col, val):
        r, nnz = col.shape
        rows = jax.lax.broadcasted_iota(jnp.int32, (r, nnz), 0)
        pad = col > v_pad
        cols0 = jnp.where(pad, v_pad, col) - 1
        v = jnp.where(pad, 0.0, val)
        return jnp.zeros((r, v_pad), jnp.float32).at[rows, cols0].add(v)

    @functools.partial(jax.jit)
    def dens_F(col, val):
        r, nnz = col.shape
        rows = jax.lax.broadcasted_iota(jnp.int32, (r, nnz), 0)
        slot = jax.lax.broadcasted_iota(jnp.int32, (r, nnz), 1)
        cols0 = jnp.where(col > v_pad, v_pad + 1 + slot, col) - 1
        wide = jnp.zeros((r, v_pad + nnz + 8), jnp.float32)
        wide = wide.at[rows, cols0].add(
            val, unique_indices=True, indices_are_sorted=True)
        return wide[:, :v_pad]

    variants = {"A_current": dens_A, "B_nohints": dens_B,
                "C_inbounds0": dens_C, "F_padwidth": dens_F}

    # ---------- correctness: query table + one corpus chunk ----------
    C = 2048
    cols_c = jax.lax.dynamic_slice_in_dim(data.col, 0, C, 0)
    vals_c = jax.lax.dynamic_slice_in_dim(data.val, 0, C, 0)
    jobs = (("qtable", qenc["qcol"], qenc["qval"], NQ),
            ("xchunk", cols_c, vals_c, C))
    oracles = {}
    for name, ci, cv, rn in jobs:
        oracles[name] = host_table(ci, cv, rn)
    for vname, fn in variants.items():
        for name, ci, cv, rn in jobs:
            try:
                t = fn(ci, cv)
                err = jnp.abs(t - oracles[name])
                mx = float(jnp.max(err))
                nbad = int(jnp.sum(err > 1e-4))
                emit(variant=vname, table=name, maxabs=mx, n_bad=nbad)
            except Exception as e:
                emit(variant=vname, table=name, err=str(e)[-200:])

    # ---------- error structure of A on the corpus chunk ----------
    tA = variants["A_current"](cols_c, vals_c)
    err = jnp.abs(tA - oracles["xchunk"])
    bad_per_row = jnp.sum(err > 1e-4, axis=1)
    bad_per_col_any = jnp.sum(err > 1e-4, axis=0)
    nz_rows = np.asarray(jnp.nonzero(bad_per_row, size=32, fill_value=-1)[0])
    nz_cols = np.asarray(jnp.nonzero(bad_per_col_any, size=32, fill_value=-1)[0])
    emit(check="A_error_structure",
         bad_rows=nz_rows.tolist(), bad_cols=nz_cols.tolist(),
         total_bad=int(jnp.sum(bad_per_row)))

    # ---------- timing: full-corpus densify sweep per variant ----------
    n_pad = data.col.shape[0]
    nch = n_pad // C
    colsr = data.col[: nch * C].reshape(nch, C, -1)
    valsr = data.val[: nch * C].reshape(nch, C, -1)
    for vname, fn in variants.items():
        try:
            @jax.jit
            def sweep(c, v, fn=fn):
                return jax.lax.map(
                    lambda a: jnp.sum(fn(a[0], a[1]), dtype=jnp.float32),
                    (c, v)).sum()

            float(sweep(colsr, valsr))
            t0 = time.perf_counter()
            for _ in range(3):
                out = sweep(colsr, valsr)
            float(out)
            emit(variant=vname, timing_ms=round(
                (time.perf_counter() - t0) / 3 * 1e3, 1))
        except Exception as e:
            emit(variant=vname, timing_err=str(e)[-200:])


if __name__ == "__main__":
    main()
