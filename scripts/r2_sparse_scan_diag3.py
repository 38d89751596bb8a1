"""Third-stage sparse-scan diagnosis: separate UPLOAD / COMPUTE /
DOWNLOAD corruption. sdiag2 found (deterministically) whole query rows
scoring exact 0.0 where the host oracle has ~25, the device q_dense
table differing from host by 3.2, AND the device dots differing from a
reference built from the device's own downloaded table — mutually
inconsistent unless some host<->device transfer lies. Everything here
compares ON DEVICE via exact bitwise checksums (a corrupted 4-byte
scalar download is vanishingly unlikely), then tests downloads
separately (bulk vs row-sliced vs repeated).

Appends JSON lines to /tmp/r2_sdiag3.jsonl.
"""

import json
import os

import numpy as np

LOG = "/tmp/r2_sdiag3.jsonl"
N, NQ = int(os.environ.get("SD3_N", 100_000)), 512


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

    def dev_cksum(x):
        """Exact position-weighted checksum of raw bits mod 2^32, on
        device (x64 is disabled on this image, so stay in uint32)."""
        u = (jax.lax.bitcast_convert_type(x, jnp.uint32)
             if x.dtype != jnp.int32 else x.astype(jnp.uint32)).reshape(-1)
        w = (jnp.arange(u.shape[0], dtype=jnp.uint32) | jnp.uint32(1))
        return int(jnp.sum(u * w, dtype=jnp.uint32))

    def host_cksum(x):
        u = (x.view(np.uint32) if x.dtype != np.int32
             else x.astype(np.uint32)).reshape(-1)
        w = np.arange(u.shape[0], dtype=np.uint32) | np.uint32(1)
        with np.errstate(over="ignore"):
            return int(np.sum(u * w, dtype=np.uint32))

    pts = sparse_like(N + NQ, vocab=30_000, nnz=64, seed=0)
    corpus, queries = pts[:N], pts[N : N + NQ]

    idx = Index("cosinesimil_sparse", method="seq_search",
                data_type=DataKind.SPARSE)
    idx.add_sparse_batch(corpus)
    idx.build_index()
    data = idx.method.data
    qenc = idx.method._scan_queries(queries)
    v_pad = data.extra["vocab_mark"].shape[0]
    qd = qenc["q_dense"]

    # ---- 1. upload integrity: device checksums of the query CSR vs the
    # same arrays on host (downloaded once, host-checksummed — if the
    # DOWNLOAD were broken these would mismatch too, disambiguated by
    # step 4)
    for name in ("qcol", "qval"):
        d = dev_cksum(qenc[name])
        h = host_cksum(np.asarray(qenc[name]))
        emit(check=f"updown_{name}", dev=d, host=h, match=bool(d == h))

    # ---- 2. compute determinism ON DEVICE: rebuild q_dense from the
    # same device CSR and compare bitwise on device
    qd2 = S._densify(qenc["qcol"], qenc["qval"], v_pad)
    emit(check="densify_rebuild_dev_maxabs",
         v=float(jnp.max(jnp.abs(qd - qd2))),
         bitwise=bool(dev_cksum(qd) == dev_cksum(qd2)))

    # ---- 3. device table vs a HOST-built oracle table, compared ON
    # DEVICE after one upload (np.add.at, sentinels masked — no
    # column-0 clobber)
    qi = np.asarray(qenc["qcol"]).astype(np.int64)
    qv = np.asarray(qenc["qval"]).astype(np.float64)
    qd_host = np.zeros((NQ, v_pad))
    rr = np.repeat(np.arange(NQ), qi.shape[1])
    keep = ((qi >= 1) & (qi <= v_pad)).ravel()
    np.add.at(qd_host, (rr[keep], (qi.ravel() - 1)[keep]),
              qv.ravel()[keep])
    qd_host32 = jnp.asarray(qd_host.astype(np.float32))
    emit(check="densify_vs_host_oracle_dev_maxabs",
         v=float(jnp.max(jnp.abs(qd - qd_host32))))

    # ---- 4. download integrity: bulk vs row-sliced vs repeated
    C = 2048
    cols = jax.lax.dynamic_slice_in_dim(data.col, 0, C, 0)
    vals = jax.lax.dynamic_slice_in_dim(data.val, 0, C, 0)
    dq = S.dot_qdense(qd, cols, vals)
    bulk1 = np.asarray(dq)
    bulk2 = np.asarray(jax.device_get(dq))
    rows_sl = np.stack([np.asarray(dq[i]) for i in range(140, 160)])
    emit(check="download_dq",
         bulk_repeat_bitwise=bool(np.array_equal(bulk1, bulk2)),
         sliced_vs_bulk_maxabs=float(
             np.max(np.abs(rows_sl - bulk1[140:160]))),
         bulk_cksum=host_cksum(bulk1),
         dev_cksum=dev_cksum(dq))
    qd_dl = np.asarray(qd)
    emit(check="download_qdense",
         host_cksum_of_download=host_cksum(qd_dl),
         dev_cksum=dev_cksum(qd),
         match=bool(host_cksum(qd_dl) == dev_cksum(qd)),
         dl_vs_hostoracle_maxabs=float(
             np.max(np.abs(qd_dl.astype(np.float64) - qd_host))))

    # ---- 5. the dots themselves, all compared ON DEVICE:
    #   dq        = gather-from-table (production path)
    #   db        = densify-corpus-blocks matmul
    #   dm        = full dense matmul against the host-oracle table
    db = S.dot_blocked_dense(qenc["qcol"], qenc["qval"], cols, vals,
                             v_pad, "float32")
    xd = S._densify(cols, vals, v_pad)
    dm = jax.lax.dot_general(
        qd_host32, xd, (((1,), (1,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)
    emit(check="dots_dev_maxabs",
         dq_vs_db=float(jnp.max(jnp.abs(dq - db))),
         dq_vs_dm=float(jnp.max(jnp.abs(dq - dm))),
         db_vs_dm=float(jnp.max(jnp.abs(db - dm))))

    # ---- 5b. _densify under lax.map (the sketch-build / blocked-scan
    # shape class: [2048, v_pad] scatters inside a scanned program) vs
    # the same chunks densified one-by-one, compared ON DEVICE — if
    # these disagree, the scatter miscompiles specifically under the
    # mapped/fused program, which would poison sketch projections too
    import jax.numpy as jnp2
    CH = 512
    nch = 4
    cols_m = cols[: CH * nch].reshape(nch, CH, cols.shape[1])
    vals_m = vals[: CH * nch].reshape(nch, CH, vals.shape[1])
    mapped = jax.lax.map(lambda a: S._densify(a[0], a[1], v_pad),
                         (cols_m, vals_m))
    single = jnp2.stack([S._densify(cols_m[i], vals_m[i], v_pad)
                         for i in range(nch)])
    emit(check="densify_lax_map_vs_single_dev_maxabs",
         v=float(jnp2.max(jnp2.abs(mapped - single))))

    # ---- 6. host f64 oracle for 32 rows of the chunk, vs a 32-row
    # download of each dot (small downloads)
    ci = np.asarray(cols).astype(np.int64)
    cv = np.asarray(vals).astype(np.float64)
    keepc = (ci >= 1) & (ci <= v_pad)
    ref = np.zeros((32, C))
    for j in range(C):
        m = keepc[j]
        ref[:, j] = qd_host[:32, ci[j, m] - 1] @ cv[j, m]
    for name, arr in (("dq", dq), ("db", db), ("dm", dm)):
        got = np.asarray(arr[:32]).astype(np.float64)
        emit(check=f"oracle32_{name}", maxabs=float(np.max(np.abs(got - ref))))


if __name__ == "__main__":
    main()
