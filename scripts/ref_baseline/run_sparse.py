"""Dump the TPU bench's sparse dataset in the bench_ref sparse binary
format and drive the reference HNSW + brute force on it (one core).

Usage: python scripts/ref_baseline/run_sparse.py N [efc] [m]
Writes /tmp/ref_sparse_<N>.bin, prints bench_ref JSON lines.
"""

import struct
import subprocess
import sys

NQ = 512


def main():
    n = int(sys.argv[1])
    efc = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    m = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    vocab = int(sys.argv[4]) if len(sys.argv) > 4 else 30_000
    sys.path.insert(0, "/root/repo")
    import jax

    jax.config.update("jax_platforms", "cpu")
    from tpu_knn.eval.datasets import sparse_like

    pts = sparse_like(n + NQ, vocab=vocab, nnz=64, seed=0)
    path = f"/tmp/ref_sparse_{n}_{vocab}.bin"
    with open(path, "wb") as f:
        for ids, vals in pts[: n + NQ]:
            f.write(struct.pack("<i", len(ids)))
            for i, v in zip(ids.tolist(), vals.tolist()):
                f.write(struct.pack("<if", int(i), float(v)))
    print(f"wrote {path}", file=sys.stderr)
    cmd = [
        "/tmp/ref_baseline/bench_ref", path, str(n), "0", str(NQ),
        "cosinesimil_sparse_fast", "1", str(m), str(efc), "10", "20,50,100,200",
        "napp", "2,3,4",  # numPivot=512/numPrefix=32, matched to our arm
    ]
    print("running:", " ".join(cmd), file=sys.stderr)
    subprocess.run(cmd, check=False)


if __name__ == "__main__":
    main()
