"""Polish-store A/B (nndPolishStore=1: int8 granule exploration in the
polish beam + exact re-score before the merge).

Same-process pairs so tunnel conditions cancel. Stages (argv[1]):
  300k — ps0 / ps1 / ps1-repeat at 300k (anchor: batch39 nnd300k_prof
         attributed polish0 at 35.0 s of the 165.5 s warm build).
  1m   — ps0 / ps1 at 1M (only meaningful if batch42 fixed the 1M
         NND worker fault).

Quality bar: ef=20 recall within noise of ps0 (the wave cstore proved
int8 exploration safe at ef>=14; polish runs at efConstruction=100).
Appends to /tmp/r2_nnd.jsonl.
"""

import sys

sys.path.insert(0, "scripts")
from r2_nnd_build import build_and_sweep, emit, gold_ids  # noqa: E402


def main():
    stage = sys.argv[1] if len(sys.argv) > 1 else "300k"
    from tpu_knn.eval.datasets import sift_like

    pts = sift_like(1_002_048, 128, seed=0)
    q = pts[1_000_000:]
    import traceback

    try:
        if stage == "300k":
            corpus = pts[:300_000]
            gold = gold_ids(corpus, q, "/tmp/gold_sift300k_l2.npz")
            emit(stage="ps300k", event="gold_ok")
            for tag, ps in (("ps0", 0), ("ps1", 1), ("ps1b", 1)):
                build_and_sweep(
                    corpus, q, gold, f"nnd300k_{tag}", (14, 20, 50),
                    dict(M=16, efConstruction=100, buildAlgo="nndescent",
                         nndPolishStore=ps),
                )
        else:
            corpus = pts[:1_000_000]
            gold = gold_ids(corpus, q, "/tmp/gold_sift1m_l2.npz")
            emit(stage="ps1m", event="gold_ok")
            for tag, ps in (("ps0", 0), ("ps1", 1)):
                build_and_sweep(
                    corpus, q, gold, f"nnd1m_{tag}", (14, 20),
                    dict(M=16, efConstruction=100, buildAlgo="nndescent",
                         nndPolishStore=ps, replicateNeighbors=1,
                         nbrStoreDtype="int8"),
                )
    except Exception:
        emit(stage=stage, event="crash", err=traceback.format_exc()[-900:])
        raise SystemExit(2)


if __name__ == "__main__":
    main()
