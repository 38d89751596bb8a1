"""Experiment CLI (reference: the experiment binary's flag surface,
params_def.h) — end-to-end on a tiny dense dataset."""

import subprocess
import sys

import numpy as np


def test_cli_knn_sweep(tmp_path, rng):
    data = tmp_path / "data.txt"
    np.savetxt(data, rng.standard_normal((200, 12)).astype(np.float32), fmt="%.5f")
    out = tmp_path / "res.txt"
    env = {"JAX_PLATFORMS": "cpu", "PATH": "/usr/bin:/bin"}
    import os

    env.update({k: v for k, v in os.environ.items() if k not in env})
    env["JAX_PLATFORMS"] = "cpu"
    r = subprocess.run(
        [
            sys.executable, "-m", "tpu_knn",
            "--spaceType", "l2", "--spaceParams", "dim=12",
            "--dataFile", str(data),
            "--method", "seq_search",
            "--knn", "3", "--testSetQty", "1", "--maxNumQuery", "20",
            "--outFile", str(out),
        ],
        capture_output=True,
        text=True,
        # the sweep itself takes ~210 s on this one-core machine; leave
        # headroom for ambient load (the 300 s cap flaked under a loaded
        # suite run)
        timeout=600,
        env=env,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    txt = out.read_text()
    assert "kNN k=3" in txt and "recall" in txt
    # exact scan must report perfect recall
    line = [ln for ln in txt.splitlines() if ln.startswith("{")][0]
    assert line.split()[1] == "1"
