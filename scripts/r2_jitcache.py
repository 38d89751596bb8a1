"""Probe: does JAX's persistent compilation cache work over the axon
remote-compile relay? If yes, every cold-process build stops paying the
~490 s re-compile tax (measured at 300k NND: 669.6 s cold vs 176.9 s
same-process rebuild) — cold build walls become warm walls for free.

Mechanics: jax_compilation_cache_dir caches SERIALIZED EXECUTABLES
keyed on (HLO, flags, platform) at the PJRT client layer. It works iff
the axon PJRT plugin implements executable serialization; if it
doesn't, JAX logs a warning and falls through (no harm).

Two runs of the same moderately-big program in SEPARATE processes with
the cache dir set; the child reports its compile wall. A child wall
<< parent wall (and a populated cache dir) = supported.

Appends JSON to /tmp/r2_jitcache.jsonl.
"""

import json
import os
import subprocess
import sys
import time

LOG = "/tmp/r2_jitcache.jsonl"
CACHE = "/tmp/tpu_knn_jaxcache"


def emit(**kw):
    with open(LOG, "a") as f:
        f.write(json.dumps(kw) + "\n")
    print(json.dumps(kw), flush=True)


def one_run(tag):
    import jax

    jax.config.update("jax_compilation_cache_dir", CACHE)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    import jax.numpy as jnp
    import numpy as np

    # a program big enough to take seconds of remote compile: the
    # group-min two-pass scan shape class used by seq_search
    x = jnp.asarray(np.random.default_rng(0).standard_normal((65536, 128)), jnp.float32)
    q = jnp.asarray(np.random.default_rng(1).standard_normal((512, 128)), jnp.float32)

    @jax.jit
    def f(q, x):
        d = (
            jnp.sum(q * q, 1)[:, None]
            - 2.0 * jax.lax.dot_general(q, x, (((1,), (1,)), ((), ())),
                                        precision=jax.lax.Precision.HIGHEST)
            + jnp.sum(x * x, 1)[None, :]
        )
        g = d.reshape(512, -1, 128).min(2)
        v, i = jax.lax.top_k(-g, 16)
        return -v, i

    t0 = time.perf_counter()
    v, i = f(q, x)
    float(jnp.sum(v))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    v, i = f(q, x)
    float(jnp.sum(v))
    exec_s = time.perf_counter() - t0
    files = sum(len(fs) for _, _, fs in os.walk(CACHE)) if os.path.isdir(CACHE) else 0
    emit(tag=tag, compile_s=round(compile_s, 2), exec_s=round(exec_s, 3),
         cache_files=files)


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "child":
        one_run("child")
        return
    one_run("parent")
    r = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "child"],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        timeout=900,
    )
    emit(tag="done", child_rc=r.returncode)


if __name__ == "__main__":
    main()
