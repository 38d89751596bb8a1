"""Importing tpu_knn must not initialize a JAX backend.

On deployment images a site hook can register an experimental PJRT
plugin (here: the axon TPU tunnel) in every Python process and
monkeypatch backend resolution, so ANY device use before the caller
pins a platform dials the remote tunnel — a module-level
``jnp.int32(...)`` constant is enough to hang every ``import tpu_knn``
when the tunnel is down. The library therefore keeps all module-level
constants as numpy scalars (ops/sparse.py PAD_Q note) and this test
pins that invariant. Reference analog: the C++ library's static
initializers do no GPU/device work either (init.cc only fills
registries).
"""

import subprocess
import sys


def test_import_creates_no_backend():
    # A fresh interpreter (not the test process — conftest already
    # initialized the CPU backend there).
    code = (
        "import tpu_knn\n"
        "import jax._src.xla_bridge as xb\n"
        "assert not xb._backends, f'backends initialized at import: {list(xb._backends)}'\n"
        "print('clean')\n"
    )
    r = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        timeout=120,
    )
    assert r.returncode == 0, (r.stdout + r.stderr)[-2000:]
    assert "clean" in r.stdout
