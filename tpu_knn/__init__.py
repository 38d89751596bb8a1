"""tpu_knn — a TPU-native similarity-search framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
B-R-P/NMSLIB-ZIG (NMSLIB core + Zig API): distance spaces as blocked
MXU/VPU kernels, index methods (brute force, HNSW, SW-graph, VP-tree,
NAPP, DAAT inverted index) over padded device arrays, an evaluation
harness with exact gold standards, and multi-chip scaling via corpus
sharding over a jax.sharding.Mesh. See SURVEY.md for the blueprint.
"""

from .core.dataset import DataKind, DistKind, SparsePoint
from .core.errors import *  # noqa: F401,F403 — the 15-code taxonomy
from .core.params import Params
from .core.registry import (
    is_valid_space_type,
    known_methods,
    known_spaces,
)
from .utils.rng import set_default_seed

# Importing the subpackages runs the @register_space/@register_method
# decorators — the analog of initLibrary() -> initSpaces()/initMethods()
# (reference: src/init.cc:37-44).
from . import spaces  # noqa: F401
from . import methods  # noqa: F401

from .api import Index, QueryResult
from .spaces.dense import clear_upload_cache

__all__ = [
    "Index",
    "QueryResult",
    "clear_upload_cache",
    "Params",
    "DataKind",
    "DistKind",
    "SparsePoint",
    "known_spaces",
    "known_methods",
    "is_valid_space_type",
    "set_default_seed",
]

__version__ = "0.1.0"

# opt-in persistent XLA executable cache: only when the env var names a
# directory (config-only — touches no backend; see utils/jitcache.py)
import os as _os

if _os.environ.get("TPU_KNN_JIT_CACHE", "").strip() not in ("", "0", "off", "none"):
    from .utils.jitcache import enable_persistent_cache as _epc

    _epc()
    del _epc
del _os
