"""Method registration (reference analog: include/factory/init_methods.h)."""

from . import seq_search  # noqa: F401
from . import hnsw  # noqa: F401

from .base import Method  # noqa: F401
