"""IO: index persistence (persist.py) + native data loading/packing
(native.py; reference analog: read_data.h, space_vector.cc readers)."""

from . import native  # noqa: F401
from .native import read_dense_text, read_sparse_text  # noqa: F401
