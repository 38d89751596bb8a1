"""Method registration (reference analog: include/factory/init_methods.h)."""

from . import seq_search  # noqa: F401
from . import hnsw  # noqa: F401
from . import sw_graph  # noqa: F401
from . import vptree  # noqa: F401
from . import napp  # noqa: F401
from . import inv_index  # noqa: F401
from . import dummy  # noqa: F401

from .base import Method  # noqa: F401
