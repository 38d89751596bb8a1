"""Space registration (reference analog: include/factory/init_spaces.h)."""

from . import dense  # noqa: F401

from .base import Space  # noqa: F401
