"""Name -> constructor registries for spaces and index methods.

Mirrors SpaceFactoryRegistry / MethodFactoryRegistry and the initLibrary
registration pass (reference: include/spacefactory.h:31-58,
include/methodfactory.h:33-68, src/init.cc:37-44). Unlike the reference,
registries are not templated on dist type: each Space declares its own
dist kind and the registry validates compatibility at creation time.
"""

from __future__ import annotations

from typing import Callable

from .errors import InvalidArgumentError, PluginRegistrationError
from .params import Params

_SPACES: dict[str, Callable] = {}
_METHODS: dict[str, Callable] = {}

#: Space-name aliases, e.g. "cosine" -> "cosinesimil" (reference: lib.zig:530-533).
SPACE_ALIASES = {"cosine": "cosinesimil"}


def register_space(name: str):
    def deco(ctor: Callable):
        if name in _SPACES:
            raise PluginRegistrationError(f"space {name!r} already registered")
        _SPACES[name] = ctor
        return ctor

    return deco


def register_method(name: str):
    def deco(ctor: Callable):
        if name in _METHODS:
            raise PluginRegistrationError(f"method {name!r} already registered")
        _METHODS[name] = ctor
        return ctor

    return deco


def canonical_space_name(name: str) -> str:
    return SPACE_ALIASES.get(name, name)


def create_space(name: str, params: Params | dict | None = None):
    key = canonical_space_name(name)
    if key not in _SPACES:
        raise InvalidArgumentError(f"unknown space {name!r}; known: {sorted(_SPACES)}")
    return _SPACES[key](Params.of(params))


def create_method(name: str, space, params: Params | dict | None = None):
    if name not in _METHODS:
        raise InvalidArgumentError(f"unknown method {name!r}; known: {sorted(_METHODS)}")
    return _METHODS[name](space, Params.of(params))


def known_spaces() -> list[str]:
    return sorted(_SPACES)


def known_methods() -> list[str]:
    return sorted(_METHODS)


def is_valid_space_type(name: str) -> bool:
    """Reference analog: lib.zig isValidSpaceType (lib.zig:487-492)."""
    return canonical_space_name(name) in _SPACES
