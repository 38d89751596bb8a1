"""Deterministic RNG helpers.

The reference seeds a thread-local mt19937 from defaultRandomSeed
(reference: include/utils.h:75-129, src/init.cc:34-35). On TPU we use
JAX threefry keys — determinism across devices is free. A module-level
default seed mirrors initLibrary(seed=...).
"""

from __future__ import annotations

import jax
import numpy as np

_DEFAULT_SEED = 0


def set_default_seed(seed: int) -> None:
    global _DEFAULT_SEED
    _DEFAULT_SEED = int(seed)


def default_seed() -> int:
    return _DEFAULT_SEED


def key(seed: int | None = None) -> jax.Array:
    return jax.random.key(_DEFAULT_SEED if seed is None else seed)


def np_rng(seed: int | None = None) -> np.random.Generator:
    return np.random.default_rng(_DEFAULT_SEED if seed is None else seed)
