"""Pallas kernel logic in interpreter mode (CPU-runnable; the compiled
path is exercised on real TPU by bench.py / seq_search dispatch)."""

import numpy as np
import pytest

import jax.numpy as jnp

from tpu_knn.ops.pallas_scan import fused_groupmin


def test_fused_groupmin_f32(rng):
    q = rng.standard_normal((16, 128)).astype(np.float32)
    x = rng.standard_normal((512, 128)).astype(np.float32)
    qt = (q * q).sum(1).astype(np.float32)
    xt = (x * x).sum(1).astype(np.float32)
    out = np.asarray(
        fused_groupmin(
            jnp.asarray(q), jnp.asarray(x), jnp.asarray(qt), jnp.asarray(xt),
            scale=-2.0, tq=16, tc=256, interpret=True,
        )
    )
    dd = qt[:, None] + xt[None, :] - 2 * q @ x.T
    want = dd.reshape(16, 4, 128).min(2)
    np.testing.assert_allclose(out, want, atol=1e-3)


@pytest.mark.parametrize("backend", ["xla_batched", "xla_reshape"])
def test_xla_groupmin_backends(rng, backend):
    """The XLA pass-1 engines return the same group mins as the kernel
    math, for f32 and the exact int8 path (GROUPMIN_BACKEND switch)."""
    import jax

    from tpu_knn.ops import pallas_scan as PS

    q = rng.standard_normal((16, 128)).astype(np.float32)
    x = rng.standard_normal((512, 128)).astype(np.float32)
    qt = (q * q).sum(1).astype(np.float32)
    xt = (x * x).sum(1).astype(np.float32)
    q8 = rng.integers(-128, 128, size=(16, 128)).astype(np.int8)
    x8 = rng.integers(-128, 128, size=(512, 128)).astype(np.int8)
    z = np.zeros(16, np.float32), np.zeros(512, np.float32)
    old = PS.GROUPMIN_BACKEND
    PS.GROUPMIN_BACKEND = backend
    jax.clear_caches()
    try:
        out = np.asarray(
            fused_groupmin(
                jnp.asarray(q), jnp.asarray(x), jnp.asarray(qt), jnp.asarray(xt),
                scale=-2.0, tq=16, tc=256,
            )
        )
        out8 = np.asarray(
            fused_groupmin(
                jnp.asarray(q8), jnp.asarray(x8), jnp.asarray(z[0]),
                jnp.asarray(z[1]), scale=-2.0, tq=16, tc=256,
            )
        )
    finally:
        PS.GROUPMIN_BACKEND = old
        jax.clear_caches()
    dd = qt[:, None] + xt[None, :] - 2 * q @ x.T
    np.testing.assert_allclose(out, dd.reshape(16, 4, 128).min(2), atol=1e-3)
    g = q8.astype(np.int64) @ x8.astype(np.int64).T
    np.testing.assert_allclose(out8, (-2.0 * g).reshape(16, 4, 128).min(2), atol=0)


def test_fused_groupmin_int8(rng):
    q8 = rng.integers(-128, 128, size=(16, 128)).astype(np.int8)
    x8 = rng.integers(-128, 128, size=(256, 128)).astype(np.int8)
    qt = np.zeros(16, np.float32)
    xt = np.zeros(256, np.float32)
    out = np.asarray(
        fused_groupmin(
            jnp.asarray(q8), jnp.asarray(x8), jnp.asarray(qt), jnp.asarray(xt),
            scale=-2.0, tq=16, tc=256, interpret=True,
        )
    )
    g = q8.astype(np.int64) @ x8.astype(np.int64).T
    want = (-2.0 * g).reshape(16, 2, 128).min(2)
    np.testing.assert_allclose(out, want, atol=0)
