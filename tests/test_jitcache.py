"""Persistent-compilation-cache helper (utils/jitcache.py)."""

import jax

import tpu_knn.utils.jitcache as JC


def test_env_disable(monkeypatch, tmp_path):
    monkeypatch.setenv("TPU_KNN_JIT_CACHE", "0")
    assert JC.enable_persistent_cache() is None


def test_enable_points_jax_at_dir(monkeypatch, tmp_path):
    target = str(tmp_path / "jc")
    monkeypatch.setenv("TPU_KNN_JIT_CACHE", target)
    monkeypatch.setattr(JC, "_enabled", None)
    assert JC.enable_persistent_cache() == target
    assert jax.config.jax_compilation_cache_dir == target
    # idempotent
    assert JC.enable_persistent_cache() == target


def test_explicit_path_overrides_env(monkeypatch, tmp_path):
    monkeypatch.setenv("TPU_KNN_JIT_CACHE", "0")
    target = str(tmp_path / "explicit")
    monkeypatch.setattr(JC, "_enabled", None)
    assert JC.enable_persistent_cache(target) == target
