"""Persistent-compile-cache wiring (utils/compile_cache.py).

The round-4 review found cold XLA compiles dominate first-fit latency
(1.3M UMAP: 283 s cold vs 82 s warm) with no evidence the library ever
applied JAX's persistent cache; these tests pin the wiring: estimator
construction configures ``jax_compilation_cache_dir``, user config wins,
and the env opt-outs work.
"""

import os

import jax
import pytest

from torchdr_tpu.utils import compile_cache
from torchdr_tpu.utils.compile_cache import compile_cache_dir, enable_compile_cache


@pytest.fixture(autouse=True)
def _restore_jax_cache_config(monkeypatch):
    """Snapshot/restore the global jax cache config around each test."""
    prev_dir = jax.config.jax_compilation_cache_dir
    prev_min = jax.config.jax_persistent_cache_min_compile_time_secs
    prev_state = (compile_cache._APPLIED, compile_cache._DONE)
    compile_cache._reset_for_tests()
    yield
    jax.config.update("jax_compilation_cache_dir", prev_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", prev_min)
    compile_cache._APPLIED, compile_cache._DONE = prev_state


def test_default_dir_under_home(monkeypatch):
    monkeypatch.delenv("TORCHDR_TPU_COMPILE_CACHE", raising=False)
    monkeypatch.delenv("TORCHDR_TPU_NO_COMPILE_CACHE", raising=False)
    path = compile_cache_dir()
    assert path is not None
    assert path.endswith(os.path.join("torchdr_tpu", "jax_cache"))


def test_env_opt_out(monkeypatch):
    monkeypatch.setenv("TORCHDR_TPU_NO_COMPILE_CACHE", "1")
    assert compile_cache_dir() is None
    assert enable_compile_cache() is None
    # "0" means enabled
    monkeypatch.setenv("TORCHDR_TPU_NO_COMPILE_CACHE", "0")
    assert compile_cache_dir() is not None


def test_enable_sets_jax_config(monkeypatch, tmp_path):
    cache = str(tmp_path / "cache")
    monkeypatch.setenv("TORCHDR_TPU_COMPILE_CACHE", cache)
    monkeypatch.delenv("TORCHDR_TPU_NO_COMPILE_CACHE", raising=False)
    jax.config.update("jax_compilation_cache_dir", None)
    got = enable_compile_cache()
    assert got == cache
    assert jax.config.jax_compilation_cache_dir == cache
    assert jax.config.jax_persistent_cache_min_compile_time_secs == 0.0
    assert os.path.isdir(cache)


def test_user_config_wins(monkeypatch, tmp_path):
    theirs = str(tmp_path / "user_cache")
    monkeypatch.setenv("TORCHDR_TPU_COMPILE_CACHE", str(tmp_path / "ours"))
    jax.config.update("jax_compilation_cache_dir", theirs)
    prev_min = jax.config.jax_persistent_cache_min_compile_time_secs
    assert enable_compile_cache() == theirs
    assert jax.config.jax_compilation_cache_dir == theirs
    # companion knob untouched when the user owns the dir
    assert jax.config.jax_persistent_cache_min_compile_time_secs == prev_min
    assert not os.path.exists(str(tmp_path / "ours"))


def test_idempotent_latch(monkeypatch, tmp_path):
    first = str(tmp_path / "first")
    monkeypatch.setenv("TORCHDR_TPU_COMPILE_CACHE", first)
    jax.config.update("jax_compilation_cache_dir", None)
    assert enable_compile_cache() == first
    # a later env change does not re-apply
    monkeypatch.setenv("TORCHDR_TPU_COMPILE_CACHE", str(tmp_path / "second"))
    assert enable_compile_cache() == first


def test_estimator_construction_applies_cache(monkeypatch, tmp_path):
    cache = str(tmp_path / "est_cache")
    monkeypatch.setenv("TORCHDR_TPU_COMPILE_CACHE", cache)
    monkeypatch.delenv("TORCHDR_TPU_NO_COMPILE_CACHE", raising=False)
    jax.config.update("jax_compilation_cache_dir", None)
    from torchdr_tpu import PCA

    PCA(n_components=2)
    assert jax.config.jax_compilation_cache_dir == cache
