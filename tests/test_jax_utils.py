"""utils/jax_utils: platform-env honoring (the CPU-subprocess contract the
fixture CLI regressions depend on) and compile-cache setup."""

import os

import jax
import pytest

from ref_geotransformer_tpu.utils.jax_utils import honor_platform_env, setup_compilation_cache


def test_honor_platform_env_applies_env(monkeypatch):
    # conftest already pinned cpu; simulate a site plugin having pinned a
    # different list, then check the env wins again
    before = jax.config.jax_platforms
    try:
        jax.config.update("jax_platforms", "fakeplug,cpu")
        monkeypatch.setenv("JAX_PLATFORMS", "cpu")
        honor_platform_env()
        assert jax.config.jax_platforms == "cpu"
    finally:
        jax.config.update("jax_platforms", before)


def test_honor_platform_env_noop_without_env(monkeypatch):
    before = jax.config.jax_platforms
    try:
        jax.config.update("jax_platforms", "fakeplug,cpu")
        monkeypatch.delenv("JAX_PLATFORMS", raising=False)
        honor_platform_env()
        assert jax.config.jax_platforms == "fakeplug,cpu"
    finally:
        jax.config.update("jax_platforms", before)


def test_setup_compilation_cache_env_dir(monkeypatch, tmp_path):
    before = jax.config.jax_compilation_cache_dir
    cache_dir = str(tmp_path / "xla")
    monkeypatch.setenv("REF_GT_COMPILE_CACHE", cache_dir)
    try:
        path = setup_compilation_cache()
        assert path == cache_dir
        assert os.path.isdir(cache_dir)
    finally:
        jax.config.update("jax_compilation_cache_dir", before)
