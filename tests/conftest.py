"""Test configuration: run JAX on CPU with 8 virtual devices so the suite is
hermetic (no TPU needed) and multi-chip sharding is exercised on a host mesh.
"""

import os

# Must run before any backend initialization. The environment pre-registers
# an "axon" TPU platform via sitecustomize and pins JAX_PLATFORMS=axon, so
# the env var alone is not enough -- use the config API too.
os.environ["JAX_PLATFORMS"] = "cpu"
# hermetic but deduplicated: tests never touch the user-level built-scene
# cache; instead they share a FRESH per-run cache dir so the expensive
# asset pipelines (pica: ~90 s of 1-core decode+fuse+pack) run once per
# suite instead of once per test.  Cache roundtrips are bit-exact
# (tests/test_scenecache.py::test_roundtrip_bit_exact); tests that
# exercise the cache machinery itself still set their own dir via
# monkeypatch.
_scene_cache_to_clean = None
if "UNCLERENDERER_SCENE_CACHE" not in os.environ:
    import tempfile as _tempfile

    _scene_cache_to_clean = _tempfile.mkdtemp(prefix="uncle_test_scenecache_")
    os.environ["UNCLERENDERER_SCENE_CACHE"] = _scene_cache_to_clean


def pytest_sessionfinish(session, exitstatus):
    # entries are multi-GB (pica ~3.5 GB); never leak them across runs --
    # a fresh dir per run also guarantees no stale-entry false greens
    if _scene_cache_to_clean:
        import shutil

        shutil.rmtree(_scene_cache_to_clean, ignore_errors=True)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

# warm reruns skip XLA:CPU compiles entirely (same cache the Renderer uses;
# keyed on HLO + backend + machine, so TPU/CPU entries never collide)
from unclerenderer_tpu.core.jaxcache import enable_persistent_cache

enable_persistent_cache()

import pathlib

import pytest

REFERENCE_ROOT = pathlib.Path("/root/reference")


@pytest.fixture(scope="session")
def reference_assets():
    assets = REFERENCE_ROOT / "Assets"
    if not assets.is_dir():
        pytest.skip("reference assets not available")
    return assets
