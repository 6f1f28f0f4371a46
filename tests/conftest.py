"""Test configuration: run JAX on CPU with 8 virtual devices so the suite is
hermetic (no TPU needed) and multi-chip sharding is exercised on a host mesh.
"""

import os

# Must run before any backend initialization. The environment pre-registers
# an "axon" TPU platform via sitecustomize and pins JAX_PLATFORMS=axon, so
# the env var alone is not enough -- use the config API too.
os.environ["JAX_PLATFORMS"] = "cpu"
# hermetic: never read/write the user-level built-scene cache from tests
# (tests that exercise the cache set their own dir via monkeypatch)
os.environ.setdefault("UNCLERENDERER_SCENE_CACHE", "")
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
