"""Built-scene disk cache (core/scenecache.py): hit is bit-exact, asset
touches invalidate, disabling works, eviction bounds the directory.

The cached product is the analog of the reference's cold-start asset
pipeline output (``Application.cpp:148-330``): SceneData + every DeviceScene
array, validated against (size, mtime) of every consumed asset file.
"""

import dataclasses
import os

import numpy as np
import pytest

from unclerenderer_tpu.core import scenecache


@pytest.fixture
def cache_env(tmp_path, monkeypatch):
    monkeypatch.setenv("UNCLERENDERER_SCENE_CACHE", str(tmp_path / "sc"))
    return tmp_path / "sc"


def _duck(reference_assets):
    scene = reference_assets / "Scenes" / "Duck.json"
    if not scene.is_file():
        pytest.skip("Duck scene not available")
    return scene


def _assert_same_device_scene(a, b):
    for f in dataclasses.fields(a):
        va, vb = getattr(a, f.name), getattr(b, f.name)
        if va is None:
            assert vb is None
            continue
        assert va.dtype == vb.dtype and va.shape == vb.shape, f.name
        assert np.array_equal(np.asarray(va), np.asarray(vb)), f.name


def test_roundtrip_bit_exact(reference_assets, cache_env):
    from unclerenderer_tpu.render.renderer import Renderer

    scene = _duck(reference_assets)
    r1 = Renderer(scene)
    assert list(cache_env.glob("*.arrays")), "store did not write an entry"
    r2 = Renderer(scene)
    _assert_same_device_scene(r1.device_scene, r2.device_scene)
    assert r1.settings == r2.settings
    assert r1.env_mip_count == r2.env_mip_count
    assert np.array_equal(r1.scene_data.position, r2.scene_data.position)
    assert r1.texture_substitutions == r2.texture_substitutions


def test_asset_touch_invalidates(reference_assets, cache_env):
    from unclerenderer_tpu.render.renderer import Renderer

    scene = _duck(reference_assets)
    r1 = Renderer(scene)
    key = r1._scene_cache_key
    assert scenecache.load(key) is not None
    # bump the mtime of a consumed texture -> stale
    import json

    meta = json.loads((cache_env / f"{key}.meta.json").read_text())
    files = [f for f, _sig in meta["files"]]
    assert files, "freshness list is empty"
    os.utime(files[0])
    assert scenecache.load(key) is None


def test_settings_change_new_key(reference_assets, cache_env):
    scene = _duck(reference_assets)
    mf = scenecache.model_files_of(scene)
    k1 = scenecache.scene_key(scene, mf, (True, False, "x"))
    k2 = scenecache.scene_key(scene, mf, (True, True, "x"))
    assert k1 != k2


def test_disabled_by_empty_env(monkeypatch):
    monkeypatch.setenv("UNCLERENDERER_SCENE_CACHE", "")
    assert scenecache.cache_dir() is None
    assert scenecache.load("deadbeef") is None


def test_eviction_bounds_entries(cache_env, monkeypatch):
    import time

    cache_env.mkdir(parents=True, exist_ok=True)
    monkeypatch.setattr(scenecache, "_MAX_ENTRIES", 2)
    for i in range(4):
        (cache_env / f"k{i}.arrays").mkdir()
        (cache_env / f"k{i}.arrays" / "a.npy").write_bytes(b"x")
        for suffix in (".meta.json", ".scene.pkl"):
            (cache_env / f"k{i}{suffix}").write_bytes(b"x")
        t = time.time() - 100 + i
        os.utime(cache_env / f"k{i}.meta.json", (t, t))
    scenecache._evict(cache_env)
    kept = sorted(p.name for p in cache_env.glob("*.arrays"))
    assert kept == ["k2.arrays", "k3.arrays"]
    assert not (cache_env / "k0.meta.json").exists()
