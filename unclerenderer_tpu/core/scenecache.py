"""On-disk cache of the BUILT device scene (VERDICT r3 next-step #5).

The reference cold-starts in seconds because its scene build is a straight
file->GPU upload (``Application.cpp:148-330``); here the expensive part is
host-side assembly -- glTF decode, tangent generation, texture decode, the
combined-material fuse and the pyramid atlas packs (~14 s for pica on this
box).  This module persists the finished product -- ``SceneData`` plus every
``DeviceScene`` host array -- keyed by the scene description and validated
against the (size, mtime) of every asset file the build consumed, so a warm
start is one .npz read + device upload instead of the whole asset pipeline.

Layout per entry (under ``~/.cache/unclerenderer_scenes`` or
``$UNCLERENDERER_SCENE_CACHE``; empty env var disables the cache):

* ``<key>.arrays/<name>.npy`` -- one raw .npy per DeviceScene array
  (bfloat16 stored as uint16 views).  Raw .npy + ``mmap_mode="r"`` makes a
  hit O(metadata): the bytes stream straight from page cache/disk during
  the device upload instead of through npz's zip+CRC layer (measured 3.5
  GB in 28 s as one .npz vs ~0 s mapped -- the upload pays the read
  either way).
* ``<key>.meta.json`` -- scalar results + the consumed-file freshness list
* ``<key>.scene.pkl`` -- pickled SceneData (own cache dir, own writes only)

The key hashes the scene JSON bytes, the model files' (path, size, mtime),
the atlas-layout settings and a format version; the meta freshness list is
re-stat'ed on every load so touching any texture invalidates the entry.
"""

from __future__ import annotations

import hashlib
import json
import os
import pickle
import time
from pathlib import Path

import numpy as np

from .logging import log_info, log_warning

FORMAT_VERSION = 3  # v3: raw per-array .npy dir (was one .npz)
_MAX_ENTRIES = 6  # evict oldest beyond this (atlases are hundreds of MB)


def cache_dir() -> Path | None:
    env = os.environ.get("UNCLERENDERER_SCENE_CACHE")
    if env == "":
        return None  # explicitly disabled
    return Path(env) if env else Path.home() / ".cache" / "unclerenderer_scenes"


def _stat_sig(path: str) -> tuple:
    st = os.stat(path)
    return (st.st_size, st.st_mtime_ns)


def scene_key(
    scene_path: Path, model_files: list[str], settings_sig: tuple
) -> str:
    """Hash of everything known BEFORE the build runs: the scene JSON bytes,
    the model geometry files' stats, and the atlas-layout settings."""
    h = hashlib.sha256()
    h.update(f"v{FORMAT_VERSION}|{settings_sig}".encode())
    try:
        h.update(Path(scene_path).read_bytes())
    except OSError:
        h.update(str(scene_path).encode())
    for f in sorted(set(model_files)):
        try:
            h.update(f"{f}|{_stat_sig(f)}".encode())
        except OSError:
            h.update(f"{f}|missing".encode())
    return h.hexdigest()[:32]


def model_files_of(scene_path: Path) -> list[str]:
    """Geometry freshness set: each model file named by the scene JSON plus
    any .bin buffers next to it (glTF external buffers live alongside)."""
    from ..scene.scene_json import load_scene_json

    files: list[str] = []
    try:
        models, _light, _cam = load_scene_json(scene_path)
    except Exception:  # noqa: BLE001 -- key degrades to json-bytes only
        return files
    root = Path(scene_path).parent.parent
    for m in models or []:
        p = Path(m.mesh_path)
        if not p.is_absolute():
            p = root / p
        if p.is_file():
            files.append(str(p))
            files.extend(str(b) for b in sorted(p.parent.glob("*.bin")))
    return files


def load(key: str):
    """Return (scene_data, host_arrays, meta) or None on miss/stale."""
    d = cache_dir()
    if d is None:
        return None
    adir, meta_p, pkl = d / f"{key}.arrays", d / f"{key}.meta.json", d / f"{key}.scene.pkl"
    if not (adir.is_dir() and meta_p.is_file() and pkl.is_file()):
        return None
    try:
        meta = json.loads(meta_p.read_text())
        if meta.get("format") != FORMAT_VERSION:
            return None
        for f, sig in meta["files"]:
            if _stat_sig(f) != tuple(sig):
                return None  # an asset changed since the build
        t0 = time.monotonic()
        arrays = {}
        total = 0
        for name in meta["names"]:
            p = adir / f"{name}.npy"
            total += p.stat().st_size
            a = np.load(p, mmap_mode="r")
            if meta["dtypes"].get(name) == "bfloat16":
                import ml_dtypes

                a = a.view(ml_dtypes.bfloat16)
            arrays[name] = a
        scene_data = pickle.loads(pkl.read_bytes())
        # freshen for LRU eviction
        os.utime(meta_p)
        log_info(
            f"scene cache HIT {key[:12]} "
            f"({total / 1e6:.0f} MB mapped in {time.monotonic() - t0:.2f}s)"
        )
        return scene_data, arrays, meta
    except Exception as e:  # noqa: BLE001 -- any corruption = miss
        log_warning(f"scene cache entry {key[:12]} unreadable ({e!r}); rebuilding")
        return None


def store(
    key: str, scene_data, host_arrays: dict, meta_extra: dict, files: list[str]
) -> None:
    """Persist a finished build.  ``host_arrays`` is the build's host-side
    numpy dict (never device arrays: pulling pica's 3.5 GB back through the
    TPU relay measured 315 s; from host memory the store is disk-bound)."""
    d = cache_dir()
    if d is None:
        return
    try:
        d.mkdir(parents=True, exist_ok=True)
        t0 = time.monotonic()
        arrays, dtypes = {}, {}
        for name, v in host_arrays.items():
            if v is None:
                continue
            a = np.asarray(v)
            if a.dtype.name == "bfloat16":
                dtypes[name] = "bfloat16"
                a = a.view(np.uint16)
            arrays[name] = a
        meta = {
            "format": FORMAT_VERSION,
            "names": sorted(arrays),
            "dtypes": dtypes,
            "files": [[f, list(_stat_sig(f))] for f in sorted(set(files))],
            **meta_extra,
        }
        import shutil

        tmp = d / f"{key}.tmp.{os.getpid()}"
        shutil.rmtree(tmp, ignore_errors=True)
        tmp.mkdir()
        total = 0
        for name, a in arrays.items():
            np.save(tmp / f"{name}.npy", a)
            total += (tmp / f"{name}.npy").stat().st_size
        adir = d / f"{key}.arrays"
        shutil.rmtree(adir, ignore_errors=True)
        tmp.replace(adir)
        (d / f"{key}.scene.pkl").write_bytes(pickle.dumps(scene_data))
        (d / f"{key}.meta.json").write_text(json.dumps(meta))
        log_info(
            f"scene cache STORE {key[:12]} "
            f"({total / 1e6:.0f} MB in {time.monotonic() - t0:.1f}s)"
        )
        _evict(d)
    except Exception as e:  # noqa: BLE001 -- caching must never break a build
        log_warning(f"scene cache store failed ({e!r})")


def _evict(d: Path) -> None:
    import shutil

    entries = sorted(d.glob("*.meta.json"), key=lambda p: p.stat().st_mtime)
    for meta_p in entries[:-_MAX_ENTRIES]:
        stem = meta_p.name[: -len(".meta.json")]
        shutil.rmtree(d / f"{stem}.arrays", ignore_errors=True)
        for suffix in (".npz", ".meta.json", ".scene.pkl"):  # .npz: pre-v3
            (d / f"{stem}{suffix}").unlink(missing_ok=True)
