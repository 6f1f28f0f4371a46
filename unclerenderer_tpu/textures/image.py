"""Texture loading dispatch, procedural defaults, mip generation, cache.

Equivalent of ``Source/Render/TextureLoader.*``: DDS + PNG (+JPG) loading with
a global path-keyed cache (``TextureLoader.cpp:66-67``), the procedural
default grid and solid-color textures (``:497-744``), and LoadOrDefault /
LoadOrSolidColor fallback semantics (``:74-135``).

All textures land as float32 linear RGBA with a full mip chain (the GPU's
sampler + sRGB views become explicit host conversion).
"""

from __future__ import annotations

import threading
from pathlib import Path

import numpy as np

from ..core.logging import log_error, log_warning
from ..core.paths import resolve_path_case_insensitive
from ..mathlib import srgb_to_linear
from .dds import load_dds
from .png import load_png


def generate_mips(base: np.ndarray) -> list[np.ndarray]:
    """Full mip chain by 2x2 box filter (matches D3D's default mip generation
    closely enough for parity at bilinear sampling tolerances)."""
    mips = [base.astype(np.float32)]
    cur = mips[0]
    while cur.shape[0] > 1 or cur.shape[1] > 1:
        h, w = cur.shape[:2]
        nh, nw = max(1, h // 2), max(1, w // 2)
        # handle odd sizes by trimming (reference assets are power-of-two)
        trimmed = cur[: nh * 2 if h > 1 else 1, : nw * 2 if w > 1 else 1]
        if h > 1 and w > 1:
            cur = trimmed.reshape(nh, 2, nw, 2, -1).mean(axis=(1, 3))
        elif h > 1:
            cur = trimmed.reshape(nh, 2, 1, -1).mean(axis=1).reshape(nh, 1, -1)
        else:
            cur = trimmed.reshape(1, nw, 2, -1).mean(axis=2)
        mips.append(cur.astype(np.float32))
    return mips


def default_grid_texture(size: int = 256, cells: int = 8) -> np.ndarray:
    """Checkerboard default (``FTextureLoader::CreateDefaultGridTexture``)."""
    yy, xx = np.mgrid[0:size, 0:size]
    cell = size // cells
    checker = ((xx // cell) + (yy // cell)) % 2
    light = np.array([200, 200, 200, 255], np.float32) / 255.0
    dark = np.array([80, 80, 80, 255], np.float32) / 255.0
    img = np.where(checker[..., None] == 0, light, dark).astype(np.float32)
    return img


def solid_color_texture(rgba, size: int = 4) -> np.ndarray:
    c = np.asarray(rgba, np.float32).reshape(1, 1, 4)
    return np.broadcast_to(c, (size, size, 4)).copy()


def load_image(path: str | Path, srgb: bool = False) -> list[np.ndarray] | None:
    """Load any supported image -> list of float32 linear RGBA mips, or None.

    DDS files keep their baked mip chain; PNG/JPG get a generated chain
    (reference: DDS full chain ``TextureLoader.cpp:178-363``, stb 1 mip
    ``:365-495`` -- we improve on the 1-mip PNG path since minification
    without mips aliases badly in a software sampler).
    """
    p = resolve_path_case_insensitive(Path(path))
    suffix = p.suffix.lower()
    if suffix == ".dds":
        dds = load_dds(p)
        if dds is None:
            return None
        face = dds.mips[0]
        mips = []
        for level in face:
            if level.dtype == np.uint8:
                f = level.astype(np.float32) / 255.0
            else:
                f = level.astype(np.float32)
            if srgb and not dds.is_hdr:
                f = np.concatenate([srgb_to_linear(f[..., :3]), f[..., 3:4]], axis=-1)
            mips.append(f)
        # Extend a partial chain down to 1x1 for uniform sampling math.
        if mips[-1].shape[0] > 1 or mips[-1].shape[1] > 1:
            mips = mips[:-1] + generate_mips(mips[-1])
        return mips
    if suffix == ".png":
        img = load_png(p)
        if img is None:
            return None
        f = img.astype(np.float32) / 255.0
        if srgb:
            f = np.concatenate([srgb_to_linear(f[..., :3]), f[..., 3:4]], axis=-1)
        return generate_mips(f)
    if suffix in (".jpg", ".jpeg"):
        try:
            from PIL import Image

            img = np.asarray(Image.open(p).convert("RGBA"), np.uint8)
        except ImportError:
            log_error(f"JPEG decode requires PIL: {path}")
            return None
        except OSError as e:
            log_error(f"failed to read JPEG {path}: {e}")
            return None
        f = img.astype(np.float32) / 255.0
        if srgb:
            f = np.concatenate([srgb_to_linear(f[..., :3]), f[..., 3:4]], axis=-1)
        return generate_mips(f)
    log_error(f"unsupported texture format: {path}")
    return None


class TextureCache:
    """Path-keyed cache with LoadOrDefault / LoadOrSolidColor semantics."""

    def __init__(self) -> None:
        self._cache: dict[str, list[np.ndarray]] = {}
        self._lock = threading.Lock()

    def _key(self, path: str, srgb: bool) -> str:
        return f"{path}|srgb" if srgb else str(path)

    def load_or_default(self, path: str, srgb: bool = False) -> list[np.ndarray]:
        key = self._key(path, srgb)
        with self._lock:
            if key in self._cache:
                return self._cache[key]
        mips = load_image(path, srgb=srgb) if path else None
        if mips is None:
            if path:
                log_warning(f"texture load failed, using default grid: {path}")
            grid = default_grid_texture()
            if srgb:
                grid = np.concatenate(
                    [srgb_to_linear(grid[..., :3]), grid[..., 3:4]], axis=-1
                )
            mips = generate_mips(grid)
        with self._lock:
            self._cache[key] = mips
        return mips

    def load_or_solid(self, path: str, rgba, srgb: bool = False) -> list[np.ndarray]:
        key = self._key(path, srgb)
        with self._lock:
            if key in self._cache:
                return self._cache[key]
        mips = load_image(path, srgb=srgb) if path else None
        if mips is None:
            mips = generate_mips(solid_color_texture(rgba))
        with self._lock:
            self._cache[key] = mips
        return mips
