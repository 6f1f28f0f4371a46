"""Device-side debug-print overlay -- the GPU printf's draw pass, in-frame.

The reference's shaders append glyph records into a device buffer and a
final pass rasterizes them onto the backbuffer with the stb_truetype atlas
(``GpuDebugPrint.hlsl:42-124``, ``Renderer.cpp:824-884``).  The TPU analog
here: a baked glyph atlas lives in device memory, traced counter values
decompose into digit glyph indices INSIDE the jitted frame, one tiny row
gather pulls the glyph bitmaps, and the strip alpha-blends onto the color
image.  No host round trip -- ``deferred_frame`` returns the frame with the
stats text already in it (RenderSettings.gpu_debug_print).

The host-side compositing path (core/debugprint.py) remains for overlays
that are host concepts anyway (pick selection box, timing tables).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

# glyph cell geometry (5x7 bitmap font from core/debugprint, padded to a
# 6-column advance like its draw_text)
_CELL_W = 6
_CELL_H = 8

_atlas_cache: dict = {}


def bake_overlay_font(scale: int = 2):
    """(atlas (n_glyphs, 8*scale, 6*scale) f32, char -> glyph index map).

    Digits are contiguous ('0'..'9' sort adjacently), so a traced digit d
    maps to ``char_index['0'] + d`` without a lookup table."""
    if scale in _atlas_cache:
        return _atlas_cache[scale]
    from ..core.debugprint import _GLYPHS

    chars = sorted(_GLYPHS)
    cells = []
    for c in chars:
        cell = np.zeros((_CELL_H, _CELL_W), np.float32)
        cell[:7, :5] = _GLYPHS[c]
        cells.append(np.repeat(np.repeat(cell, scale, 0), scale, 1))
    atlas = np.stack(cells)
    char_index = {c: i for i, c in enumerate(chars)}
    _atlas_cache[scale] = (atlas, char_index)
    return atlas, char_index


def text_indices(text: str, char_index: dict) -> np.ndarray:
    """Static text -> (N,) glyph indices (unknown chars render as space)."""
    space = char_index[" "]
    return np.array(
        [char_index.get(c, space) for c in text.upper()], np.int32
    )


def int_indices(value, width: int, char_index: dict):
    """Traced non-negative i32 -> (width,) glyph indices, right-aligned
    with leading zeros blanked (like printf %*d)."""
    v = jnp.maximum(value.astype(jnp.int32), 0)
    d0 = np.int32(char_index["0"])
    space = np.int32(char_index[" "])
    idx = []
    for k in reversed(range(width)):
        p = np.int32(10**k)
        digit = (v // p) % 10
        blank = (k > 0) & (v < p)
        idx.append(jnp.where(blank, space, d0 + digit))
    return jnp.stack(idx)


def fixed_indices(value, int_width: int, frac: int, char_index: dict):
    """Traced float -> glyph indices "[-]iii.ff" (sign cell + int digits +
    point + frac digits)."""
    neg = value < 0
    scaled = jnp.round(jnp.abs(value) * (10**frac)).astype(jnp.int32)
    ip = scaled // (10**frac)
    fp = scaled % (10**frac)
    sign = jnp.where(
        neg, np.int32(char_index["-"]), np.int32(char_index[" "])
    )[None]
    d0 = np.int32(char_index["0"])
    fdigits = [
        d0 + (fp // np.int32(10**k)) % 10 for k in reversed(range(frac))
    ]
    return jnp.concatenate(
        [sign, int_indices(ip, int_width, char_index),
         jnp.asarray([char_index["."]], jnp.int32),
         jnp.stack(fdigits)]
    )


def blend_text_line(color, atlas, idx, x0: int, y0: int, rgb=(1.0, 1.0, 0.2)):
    """Alpha-blend one glyph strip onto an (H, W, 3) image at a static
    origin.  Out-of-bounds lines are clipped (dropped) like the reference's
    screen-bounds test on glyph quads."""
    h, w = color.shape[:2]
    n = int(idx.shape[0])
    gh, gw = int(atlas.shape[1]), int(atlas.shape[2])
    if y0 + gh > h or x0 + n * gw > w or y0 < 0 or x0 < 0:
        return color
    glyphs = atlas[idx]  # (N, gh, gw) -- tiny gather, N ~ tens
    strip = jnp.transpose(glyphs, (1, 0, 2)).reshape(gh, n * gw)
    a = strip[..., None].astype(color.dtype)
    col = jnp.asarray(rgb, color.dtype)
    region = color[y0 : y0 + gh, x0 : x0 + n * gw]
    return color.at[y0 : y0 + gh, x0 : x0 + n * gw].set(
        region * (1.0 - a) + col * a
    )


def device_stats_overlay(
    color,
    *,
    models_visible,
    models_total: int,
    frustum_culled,
    hzb_occluded,
    exposure_ev,
    scale: int = 2,
    origin=(8, 8),
):
    """Rasterize the GpuDebugPrintStats block onto the frame IN-TRACE.

    Mirrors the host stats_overlay lines (MODELS/CULLED counters + EV;
    ``GpuDebugPrintStats.hlsl:33-47``) but every number is a traced device
    scalar -- the returned image carries the overlay with no host
    compositing."""
    atlas_np, cmap = bake_overlay_font(scale)
    atlas = jnp.asarray(atlas_np)
    x0, y0 = origin
    dy = _CELL_H * scale + 2
    tot = text_indices(f"/{models_total}", cmap)
    width = max(len(str(models_total)), 1)

    line1 = jnp.concatenate([
        jnp.asarray(text_indices("MODELS: ", cmap)),
        int_indices(models_visible, width, cmap),
        jnp.asarray(tot),
    ])
    line2 = jnp.concatenate([
        jnp.asarray(text_indices("CULLED: ", cmap)),
        int_indices(frustum_culled, width, cmap),
    ])
    line3 = jnp.concatenate([
        jnp.asarray(text_indices("OCCL: ", cmap)),
        int_indices(hzb_occluded, width, cmap),
    ])
    line4 = jnp.concatenate([
        jnp.asarray(text_indices("EV: ", cmap)),
        fixed_indices(exposure_ev, 2, 2, cmap),
    ])
    for i, line in enumerate((line1, line2, line3, line4)):
        color = blend_text_line(color, atlas, line, x0, y0 + i * dy)
    return color
