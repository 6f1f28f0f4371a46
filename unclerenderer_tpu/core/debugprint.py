"""Debug text overlay: the GPU-printf analog.

The reference implements a device-side printf (shaders append glyphs into a
buffer; a draw pass rasterizes them with an stb_truetype atlas --
``Renderer.cpp:474-884``, ``GpuDebugPrint*.hlsl``).  Device-side prints here
are ``jax.debug.print`` / ``pl.debug_print``; for the *on-image* overlay
(culling counters etc.) this module rasterizes text into the framebuffer
with a built-in 5x7 bitmap font -- same user-visible result, host-composited.
"""

from __future__ import annotations

import numpy as np

# 5x7 font for the printable stats characters (columns LSB = top row).
_GLYPHS = {}


def _g(ch, rows):
    _GLYPHS[ch] = np.array(
        [[1 if c == "#" else 0 for c in row.ljust(5)] for row in rows], np.uint8
    )


_g("0", ["0####", "#...#", "#..##", "#.#.#", "##..#", "#...#", "####0"])
_g("1", ["..#..", ".##..", "..#..", "..#..", "..#..", "..#..", ".###."])
_g("2", [".###.", "#...#", "....#", "...#.", "..#..", ".#...", "#####"])
_g("3", [".###.", "#...#", "....#", "..##.", "....#", "#...#", ".###."])
_g("4", ["...#.", "..##.", ".#.#.", "#..#.", "#####", "...#.", "...#."])
_g("5", ["#####", "#....", "####.", "....#", "....#", "#...#", ".###."])
_g("6", [".###.", "#....", "####.", "#...#", "#...#", "#...#", ".###."])
_g("7", ["#####", "....#", "...#.", "..#..", ".#...", ".#...", ".#..."])
_g("8", [".###.", "#...#", ".###.", "#...#", "#...#", "#...#", ".###."])
_g("9", [".###.", "#...#", "#...#", ".####", "....#", "....#", ".###."])
_g(":", [".....", "..#..", ".....", ".....", "..#..", ".....", "....."])
_g(".", [".....", ".....", ".....", ".....", ".....", "..#..", "..#.."])
_g("/", ["....#", "...#.", "...#.", "..#..", ".#...", ".#...", "#...."])
_g("-", [".....", ".....", ".....", "#####", ".....", ".....", "....."])
_g(" ", [".....", ".....", ".....", ".....", ".....", ".....", "....."])
for ch, rows in {
    "A": [".###.", "#...#", "#...#", "#####", "#...#", "#...#", "#...#"],
    "C": [".###.", "#...#", "#....", "#....", "#....", "#...#", ".###."],
    "D": ["####.", "#...#", "#...#", "#...#", "#...#", "#...#", "####."],
    "E": ["#####", "#....", "####.", "#....", "#....", "#....", "#####"],
    "F": ["#####", "#....", "####.", "#....", "#....", "#....", "#...."],
    "G": [".###.", "#....", "#....", "#.###", "#...#", "#...#", ".###."],
    "I": [".###.", "..#..", "..#..", "..#..", "..#..", "..#..", ".###."],
    "L": ["#....", "#....", "#....", "#....", "#....", "#....", "#####"],
    "M": ["#...#", "##.##", "#.#.#", "#...#", "#...#", "#...#", "#...#"],
    "N": ["#...#", "##..#", "#.#.#", "#..##", "#...#", "#...#", "#...#"],
    "O": [".###.", "#...#", "#...#", "#...#", "#...#", "#...#", ".###."],
    "P": ["####.", "#...#", "#...#", "####.", "#....", "#....", "#...."],
    "R": ["####.", "#...#", "#...#", "####.", "#.#..", "#..#.", "#...#"],
    "S": [".####", "#....", ".###.", "....#", "....#", "#...#", ".###."],
    "T": ["#####", "..#..", "..#..", "..#..", "..#..", "..#..", "..#.."],
    "U": ["#...#", "#...#", "#...#", "#...#", "#...#", "#...#", ".###."],
    "V": ["#...#", "#...#", "#...#", "#...#", ".#.#.", ".#.#.", "..#.."],
    "Z": ["#####", "....#", "...#.", "..#..", ".#...", "#....", "#####"],
}.items():
    _g(ch, rows)


def draw_text(image: np.ndarray, x: int, y: int, text: str, color=(1.0, 1.0, 0.2), scale: int = 2) -> np.ndarray:
    """Rasterize text onto an (H, W, 3) float image (in place; returns it)."""
    h, w = image.shape[:2]
    col = np.asarray(color, image.dtype)
    cx = x
    for ch in text.upper():
        glyph = _GLYPHS.get(ch)
        if glyph is None:
            cx += 6 * scale
            continue
        gs = np.repeat(np.repeat(glyph, scale, 0), scale, 1)
        gh, gw = gs.shape
        y1, x1 = min(y + gh, h), min(cx + gw, w)
        if y1 > y and x1 > cx:
            region = image[y : y1, cx : x1]
            mask = gs[: y1 - y, : x1 - cx, None].astype(bool)
            region[...] = np.where(mask, col, region)
        cx += 6 * scale
    return image


def stats_overlay(image: np.ndarray, stats: dict, origin=(8, 8)) -> np.ndarray:
    """Composite the reference's debug-print stats block (FRUSTUM/OCCLUDE
    counters, model counts -- GpuDebugPrintStats.hlsl:33-47) onto a frame."""
    x, y = origin
    lines = [
        f"MODELS: {stats.get('models_visible', 0)}/{stats.get('models_total', 0)}",
        f"CULLED: {stats.get('models_culled', 0)}",
        f"TRIS: {stats.get('triangles_total', 0)}",
    ]
    if "exposure_ev" in stats:
        lines.append(f"EV: {stats['exposure_ev']:.2f}")
    out = np.array(image, copy=True)
    for i, line in enumerate(lines):
        draw_text(out, x, y + i * 18, line)
    return out
