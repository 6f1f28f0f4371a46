"""ctypes binding to the native C++ asset-pipeline helpers.

Builds from ``native/unclerenderer_native.cpp`` via ``make -C native``.  Every
entry point has a pure-Python fallback, so the package works without the
shared library (just slower at asset load).
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

from ..core.logging import log_warning

_REPO_ROOT = Path(__file__).resolve().parents[2]
_LIB_PATH = _REPO_ROOT / "native" / "libunclerenderer_native.so"
_lib = None
_lib_checked = False


def _try_build() -> None:
    makefile = _REPO_ROOT / "native" / "Makefile"
    if not makefile.is_file():
        return
    try:
        subprocess.run(
            ["make", "-C", str(makefile.parent)],
            capture_output=True,
            timeout=120,
            check=False,
        )
    except (OSError, subprocess.TimeoutExpired):
        pass


def get_native():
    """Returns the loaded ctypes library or None."""
    global _lib, _lib_checked
    if _lib_checked:
        return _lib
    _lib_checked = True
    # make is a ~50ms no-op when the .so is fresh, and rebuilds it when a
    # source file is newer (e.g. a checkout carrying a stale prebuilt lib
    # that predates newly added entry points)
    _try_build()
    if not _LIB_PATH.is_file():
        log_warning("native library not built; using pure-Python asset decoders")
        return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
        lib.png_unfilter.restype = ctypes.c_int
        lib.png_unfilter.argtypes = [
            ctypes.c_void_p,
            ctypes.c_void_p,
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_int64,
        ]
        lib.bc_decode.restype = ctypes.c_int
        lib.bc_decode.argtypes = [
            ctypes.c_void_p,
            ctypes.c_void_p,
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_int,
        ]
        _lib = lib
    except OSError as e:
        log_warning(f"failed to load native library: {e}")
        _lib = None
    return _lib


def png_unfilter(raw: bytes, height: int, stride: int, bpp: int) -> np.ndarray | None:
    """Unfilter PNG scanlines; returns (height*stride,) u8 or None if no lib."""
    lib = get_native()
    if lib is None:
        return None
    src = np.frombuffer(raw, dtype=np.uint8)
    out = np.empty(height * stride, dtype=np.uint8)
    rc = lib.png_unfilter(
        src.ctypes.data_as(ctypes.c_void_p),
        out.ctypes.data_as(ctypes.c_void_p),
        height,
        stride,
        bpp,
    )
    if rc != 0:
        return None
    return out


def bc67_decode(data: bytes, width: int, height: int, kind: int) -> np.ndarray | None:
    """Decode BC6H (kind 6 UF16 / 7 SF16 -> f32) or BC7 (kind 8 -> u8).
    Returns None when the native library lacks the entry point."""
    lib = get_native()
    if lib is None or not hasattr(lib, "bc67_decode"):
        return None
    src = np.frombuffer(data, dtype=np.uint8)
    if kind in (6, 7):
        out = np.empty((height, width, 4), dtype=np.float32)
    else:
        out = np.empty((height, width, 4), dtype=np.uint8)
    lib.bc67_decode.restype = ctypes.c_int
    lib.bc67_decode.argtypes = [
        ctypes.c_void_p,
        ctypes.c_void_p,
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.c_int,
    ]
    rc = lib.bc67_decode(
        src.ctypes.data_as(ctypes.c_void_p),
        out.ctypes.data_as(ctypes.c_void_p),
        width,
        height,
        kind,
    )
    if rc != 0:
        return None
    return out


def bc_decode(data: bytes, width: int, height: int, kind: int) -> np.ndarray | None:
    """Decode a BC1-5 mip to (height, width, 4) u8 or None if no lib."""
    lib = get_native()
    if lib is None:
        return None
    src = np.frombuffer(data, dtype=np.uint8)
    out = np.empty((height, width, 4), dtype=np.uint8)
    rc = lib.bc_decode(
        src.ctypes.data_as(ctypes.c_void_p),
        out.ctypes.data_as(ctypes.c_void_p),
        width,
        height,
        kind,
    )
    if rc != 0:
        return None
    return out
