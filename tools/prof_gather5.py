"""Round-5 gather-law rows: the exact hot-table shapes of the remaining
frame cost, plus quantized-dtype candidates.

Hypotheses this decides (BENCHLOG round-5):
 1. MaterialTap (44 ms in-frame): the packed-tri combined atlas is
    786432 rows x 256 bf16 (512 B/row).  Is a u8 atlas (256 B/row --
    the reference's own RGBA8/BC storage precision) measurably faster?
    Is the table-size term at 786k rows significant vs 262k?
 2. ShadowPCF (34 ms): the 4096^2 superblock table is 262144 rows x
    128 f32.  Does a u16 fixed-point depth table (ceil-quantized; bias
    analysis in ops/shadow.py round-5 notes) gather ~1.6x faster like
    bf16 did in the round-4 law?
 3. select9 kernel: per-lane-dtype cost of the Pallas 3x3 lane select.

    python tools/prof_gather5.py
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from unclerenderer_tpu.core.jaxcache import (
    enable_persistent_cache,
    pin_platform_from_env,
)

pin_platform_from_env()
enable_persistent_cache()

from tools.timing import timed_scan

N_REQ = 2_073_600  # exactly one request per 1080p pixel


def probe(rows: int, lanes: int, dtype, note=""):
    rng = np.random.default_rng(11)
    if jnp.dtype(dtype).kind in "ui":
        table = jnp.asarray(
            rng.integers(0, 255, (rows, lanes), dtype=np.int64), dtype
        )
    else:
        table = jnp.asarray(rng.random((rows, lanes), np.float32), dtype)
    idx = jnp.asarray(rng.integers(0, rows, N_REQ, dtype=np.int64), jnp.int32)

    def gather(t, i):
        return t[i].astype(jnp.float32).sum(axis=-1)

    bytes_per_row = lanes * jnp.dtype(dtype).itemsize
    ms = timed_scan(
        gather, table, idx, iters=4,
        label=f"{rows:>8} rows x {lanes:>3} {jnp.dtype(dtype).name:<9}"
              f" ({bytes_per_row:>4} B/row) {note}",
    )
    return ms


def main():
    print("device:", jax.devices()[0], flush=True)

    # --- 1. MaterialTap table shapes ---
    for rows, lanes, dtype, note in (
        (786432, 256, jnp.bfloat16, "<- current material tri atlas"),
        (786432, 256, jnp.uint8, "<- u8 atlas candidate"),
        (786432, 128, jnp.bfloat16, "(half-lane reference point)"),
        (786432, 128, jnp.float32, ""),
        (262144, 256, jnp.bfloat16, "(table-size term)"),
        (262144, 256, jnp.uint8, ""),
    ):
        probe(rows, lanes, dtype, note)

    # --- 2. PCF superblock table shapes (4096^2 -> 262144 rows) ---
    for rows, lanes, dtype, note in (
        (262144, 128, jnp.float32, "<- current PCF table"),
        (262144, 128, jnp.uint16, "<- u16 quantized candidate"),
        (262144, 128, jnp.bfloat16, ""),
        (1048576, 64, jnp.float32, "(4x4-core alt: 1M rows)"),
        (1048576, 64, jnp.uint16, ""),
    ):
        probe(rows, lanes, dtype, note)

    # --- 3. select9 kernel dtype cost (gather excluded) ---
    from unclerenderer_tpu.ops.shadow import _select9

    rng = np.random.default_rng(3)
    base = jnp.asarray(rng.integers(0, 80, N_REQ, dtype=np.int64), jnp.int32)
    deltas = tuple(dy * 10 + dx for dy in range(3) for dx in range(3))
    rows_f32 = jnp.asarray(rng.random((N_REQ, 128), np.float32))
    timed_scan(lambda r, b: _select9(r, b, deltas).sum(axis=-1),
               rows_f32, base, iters=4, label="select9 kernel f32 128-lane")

    # coherent-index variant of the PCF gather: consecutive pixels hit
    # nearby shadow blocks in practice -- measure whether locality changes
    # the law (it decides if sorting requests could ever pay)
    pcf = jnp.asarray(rng.random((262144, 128), np.float32))
    lin = np.arange(N_REQ, dtype=np.int64) * 262144 // N_REQ
    jitter = rng.integers(-512, 512, N_REQ)
    coh = jnp.asarray(np.clip(lin + jitter, 0, 262143), jnp.int32)
    timed_scan(lambda t, i: t[i].sum(axis=-1), pcf, coh, iters=4,
               label="  pcf 262144 x128 f32 COHERENT idx")


if __name__ == "__main__":
    main()
