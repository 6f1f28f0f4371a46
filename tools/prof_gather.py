"""On-chip gather-law prober: cost vs (table rows, lanes, dtype).

Answers the open question the round-2 gather law left: is the ~128-lane
fast-path limit in LANES or BYTES?  f32 128-lane rows are 512 B; if the
cliff is bytes, bf16 rows stay fast to 256 lanes -- which would make a
packed-trilinear MATERIAL atlas (16 own + 144 parent bf16 lanes = 320 B)
a single fast gather and trilinear filtering ~free (ARCHITECTURE.md
deviation #1 could then default to parity).

    python tools/prof_gather.py        # full sweep
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

N_REQ = 2_000_000  # one request per 1080p-ish pixel


def probe(rows: int, lanes: int, dtype):
    rng = np.random.default_rng(11)
    table = jnp.asarray(rng.random((rows, lanes), np.float32), dtype)
    idx = jnp.asarray(rng.integers(0, rows, N_REQ, dtype=np.int64), jnp.int32)

    def gather(t, i):
        return t[i].astype(jnp.float32).sum(axis=-1)

    bytes_per_row = lanes * jnp.dtype(dtype).itemsize
    ms = timed_scan(
        gather, table, idx, iters=4,
        label=f"{rows:>8} rows x {lanes:>3} {jnp.dtype(dtype).name:<9}"
              f" ({bytes_per_row:>4} B/row)",
    )
    return ms / N_REQ * 1e6  # ns per request


def main():
    print("device:", jax.devices()[0], flush=True)
    for rows in (65536, 94208, 163840, 262144):
        for lanes, dtype in (
            (128, jnp.float32),   # known fast under ~96k rows
            (160, jnp.float32),   # known always slow (lane > 128)
            (128, jnp.bfloat16),  # 256 B/row
            (160, jnp.bfloat16),  # 320 B/row
            (208, jnp.bfloat16),  # the 16ch packed-tri material row (unpadded)
            (256, jnp.bfloat16),  # 512 B/row == the f32 128-lane byte width
            (320, jnp.bfloat16),  # 640 B/row -- past it
        ):
            probe(rows, lanes, dtype)
    # the production material-tap shape: combined quad atlas, ~0.5M rows.
    # Round-2 stage math implies this runs FASTER than the law's 12-19
    # ns/row slow path (resolve budget doesn't fit otherwise) -- measure it
    # directly, f32 vs bf16.
    for rows in (524288,):
        for lanes, dtype in (
            (64, jnp.float32), (64, jnp.bfloat16), (256, jnp.bfloat16),
        ):
            probe(rows, lanes, dtype)

    # the resolve record gather at the AUTO compaction cap (163840 rows,
    # 128 f32 lanes): plain slow-path f32 vs the bit-exact u16 split pair
    # the production path takes (render/common.py resolve_materials)
    from unclerenderer_tpu.ops.raster import gather_rows_split16

    rng = np.random.default_rng(7)
    rec = jnp.asarray(rng.random((163840, 128), np.float32), jnp.float32)
    idx = jnp.asarray(rng.integers(0, 163840, N_REQ, dtype=np.int64), jnp.int32)
    timed_scan(lambda t, i: t[i].sum(axis=-1), rec, idx, iters=4,
               label="  resolve cap=163840 x128 f32 PLAIN gather")
    timed_scan(lambda t, i: gather_rows_split16(t, i).sum(axis=-1), rec, idx,
               iters=4, label="  resolve cap=163840 x128 f32 SPLIT16")

    # row-split alternative: N fast-path part gathers with per-part clamped
    # indices (ops/raster.py gather_rows_parts) -- the candidate replacement
    # for split16 everywhere past the f32 cliff
    from unclerenderer_tpu.ops.raster import gather_rows_parts

    timed_scan(lambda t, i: gather_rows_parts(t, i).sum(axis=-1), rec, idx,
               iters=4, label="  resolve cap=163840 x128 f32 ROW-SPLIT x2")
    rec16 = jnp.asarray(rng.random((163840, 16), np.float32), jnp.float32)
    timed_scan(lambda t, i: t[i].sum(axis=-1), rec16, idx, iters=4,
               label="  coef table 163840 x16 f32 PLAIN gather")
    timed_scan(lambda t, i: gather_rows_parts(t, i).sum(axis=-1), rec16, idx,
               iters=4, label="  coef table 163840 x16 f32 ROW-SPLIT x2")
    # the 4096^2 PCF superblock table shape: 131072 rows x 256 u16 lanes
    # (hi/lo split pair) vs row-split f32 256-lane parts
    pcf = jnp.asarray(rng.random((131072, 256), np.float32), jnp.float32)
    idx_p = jnp.asarray(
        rng.integers(0, 131072, N_REQ, dtype=np.int64), jnp.int32)
    timed_scan(lambda t, i: gather_rows_split16(t, i).sum(axis=-1), pcf,
               idx_p, iters=4, label="  pcf 131072 x256 f32 SPLIT16")
    timed_scan(lambda t, i: gather_rows_parts(t, i).sum(axis=-1), pcf, idx_p,
               iters=4, label="  pcf 131072 x256 f32 ROW-SPLIT x2")
    timed_scan(lambda t, i: t[i].sum(axis=-1), pcf, idx_p, iters=4,
               label="  pcf 131072 x256 f32 PLAIN gather")


if __name__ == "__main__":
    main()
