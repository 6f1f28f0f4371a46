"""Round-5 coef-gather formulations: the binning coef gather + transpose is
23 ms (shadow) / 12 ms (camera) of the 30 ms FineBinning bucket -- the
single biggest remaining line.  The gather output (n_blocks, chunk, 16)
f32 has a 16-lane minor (8x lane padding on the gather write) and then a
minor-dim transpose to the kernel's (n_blocks, 16, chunk) layout.

Candidates (all produce bit-identical (n_blocks, 16, chunk) f32):
  c0  coef[tid].transpose(0, 2, 1)                 -- current production
  c1  coef[tid] only (no transpose)                -- isolates the transpose
  c2  coef.T[:, tid] -> (16, B, chunk) + moveaxis  -- gather writes minor=chunk
  c3  pad table to (T, 128), gather, slice, transpose
  c4  c2 without the moveaxis (kernel could take (16, B, chunk) blocks)

    python tools/prof_bin5.py
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

from tools.timing import timed_scan  # noqa: E402

T = 163840
CHUNK = 64


def main():
    print("device:", jax.devices()[0], flush=True)
    rng = np.random.default_rng(7)
    coef = jnp.asarray(rng.random((T, 16), np.float32))
    coef_t = jnp.asarray(np.ascontiguousarray(np.asarray(coef).T))  # (16, T)
    coef_pad = jnp.pad(coef, ((0, 0), (0, 112)))  # (T, 128)

    for name, n_blocks in (("cam", 7160), ("shadow", 7936)):
        tid = jnp.asarray(
            rng.integers(0, T, (n_blocks, CHUNK), dtype=np.int64), jnp.int32
        )
        print(f"-- {name}: n_blocks={n_blocks} requests={n_blocks * CHUNK}",
              flush=True)

        timed_scan(lambda c, i: c[i].transpose(0, 2, 1), coef, tid,
                   label=f"c0[{name}]: gather + transpose (current)")
        timed_scan(lambda c, i: c[i], coef, tid,
                   label=f"c1[{name}]: gather only")
        timed_scan(lambda ct, i: jnp.moveaxis(ct[:, i], 0, 1), coef_t, tid,
                   label=f"c2[{name}]: T-table gather + moveaxis")
        timed_scan(lambda cp, i: cp[i][..., :16].transpose(0, 2, 1),
                   coef_pad, tid,
                   label=f"c3[{name}]: 128-pad gather + slice + transpose")
        timed_scan(lambda ct, i: ct[:, i], coef_t, tid,
                   label=f"c4[{name}]: T-table gather (16, B, chunk)")


def dist():
    """Index-distribution law: the in-graph coef gather costs ~12-15 ms vs
    4.4 isolated with uniform random indices.  Production blocks_tid is
    ~half ZEROS (dead slots masked by `where(slot_valid, tid, 0)`) and the
    live half is per-tile ascending runs.  If repeated-row gathers
    serialize, spreading the dead-slot dummy index is a free fix (dead rows
    are masked by `valid` in the kernel, any index is correct)."""
    print("device:", jax.devices()[0], flush=True)
    rng = np.random.default_rng(7)
    coef = jnp.asarray(rng.random((T, 16), np.float32))
    n_blocks = 7936
    n = n_blocks * CHUNK

    uni = rng.integers(0, T, n, dtype=np.int64)
    half0 = uni.copy()
    half0[rng.random(n) < 0.5] = 0
    # production-like: ascending runs of ~64 within tiles + half zeros
    runs = np.sort(uni.reshape(-1, CHUNK), axis=1).reshape(-1)
    runs0 = runs.copy()
    dead = rng.random(n) < 0.5
    runs0[dead] = 0
    spread = runs.copy()
    spread[dead] = (np.arange(n) * 37)[dead] % T

    for name, idx in (("uniform", uni), ("half-zeros", half0),
                      ("runs+zeros (prod-like)", runs0),
                      ("runs+spread-dummy", spread)):
        i = jnp.asarray(idx.reshape(n_blocks, CHUNK), jnp.int32)
        timed_scan(lambda c, ii: c[ii].transpose(0, 2, 1), coef, i,
                   label=f"d[{name}]")


if __name__ == "__main__" and "dist" in sys.argv:
    dist()


def chain():
    """Composition bisect: feed _align_pairs PRE-SORTED input arrays (no
    sort in graph) and add the coef gather -- if align+gather is additive
    (~0.7 + 5), the in-graph blowup comes from sharing a graph with the
    sort; if it reproduces ~12-15, the align->gather interaction itself is
    the pathology."""
    print("device:", jax.devices()[0], flush=True)
    from unclerenderer_tpu.ops.binning import _align_pairs

    rng = np.random.default_rng(7)
    coef = jnp.asarray(rng.random((T, 16), np.float32))
    n_tiles, s_slots = 4096, 4
    n_pairs = T * s_slots
    n_blocks = 7936
    keys = np.sort(rng.integers(0, n_tiles + 1, n_pairs, dtype=np.int64))
    sk = jnp.asarray(keys, jnp.int32)
    stri = jnp.asarray(rng.integers(0, T, n_pairs, dtype=np.int64), jnp.int32)

    def align(k, t):
        btid, sv, _bt, _bf, _iu, _tu, ovf = _align_pairs(
            k, t, n_tiles, CHUNK, n_blocks)
        return btid, sv, ovf
    timed_scan(align, sk, stri, label="e0: align only (input sorted arrays)")

    def align_g(k, t, c):
        btid, sv, _bt, _bf, _iu, _tu, ovf = _align_pairs(
            k, t, n_tiles, CHUNK, n_blocks)
        btid = jnp.where(sv, btid, 0)
        return c[btid].transpose(0, 2, 1), sv, ovf
    timed_scan(align_g, sk, stri, coef, label="e1: align + coef gather + T")

    def align_g2(k, t, c):
        btid, sv, _bt, _bf, _iu, _tu, ovf = _align_pairs(
            k, t, n_tiles, CHUNK, n_blocks)
        btid = jnp.where(sv, btid, 0)
        btid = jax.lax.optimization_barrier(btid)
        return c[btid].transpose(0, 2, 1), sv, ovf
    timed_scan(align_g2, sk, stri, coef, label="e2: align + BARRIER + gather")


if __name__ == "__main__" and "chain" in sys.argv:
    chain()

if __name__ == "__main__" and len(sys.argv) == 1:
    main()
