"""Round-5 MaterialTap bisect: WHERE does the ~29 ms between a bare atlas
row gather (6 ms, u8 256 B rows) and the simplest bilinear tap (35 ms) go?

Rows add one tap ingredient at a time on the production atlas shape
(786432 rows), 2M requests:
  g0  gather + sum                          (the gather-law row)
  g1  gather + decode + sum                 (+ u8 -> linear f32 decode)
  g2  gather + decode + 4-slice blend       (+ static lane slices + fx/fy mul)
  g3  g2 with uv -> floor/wrap index math   (+ the sampler's index ALU)
  g4  real sample_pyramid_tri_level         (+ rect arithmetic, 2D shapes)
  g5  real sample_pyramid_tri               (+ parent 3x3 reconstruction)

    python tools/prof_tap_bisect.py
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
from unclerenderer_tpu.ops import texture as tex  # noqa: E402
from unclerenderer_tpu.ops.texture import _rows_to_f32  # noqa: E402

W, H = 1920, 1080
ROWS, LANES = 786432, 256
C = 16


def main():
    print("device:", jax.devices()[0], flush=True)
    rng = np.random.default_rng(5)
    table = jnp.asarray(
        rng.integers(0, 255, (ROWS, LANES), dtype=np.int64), jnp.uint8
    )
    idx = jnp.asarray(
        rng.integers(0, ROWS, W * H, dtype=np.int64), jnp.int32
    ).reshape(H, W)
    uv = jnp.asarray(rng.uniform(0, 1, (H, W, 2)).astype(np.float32))
    lod = jnp.asarray(rng.uniform(0, 6, (H, W)).astype(np.float32))
    rect = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 512.0, 512.0], jnp.float32), (H, W, 4))
    fx = uv[..., 0:1]
    fy = uv[..., 1:2]

    timed_scan(lambda t, i: t[i].astype(jnp.float32).sum(axis=-1),
               table, idx, label="g0: gather + sum")
    timed_scan(lambda t, i: _rows_to_f32(t[i], C).sum(axis=-1),
               table, idx, label="g1: gather + decode + sum")

    def blend4(t, i, fx, fy):
        q = _rows_to_f32(t[i][..., 0 : 4 * C], C)
        top = q[..., 0:C] * (1.0 - fx) + q[..., C : 2 * C] * fx
        bot = q[..., 2 * C : 3 * C] * (1.0 - fx) + q[..., 3 * C :] * fx
        return (top * (1.0 - fy) + bot * fy).sum(axis=-1)
    timed_scan(blend4, table, idx, fx, fy, label="g2: gather + decode + quad blend")

    def blend4_uvmath(t, u, l):
        w = jnp.float32(512.0)
        tx = u[..., 0] * w - 0.5
        ty = u[..., 1] * w - 0.5
        ix = jnp.mod(jnp.floor(tx).astype(jnp.int32), 512)
        iy = jnp.mod(jnp.floor(ty).astype(jnp.int32), 512)
        fx = (tx - jnp.floor(tx))[..., None]
        fy = (ty - jnp.floor(ty))[..., None]
        i = iy * 1024 + ix
        q = _rows_to_f32(t[i][..., 0 : 4 * C], C)
        top = q[..., 0:C] * (1.0 - fx) + q[..., C : 2 * C] * fx
        bot = q[..., 2 * C : 3 * C] * (1.0 - fx) + q[..., 3 * C :] * fx
        return (top * (1.0 - fy) + bot * fy).sum(axis=-1)
    timed_scan(blend4_uvmath, table, uv, lod,
               label="g3: + uv floor/wrap index math")

    timed_scan(
        lambda t, u, l: tex.sample_pyramid_tri_level(
            t, 1024, rect, u, jnp.round(l).astype(jnp.int32)
        ).sum(axis=-1),
        table, uv, lod, label="g4: real tri_level (bilinear tap)")
    timed_scan(
        lambda t, u, l: tex.sample_pyramid_tri(
            t, 1024, rect, u, l).sum(axis=-1),
        table, uv, lod, label="g5: real tri (trilinear tap)")


if __name__ == "__main__" and len(sys.argv) == 1:
    main()


def variants():
    print("device:", jax.devices()[0], flush=True)
    rng = np.random.default_rng(5)
    table = jnp.asarray(
        rng.integers(0, 255, (ROWS, LANES), dtype=np.int64), jnp.uint8
    )
    idx = jnp.asarray(
        rng.integers(0, ROWS, W * H, dtype=np.int64), jnp.int32
    ).reshape(H, W)
    uv = jnp.asarray(rng.uniform(0, 1, (H, W, 2)).astype(np.float32))
    fx = uv[..., 0:1]
    fy = uv[..., 1:2]

    # group-expand matrix (4 -> 64 lanes) and fold matrix (64 -> 16)
    j = np.arange(4 * C)
    E4 = jnp.asarray((j[None, :] // C == np.arange(4)[:, None]).astype(np.float32))
    S = jnp.asarray((j[:, None] % C == np.arange(C)[None, :]).astype(np.float32))

    def fold_only(t, i):
        q = _rows_to_f32(t[i][..., 0 : 4 * C], C)
        return (q.reshape(-1, 4 * C) @ S).sum(axis=-1)
    timed_scan(fold_only, table, idx, label="v0: gather+decode+fold matmul (no weights)")

    def blend_mxu(t, i, fx, fy):
        q = _rows_to_f32(t[i][..., 0 : 4 * C], C)
        w4 = jnp.concatenate(
            [(1 - fx) * (1 - fy), fx * (1 - fy), (1 - fx) * fy, fx * fy],
            axis=-1,
        )                                               # (H, W, 4)
        wlane = (w4.reshape(-1, 4) @ E4).reshape(q.shape)  # (H, W, 64)
        return ((q * wlane).reshape(-1, 4 * C) @ S).sum(axis=-1)
    timed_scan(blend_mxu, table, idx, fx, fy,
               label="v1: weighted 64-lane + fold matmul")

    def blend_reshape(t, i, fx, fy):
        q = _rows_to_f32(t[i][..., 0 : 4 * C], C)
        qr = q.reshape(q.shape[:-1] + (4, C))
        w4 = jnp.stack(
            [(1 - fx) * (1 - fy), fx * (1 - fy), (1 - fx) * fy, fx * fy],
            axis=-2,
        )                                               # (H, W, 4, 1)
        return (qr * w4).sum(axis=-2).sum(axis=-1)
    timed_scan(blend_reshape, table, idx, fx, fy,
               label="v2: (...,4,16) reshape weighted sum")


if __name__ == "__main__" and "variants" in sys.argv:
    variants()


def variants2():
    print("device:", jax.devices()[0], flush=True)
    rng = np.random.default_rng(5)
    table = jnp.asarray(
        rng.integers(0, 255, (ROWS, LANES), dtype=np.int64), jnp.uint8
    )
    idx = jnp.asarray(
        rng.integers(0, ROWS, W * H, dtype=np.int64), jnp.int32
    ).reshape(H, W)
    uv = jnp.asarray(rng.uniform(0, 1, (H, W, 2)).astype(np.float32))
    fx = uv[..., 0:1]
    fy = uv[..., 1:2]
    j = np.arange(4 * C)
    E4 = jnp.asarray((j[None, :] // C == np.arange(4)[:, None]).astype(np.float32))
    S = jnp.asarray((j[:, None] % C == np.arange(C)[None, :]).astype(np.float32))

    def blend_barrier_mxu(t, i, fx, fy):
        q = _rows_to_f32(t[i][..., 0 : 4 * C], C)
        q = jax.lax.optimization_barrier(q)
        w4 = jnp.concatenate(
            [(1 - fx) * (1 - fy), fx * (1 - fy), (1 - fx) * fy, fx * fy],
            axis=-1,
        )
        wlane = (w4.reshape(-1, 4) @ E4).reshape(q.shape)
        return ((q * wlane).reshape(-1, 4 * C) @ S).sum(axis=-1)
    timed_scan(blend_barrier_mxu, table, idx, fx, fy,
               label="v3: BARRIER + weighted + fold matmul")

    def blend_barrier_slices(t, i, fx, fy):
        q = _rows_to_f32(t[i][..., 0 : 4 * C], C)
        q = jax.lax.optimization_barrier(q)
        top = q[..., 0:C] * (1.0 - fx) + q[..., C : 2 * C] * fx
        bot = q[..., 2 * C : 3 * C] * (1.0 - fx) + q[..., 3 * C :] * fx
        return (top * (1.0 - fy) + bot * fy).sum(axis=-1)
    timed_scan(blend_barrier_slices, table, idx, fx, fy,
               label="v4: BARRIER + original slice blend")

    def blend_barrier_u8(t, i, fx, fy):
        raw = jax.lax.optimization_barrier(t[i][..., 0 : 4 * C])
        q = _rows_to_f32(raw, C)
        top = q[..., 0:C] * (1.0 - fx) + q[..., C : 2 * C] * fx
        bot = q[..., 2 * C : 3 * C] * (1.0 - fx) + q[..., 3 * C :] * fx
        return (top * (1.0 - fy) + bot * fy).sum(axis=-1)
    timed_scan(blend_barrier_u8, table, idx, fx, fy,
               label="v5: BARRIER on raw u8 + decode + slice blend")


if __name__ == "__main__" and "variants2" in sys.argv:
    variants2()


def variants3():
    print("device:", jax.devices()[0], flush=True)
    rng = np.random.default_rng(5)
    n = W * H
    q2d = jnp.asarray(rng.random((n, 4 * C), np.float32))
    w4 = jnp.asarray(rng.random((n, 4), np.float32))
    fx2 = jnp.asarray(rng.random((n, 1), np.float32))
    fy2 = jnp.asarray(rng.random((n, 1), np.float32))
    j = np.arange(4 * C)
    E4 = jnp.asarray((j[None, :] // C == np.arange(4)[:, None]).astype(np.float32))
    S = jnp.asarray((j[:, None] % C == np.arange(C)[None, :]).astype(np.float32))

    timed_scan(lambda q: (q @ S).sum(axis=-1), q2d,
               label="m0: fold matmul only (2M,64)@(64,16)")
    timed_scan(lambda q, w: ((q * (w @ E4)) @ S).sum(axis=-1), q2d, w4,
               label="m1: expand+mul+fold, 2D inputs")

    def m2(q, fx, fy):
        top = q[..., 0:C] * (1.0 - fx) + q[..., C : 2 * C] * fx
        bot = q[..., 2 * C : 3 * C] * (1.0 - fx) + q[..., 3 * C :] * fx
        return (top * (1.0 - fy) + bot * fy).sum(axis=-1)
    timed_scan(m2, q2d, fx2, fy2, label="m2: slice blend, 2D inputs")

    q3d = q2d.reshape(H, W, 4 * C)
    fx3 = fx2.reshape(H, W, 1)
    fy3 = fy2.reshape(H, W, 1)
    timed_scan(m2, q3d, fx3, fy3, label="m3: slice blend, 3D (H,W,·) inputs")

    # the gather result consumed by a DIFFERENT large input, no blend ALU
    table = jnp.asarray(
        rng.integers(0, 255, (ROWS, LANES), dtype=np.int64), jnp.uint8
    )
    idx = jnp.asarray(
        rng.integers(0, ROWS, n, dtype=np.int64), jnp.int32
    )
    other = jnp.asarray(rng.random((n, 4 * C), np.float32))
    timed_scan(
        lambda t, i, o: (_rows_to_f32(t[i][..., 0 : 4 * C], C) * o).sum(axis=-1),
        table, idx, other, label="m4: gather * other-large-input + sum")
    timed_scan(
        lambda t, i, f: (_rows_to_f32(t[i][..., 0 : 4 * C], C) * f).sum(axis=-1),
        table, idx, fx2, label="m5: gather * (n,1) frac + sum")


if __name__ == "__main__" and "variants3" in sys.argv:
    variants3()


def variants4():
    print("device:", jax.devices()[0], flush=True)
    rng = np.random.default_rng(5)
    n = W * H
    table = jnp.asarray(
        rng.integers(0, 255, (ROWS, LANES), dtype=np.int64), jnp.uint8
    )
    idx = jnp.asarray(rng.integers(0, ROWS, n, dtype=np.int64), jnp.int32)
    fx2 = jnp.asarray(rng.random((n, 1), np.float32))
    fy2 = jnp.asarray(rng.random((n, 1), np.float32))
    I64 = jnp.eye(4 * C, dtype=jnp.float32)

    timed_scan(
        lambda t, i, f: (_rows_to_f32(t[i], C) * f).sum(axis=-1),
        table, idx, fx2, label="v7: FULL-row gather * (n,1) + sum")
    timed_scan(
        lambda t, i: ((_rows_to_f32(t[i][..., 0 : 4 * C], C) @ I64)).sum(axis=-1),
        table, idx, label="v8: gather+decode @ I64 (materialize via MXU)")

    def v9(t, i, fx, fy):
        q = _rows_to_f32(t[i][..., 0 : 4 * C], C) @ I64
        top = q[..., 0:C] * (1.0 - fx) + q[..., C : 2 * C] * fx
        bot = q[..., 2 * C : 3 * C] * (1.0 - fx) + q[..., 3 * C :] * fx
        return (top * (1.0 - fy) + bot * fy).sum(axis=-1)
    timed_scan(v9, table, idx, fx2, fy2,
               label="v9: @I64 materialize + slice blend")


if __name__ == "__main__" and "variants4" in sys.argv:
    variants4()


def _pl_copy(rows, lanes_dtype=None):
    """Pallas identity copy: a HARD fusion boundary that keeps the gather
    in a single-input chain (the fast XLA gather form) and materializes
    the rows for multi-operand consumers."""
    from jax.experimental import pallas as pl

    n, lanes = rows.shape
    pix = 1024
    n_pad = -(-n // pix) * pix
    rp = jnp.pad(rows, ((0, n_pad - n), (0, 0))).reshape(-1, pix, lanes)
    out = pl.pallas_call(
        lambda r, o: o.__setitem__((0, slice(None), slice(None)), r[0]),
        grid=(n_pad // pix,),
        in_specs=[pl.BlockSpec((1, pix, lanes), lambda g: (g, 0, 0))],
        out_specs=pl.BlockSpec((1, pix, lanes), lambda g: (g, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n_pad // pix, pix, lanes), rows.dtype),
    )(rp)
    return out.reshape(n_pad, lanes)[:n]


def variants5():
    print("device:", jax.devices()[0], flush=True)
    rng = np.random.default_rng(5)
    n = W * H
    table = jnp.asarray(
        rng.integers(0, 255, (ROWS, LANES), dtype=np.int64), jnp.uint8
    )
    idx = jnp.asarray(rng.integers(0, ROWS, n, dtype=np.int64), jnp.int32)
    fx2 = jnp.asarray(rng.random((n, 1), np.float32))
    fy2 = jnp.asarray(rng.random((n, 1), np.float32))

    def v10(t, i, fx, fy):
        raw = t[i][..., 0 : 4 * C]                      # (n, 64) u8
        pairs = jax.lax.bitcast_convert_type(
            raw.reshape(n, 4 * C // 4, 4), jnp.int32)   # (n, 16) i32
        pairs = _pl_copy(pairs)
        q = _rows_to_f32(
            jax.lax.bitcast_convert_type(pairs[..., None], jnp.uint8
                                         ).reshape(n, 4 * C), C)
        top = q[..., 0:C] * (1.0 - fx) + q[..., C : 2 * C] * fx
        bot = q[..., 2 * C : 3 * C] * (1.0 - fx) + q[..., 3 * C :] * fx
        return (top * (1.0 - fy) + bot * fy).sum(axis=-1)
    timed_scan(v10, table, idx, fx2, fy2,
               label="v10: u8-as-i32 pallas copy + XLA blend")

    def v11(t, i, fx, fy):
        q = _pl_copy(_rows_to_f32(t[i][..., 0 : 4 * C], C))
        top = q[..., 0:C] * (1.0 - fx) + q[..., C : 2 * C] * fx
        bot = q[..., 2 * C : 3 * C] * (1.0 - fx) + q[..., 3 * C :] * fx
        return (top * (1.0 - fy) + bot * fy).sum(axis=-1)
    timed_scan(v11, table, idx, fx2, fy2,
               label="v11: f32 pallas copy + XLA blend")


if __name__ == "__main__" and "variants5" in sys.argv:
    variants5()


def variants6():
    print("device:", jax.devices()[0], flush=True)
    rng = np.random.default_rng(5)
    n = W * H
    table = jnp.asarray(
        rng.integers(0, 255, (ROWS, LANES), dtype=np.int64), jnp.uint8
    )
    idx_in = jnp.asarray(rng.integers(0, ROWS, n, dtype=np.int64), jnp.int32)
    uv = jnp.asarray(rng.uniform(0, 1, (n, 2)).astype(np.float32))
    rectw = jnp.asarray(rng.uniform(128, 512, (n,)).astype(np.float32))
    fx2 = jnp.asarray(rng.random((n, 1), np.float32))
    fy2 = jnp.asarray(rng.random((n, 1), np.float32))
    from unclerenderer_tpu.ops.fence import gather_fence

    def computed_idx(u, w):
        tx = u[..., 0] * w - 0.5
        ty = u[..., 1] * w - 0.5
        ix = jnp.mod(jnp.floor(tx).astype(jnp.int32), w.astype(jnp.int32))
        iy = jnp.mod(jnp.floor(ty).astype(jnp.int32), w.astype(jnp.int32))
        return iy * 1024 + ix

    timed_scan(
        lambda t, u, w: t[computed_idx(u, w)].astype(jnp.float32).sum(axis=-1),
        table, uv, rectw, label="w0: computed-idx gather + sum")

    def w1(t, u, w, fx, fy):
        raw = gather_fence(t[computed_idx(u, w)][..., 0 : 4 * C])
        q = _rows_to_f32(raw, C)
        top = q[..., 0:C] * (1.0 - fx) + q[..., C : 2 * C] * fx
        bot = q[..., 2 * C : 3 * C] * (1.0 - fx) + q[..., 3 * C :] * fx
        return (top * (1.0 - fy) + bot * fy).sum(axis=-1)
    timed_scan(w1, table, uv, rectw, fx2, fy2,
               label="w1: computed-idx + fence + blend")

    def w2(t, i, fx, fy):
        raw = gather_fence(t[i][..., 0 : 4 * C])
        q = _rows_to_f32(raw, C)
        top = q[..., 0:C] * (1.0 - fx) + q[..., C : 2 * C] * fx
        bot = q[..., 2 * C : 3 * C] * (1.0 - fx) + q[..., 3 * C :] * fx
        return (top * (1.0 - fy) + bot * fy).sum(axis=-1)
    timed_scan(w2, table, idx_in, fx2, fy2,
               label="w2: input-idx + fence + blend (v10 ctrl)")

    def w3(t, u, w, fx, fy):
        i = jax.lax.optimization_barrier(computed_idx(u, w))
        raw = gather_fence(t[i][..., 0 : 4 * C])
        q = _rows_to_f32(raw, C)
        top = q[..., 0:C] * (1.0 - fx) + q[..., C : 2 * C] * fx
        bot = q[..., 2 * C : 3 * C] * (1.0 - fx) + q[..., 3 * C :] * fx
        return (top * (1.0 - fy) + bot * fy).sum(axis=-1)
    timed_scan(w3, table, uv, rectw, fx2, fy2,
               label="w3: idx BARRIER + fence + blend")


if __name__ == "__main__" and "variants6" in sys.argv:
    variants6()


def variants7():
    print("device:", jax.devices()[0], flush=True)
    rng = np.random.default_rng(5)
    n = W * H
    table = jnp.asarray(
        rng.integers(0, 255, (ROWS, LANES), dtype=np.int64), jnp.uint8
    )
    uv = jnp.asarray(rng.uniform(0, 1, (n, 2)).astype(np.float32))
    rectw = jnp.asarray(rng.uniform(128, 512, (n,)).astype(np.float32))
    fx2 = jnp.asarray(rng.random((n, 1), np.float32))
    fy2 = jnp.asarray(rng.random((n, 1), np.float32))
    from unclerenderer_tpu.ops.fence import gather_fence

    def computed_idx(u, w):
        tx = u[..., 0] * w - 0.5
        ty = u[..., 1] * w - 0.5
        ix = jnp.mod(jnp.floor(tx).astype(jnp.int32), w.astype(jnp.int32))
        iy = jnp.mod(jnp.floor(ty).astype(jnp.int32), w.astype(jnp.int32))
        return iy * 1024 + ix

    def fence_idx(i):
        m = i.shape[0]
        pad = -(-m // 128) * 128
        return gather_fence(
            jnp.pad(i, (0, pad - m)).reshape(-1, 128)
        ).reshape(pad)[:m]

    def w4(t, u, w, fx, fy):
        i = fence_idx(computed_idx(u, w))
        raw = gather_fence(t[i][..., 0 : 4 * C])
        q = _rows_to_f32(raw, C)
        top = q[..., 0:C] * (1.0 - fx) + q[..., C : 2 * C] * fx
        bot = q[..., 2 * C : 3 * C] * (1.0 - fx) + q[..., 3 * C :] * fx
        return (top * (1.0 - fy) + bot * fy).sum(axis=-1)
    timed_scan(w4, table, uv, rectw, fx2, fy2,
               label="w4: idx FENCE + rows fence + blend")

    timed_scan(
        lambda t, u, w: t[fence_idx(computed_idx(u, w))].astype(
            jnp.float32).sum(axis=-1),
        table, uv, rectw, label="w5: idx FENCE + gather + sum")


if __name__ == "__main__" and "variants7" in sys.argv:
    variants7()


def quadtri():
    """Round-5 decision rows: the REAL production taps both ways.

    The tablesize law says 64-lane u8 rows gather ~3.5x faster than
    128/256-lane rows (7.5 vs 25-28 ms/2M).  If that holds through the
    full sampler, TWO 64-lane gathers (quad atlas, sample_pyramid_trilinear)
    beat ONE 256-lane gather (packed-tri atlas, sample_pyramid_tri) -- and
    bilinear mode gets the whole 3.5x (one 64-lane gather vs one 256-lane
    row sliced to its first 64 lanes)."""
    print("device:", jax.devices()[0], flush=True)
    rng = np.random.default_rng(5)
    tri_table = jnp.asarray(
        rng.integers(0, 255, (ROWS, LANES), dtype=np.int64), jnp.uint8
    )
    quad_table = jnp.asarray(
        rng.integers(0, 255, (ROWS, 4 * C), dtype=np.int64), jnp.uint8
    )
    uv = jnp.asarray(rng.uniform(0, 1, (H, W, 2)).astype(np.float32))
    lod = jnp.asarray(rng.uniform(0, 6, (H, W)).astype(np.float32))
    level = jnp.round(lod).astype(jnp.int32)
    rect = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 512.0, 512.0], jnp.float32), (H, W, 4))

    timed_scan(
        lambda t, u, l: tex.sample_pyramid_tri(
            t, 1024, rect, u, l).sum(axis=-1),
        tri_table, uv, lod, label="q0: packed-tri 256-lane trilinear (cur)")
    timed_scan(
        lambda t, u, l: tex.sample_pyramid_trilinear(
            t, 1024, rect, u, l).sum(axis=-1),
        quad_table, uv, lod, label="q1: quad 64-lane 2-gather trilinear")
    timed_scan(
        lambda t, u, l: tex.sample_pyramid_tri_level(
            t, 1024, rect, u, l).sum(axis=-1),
        tri_table, uv, level, label="q2: packed-tri row bilinear (cur)")
    timed_scan(
        lambda t, u, l: tex.sample_pyramid_bilinear(
            t, 1024, rect, u, l).sum(axis=-1),
        quad_table, uv, level, label="q3: quad 64-lane 1-gather bilinear")


if __name__ == "__main__" and "quadtri" in sys.argv:
    quadtri()


def tablesize():
    """Honest table-size law: same 2M requests, u8/bf16 rows, varying table
    MB. Decides whether shrinking the material atlas under a cliff pays."""
    print("device:", jax.devices()[0], flush=True)
    rng = np.random.default_rng(5)
    n = W * H
    import os
    shapes = [
        (98304, 256, jnp.uint8), (262144, 256, jnp.uint8),
        (393216, 256, jnp.uint8), (524288, 256, jnp.uint8),
        (786432, 256, jnp.uint8), (1572864, 256, jnp.uint8),
        (786432, 64, jnp.uint8), (786432, 128, jnp.uint8),
        (393216, 128, jnp.uint8), (786432, 128, jnp.bfloat16),
    ]
    lo = int(os.environ.get("TS_LO", "0")); hi = int(os.environ.get("TS_HI", "99"))
    for rows, lanes, dt in shapes[lo:hi]:
        if jnp.dtype(dt).kind == "u":
            t = jnp.asarray(rng.integers(0, 255, (rows, lanes), dtype=np.int64), dt)
        else:
            t = jnp.asarray(rng.random((rows, lanes), np.float32), dt)
        i = jnp.asarray(rng.integers(0, rows, n, dtype=np.int64), jnp.int32)
        mb = rows * lanes * jnp.dtype(dt).itemsize / 1e6
        timed_scan(
            lambda tt, ii: tt[ii].astype(jnp.float32).sum(axis=-1), t, i,
            label=f"{rows:>8}r x {lanes:>3} {jnp.dtype(dt).name:<9} {mb:6.0f} MB")


if __name__ == "__main__" and "tablesize" in sys.argv:
    tablesize()
