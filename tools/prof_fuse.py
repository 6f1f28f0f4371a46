"""Fusion-trap decision rows: gathers with IN-GRAPH index producers vs
indices forced through a materialization boundary.

prof_coef (round 6) measured the SAME coef gather at 3.9 ms with
parameter indices but +11.3 ms when fused behind _align_pairs inside one
jit -- and binparts' optimization_barrier row shows the barrier does NOT
recover the fast path.  Hypothesis: a trivial Pallas identity kernel on
the index array forces XLA to materialize it (a real kernel boundary),
putting the downstream gather back on the fast emitter.  If true, the
production frame can buy the fast path for ~0.1 ms of copy per raster.

    python tools/prof_fuse.py
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from unclerenderer_tpu.core.jaxcache import (
    enable_persistent_cache,
    pin_platform_from_env,
)

pin_platform_from_env()
enable_persistent_cache()

import os

from tools.timing import timed_scan as _timed_scan

ITERS = int(os.environ.get("PROF_ITERS", "8"))
W, H, SHADOW = 1920, 1080, 4096


def timed_scan(fn, *args, label=""):
    try:
        return _timed_scan(fn, *args, iters=ITERS, label=label, label_width=56)
    except Exception as e:  # pragma: no cover
        print(f"{label:<56}   FAILED ({str(e)[:90]})", flush=True)
        return float("nan")


def _id_kernel(x_ref, o_ref):
    o_ref[...] = x_ref[...]


def materialize(x):
    """Identity Pallas kernel: a hard materialization boundary."""
    n = x.shape[0]
    rest = 1
    for d in x.shape[1:]:
        rest *= d
    row_bytes = max(rest * x.dtype.itemsize, 1)
    blk = max(1, min(n, (4 << 20) // row_bytes))
    while n % blk:
        blk -= 1
    return pl.pallas_call(
        _id_kernel,
        grid=(n // blk,),
        in_specs=[pl.BlockSpec((blk,) + x.shape[1:],
                               lambda i: (i,) + (0,) * (x.ndim - 1))],
        out_specs=pl.BlockSpec((blk,) + x.shape[1:],
                               lambda i: (i,) + (0,) * (x.ndim - 1)),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
    )(x)


def main():
    from unclerenderer_tpu.ops.binning import (
        _align_pairs, _pair_keys, _sort_pairs,
    )
    from unclerenderer_tpu.ops.raster import (
        CULL_BACK, CULL_FRONT, compact_setup, flip_depth_key,
        normalize_ortho_setup, triangle_setup_expanded,
        viewport_homogeneous,
    )
    from unclerenderer_tpu.render import common
    from unclerenderer_tpu.render.params import RenderSettings
    from unclerenderer_tpu.render.testing import (
        synthetic_device_scene,
        synthetic_frame_params,
    )

    print("device:", jax.devices()[0], flush=True)
    settings = RenderSettings(
        width=W, height=H, renderer_type="deferred", shadow_map_size=SHADOW,
        raster_backend="pallas", has_masked_models=False,
        combined_material=True,
    )
    scene, data = synthetic_device_scene(
        340, sphere_res=(32, 24), ground=True, rich_materials=True,
        atlas_u8=True,
    )
    params = synthetic_frame_params(data, W, H)
    opaque, _ = common.tri_draw_masks(scene, params.model_visible)
    t_count = int(scene.tri_geo.shape[0])
    span = settings.bin_max_span
    s_slots = span * span

    def cam_setup(sc, vp):
        clip, pix_h = common.vertex_stage(sc, vp, W, H)
        st = triangle_setup_expanded(
            pix_h, clip[:, 2], opaque, CULL_BACK, W, H)
        cap = common.compaction_cap(settings, t_count)
        if cap:
            st, _ids, _ovf = compact_setup(st, cap)
        return st

    def sh_setup(sc, lvp):
        hom = jnp.concatenate(
            [sc.position, jnp.ones_like(sc.position[..., :1])], axis=-1)
        clip = hom @ lvp
        pix_h = viewport_homogeneous(clip, SHADOW, SHADOW)
        st = triangle_setup_expanded(
            pix_h, clip[:, 2], opaque, CULL_FRONT, SHADOW, SHADOW)
        scap = common.shadow_compaction_cap(settings, t_count)
        if scap:
            st, _ids, _ovf = compact_setup(st, scap)
        return flip_depth_key(normalize_ortho_setup(st))

    cam0 = jax.block_until_ready(jax.jit(cam_setup)(scene, params.view_proj))
    sh0 = jax.block_until_ready(
        jax.jit(sh_setup)(scene, params.light_view_proj))

    for name, st0, (w_, h_, th, tw, ck, budget) in [
        ("cam", cam0, (W, H, settings.tile_h, settings.tile_w,
                       settings.chunk, settings.bin_budget_factor)),
        ("shadow", sh0, (SHADOW, SHADOW, settings.shadow_tile_h,
                         settings.shadow_tile_w, settings.shadow_chunk,
                         settings.shadow_bin_budget_factor)),
    ]:
        n_tiles = (-(-w_ // tw)) * (-(-h_ // th))
        tc = st0.coef.shape[0]
        n_blocks = max(int(budget * tc) // ck + n_tiles, 2)

        def align(st, use_scatter=False):
            keys, _big = _pair_keys(st, w_, h_, th, tw, span)
            sk, stri = _sort_pairs(keys, n_tiles, s_slots)
            btid, sv, *_rest = _align_pairs(
                sk, stri, n_tiles, ck, n_blocks, use_scatter=use_scatter)
            return jnp.where(sv, btid, 0), sv

        def fused(st):
            bt, sv = align(st)
            return st.coef[bt].transpose(0, 2, 1), sv
        timed_scan(fused, st0, label=f"fuse[{name}]: align+gather FUSED")

        def mat(st):
            bt, sv = align(st)
            bt = materialize(bt)
            return st.coef[bt].transpose(0, 2, 1), sv
        timed_scan(mat, st0, label=f"fuse[{name}]: align+MATERIALIZE+gather")

        def mat_sc(st):
            bt, sv = align(st, use_scatter=True)
            return st.coef[bt].transpose(0, 2, 1), sv
        timed_scan(mat_sc, st0, label=f"fuse[{name}]: align(scatter)+gather")

        a = jax.jit(fused)(st0)
        b = jax.jit(mat)(st0)
        print(f"  [{name}] materialize bit-exact: "
              f"{bool(jnp.all(a[0] == b[0]))}", flush=True)

    # compact primitive rows: the frame runs ~6 mask compactions (primary/
    # mid/giant x cam/shadow), each a full-T packed sort at ~3 ms; price a
    # cumsum+scatter formulation (identical ascending-order semantics)
    tc0 = cam0.coef.shape[0]
    idx_bits = max((tc0 - 1).bit_length(), 1)
    mask0 = jax.block_until_ready(
        jnp.asarray(np.random.default_rng(1).random(tc0) < 0.004))
    for cap in (1280, 10240, 163840):
        def c_sort(m):
            iota = jnp.arange(tc0, dtype=jnp.int32)
            packed = jnp.where(m, 0, jnp.int32(1 << idx_bits)) + iota
            sp = jnp.sort(packed)[:cap]
            return sp & jnp.int32((1 << idx_bits) - 1), sp < jnp.int32(1 << idx_bits)

        def c_scat(m):
            iota = jnp.arange(tc0, dtype=jnp.int32)
            pos = jnp.cumsum(m.astype(jnp.int32)) - 1
            dest = jnp.where(m & (pos < cap), pos, cap)
            out = jnp.full(cap + 1, tc0, jnp.int32).at[dest].set(iota)
            total = jnp.minimum(pos[-1] + 1, cap)
            valid = jnp.arange(cap, dtype=jnp.int32) < total
            return jnp.where(valid, out[:cap], 0), valid

        timed_scan(c_sort, mask0, label=f"compact[cap={cap}]: packed sort")
        timed_scan(c_scat, mask0, label=f"compact[cap={cap}]: cumsum+scatter")
        a = jax.jit(c_sort)(mask0)
        b = jax.jit(c_scat)(mask0)
        ok = bool(jnp.all(jnp.where(a[1], a[0], 0) == jnp.where(b[1], b[0], 0))
                  & jnp.all(a[1] == b[1]))
        print(f"  compact[cap={cap}] scatter == sort: {ok}", flush=True)

    # RecGather-shaped: index image from a merge chain (like tri_id after
    # the level merges) feeding a (cap, 128) record gather
    tc = cam0.coef.shape[0]
    rng = np.random.default_rng(0)
    rec = jnp.asarray(rng.standard_normal((tc, 128)).astype(np.float32))
    i1 = jnp.asarray(rng.integers(0, tc, (H, W)).astype(np.int32))
    i2 = jnp.asarray(rng.integers(0, tc, (H, W)).astype(np.int32))
    k1 = jnp.asarray(rng.standard_normal((H, W)).astype(np.float32))
    k2 = jnp.asarray(rng.standard_normal((H, W)).astype(np.float32))

    def rec_fused(r, a_, b_, ka, kb):
        tri = jnp.where(ka > kb, a_, b_)  # the merge-select producer
        return r[jnp.maximum(tri, 0)].sum(-1)
    timed_scan(rec_fused, rec, i1, i2, k1, k2,
               label="fuse[rec128]: merge-select + gather FUSED")

    def rec_mat(r, a_, b_, ka, kb):
        tri = jnp.where(ka > kb, a_, b_)
        tri = materialize(tri)
        return r[jnp.maximum(tri, 0)].sum(-1)
    timed_scan(rec_mat, rec, i1, i2, k1, k2,
               label="fuse[rec128]: merge-select + MAT + gather")


if __name__ == "__main__":
    main()
