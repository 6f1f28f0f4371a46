"""Directional shadow mapping: comparison sampling + PCF.

The shadow map itself comes from the shared rasterizer in DEPTH_MIN mode
(depth-only, front-face culled, LESS_EQUAL -- ``Renderer.cpp:271-296``).
This module ports the receiver side:

* ``SampleCmpLevelZero`` with a **linear comparison sampler** and BORDER
  addressing (border depth 1.0 = unoccluded) -- deferred path
  (``DeferredRenderer.cpp:1723-1726``),
* the 4-tap PCF patterns of both shaders: deferred taps at +x, +y, +xy
  (``DeferredLighting.hlsl:62-72``), forward taps at the four half-texel
  diagonals (``ForwardPS.hlsl:110-121``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.passes import named_pass


def _cmp_gather(shadow_map: jnp.ndarray, ix: jnp.ndarray, iy: jnp.ndarray, compare: jnp.ndarray) -> jnp.ndarray:
    """Point comparison fetch with BORDER = 1.0 (pass) outside the map."""
    h, w = shadow_map.shape
    inside = (ix >= 0) & (ix < w) & (iy >= 0) & (iy < h)
    sx = jnp.clip(ix, 0, w - 1)
    sy = jnp.clip(iy, 0, h - 1)
    depth = shadow_map[sy, sx]
    # LESS_EQUAL comparison: 1 when compare <= stored depth (lit).
    passed = (compare <= depth).astype(jnp.float32)
    return jnp.where(inside, passed, 1.0)


def sample_cmp_linear(shadow_map: jnp.ndarray, uv: jnp.ndarray, compare: jnp.ndarray) -> jnp.ndarray:
    """Linear-comparison sample (hardware PCF): compare at the 4 bilinear
    texels, then bilinearly blend the 0/1 results."""
    h, w = shadow_map.shape
    tx = uv[..., 0] * w - 0.5
    ty = uv[..., 1] * h - 0.5
    x0 = jnp.floor(tx)
    y0 = jnp.floor(ty)
    fx = tx - x0
    fy = ty - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    c00 = _cmp_gather(shadow_map, x0i, y0i, compare)
    c10 = _cmp_gather(shadow_map, x0i + 1, y0i, compare)
    c01 = _cmp_gather(shadow_map, x0i, y0i + 1, compare)
    c11 = _cmp_gather(shadow_map, x0i + 1, y0i + 1, compare)
    top = c00 * (1 - fx) + c10 * fx
    bot = c01 * (1 - fx) + c11 * fx
    return top * (1 - fy) + bot * fy


def sample_cmp_point(shadow_map: jnp.ndarray, uv: jnp.ndarray, compare: jnp.ndarray) -> jnp.ndarray:
    """Point-comparison sample (forward path sampler,
    ``ForwardRenderer.cpp:970-973``)."""
    h, w = shadow_map.shape
    ix = jnp.floor(uv[..., 0] * w).astype(jnp.int32)
    iy = jnp.floor(uv[..., 1] * h).astype(jnp.int32)
    return _cmp_gather(shadow_map, ix, iy, compare)


def shadow_factor(
    shadow_map: jnp.ndarray,
    world_pos: jnp.ndarray,
    light_view_proj: jnp.ndarray,
    shadow_strength: float,
    shadow_bias: float,
    pcf: str = "deferred",
) -> jnp.ndarray:
    """Full receiver math shared by both shaders: project into light space,
    4-tap PCF, lerp(1, shadow, strength); outside-map or strength<=0 -> 1."""
    h, w = shadow_map.shape
    p = jnp.concatenate([world_pos, jnp.ones_like(world_pos[..., :1])], axis=-1)
    sp = p @ light_view_proj
    coord = sp[..., :3] / jnp.where(sp[..., 3:4] != 0.0, sp[..., 3:4], 1.0)
    uv = jnp.stack(
        [coord[..., 0] * 0.5 + 0.5, coord[..., 1] * -0.5 + 0.5], axis=-1
    )
    compare = coord[..., 2] - shadow_bias

    texel = jnp.array([1.0 / w, 1.0 / h], jnp.float32)
    if pcf == "deferred":
        # DeferredLighting.hlsl:62-72 (linear cmp sampler)
        s = 0.25 * (
            sample_cmp_linear(shadow_map, uv, compare)
            + sample_cmp_linear(shadow_map, uv + jnp.array([texel[0], 0.0]), compare)
            + sample_cmp_linear(shadow_map, uv + jnp.array([0.0, texel[1]]), compare)
            + sample_cmp_linear(shadow_map, uv + texel, compare)
        )
    else:
        # ForwardPS.hlsl:110-121 (point cmp sampler, half-texel diagonals)
        ht = 0.5 * texel
        s = 0.25 * (
            sample_cmp_point(shadow_map, uv + jnp.array([ht[0], ht[1]]), compare)
            + sample_cmp_point(shadow_map, uv + jnp.array([-ht[0], ht[1]]), compare)
            + sample_cmp_point(shadow_map, uv + jnp.array([ht[0], -ht[1]]), compare)
            + sample_cmp_point(shadow_map, uv + jnp.array([-ht[0], -ht[1]]), compare)
        )
    s = 1.0 + (s - 1.0) * shadow_strength  # lerp(1, s, strength)

    in_range = (
        (uv[..., 0] >= 0.0) & (uv[..., 0] <= 1.0) & (uv[..., 1] >= 0.0) & (uv[..., 1] <= 1.0)
    )
    enabled = shadow_strength > 0.0
    return jnp.where(enabled & in_range, s, 1.0)


# ---------------------------------------------------------------------------
# Packed-neighborhood PCF: the deferred 4-tap pattern reads a 3x3 texel
# footprint; packing each texel's 3x3 neighborhood into one 12-channel row
# (built per frame from the fresh shadow map) turns 16 comparison gathers
# into ONE row gather per pixel.
# ---------------------------------------------------------------------------


def pack_shadow9(shadow_map: jnp.ndarray) -> jnp.ndarray:
    """(S, S) depth -> (S, S, 12) f16: channels [dy*3+dx] = depth(y+dy, x+dx)
    for dy, dx in 0..2, padded with +inf outside (BORDER = always lit).

    Stored as float16 to halve the per-pixel gather bytes (measured ~20%
    faster at 4096^2).  The stored depth is lifted by 5e-4 (> one f16 ulp in
    [0.5, 1)) before quantization so rounding can never pull a blocker below
    its true depth -- no acne; the effective comparison bias grows by at most
    1e-3 against a 2e-3 default bias."""
    s = shadow_map.shape[0]
    inf = jnp.float32(jnp.inf)
    padded = jnp.pad(shadow_map + 5e-4, ((0, 2), (0, 2)), constant_values=inf)
    chans = [padded[dy : dy + s, dx : dx + s] for dy in range(3) for dx in range(3)]
    chans += [jnp.zeros_like(shadow_map)] * 3  # pad to 12 for alignment
    return jnp.stack(chans, axis=-1).astype(jnp.float16)


def _shadow_project(world_pos, light_view_proj, size, shadow_bias):
    """Shared receiver projection: world -> light uv, compare depth, and the
    clamped 3x3 neighborhood base (xi/yi true base, xi0/yi0 clamped)."""
    p = jnp.concatenate([world_pos, jnp.ones_like(world_pos[..., :1])], axis=-1)
    sp = p @ light_view_proj
    coord = sp[..., :3] / jnp.where(sp[..., 3:4] != 0.0, sp[..., 3:4], 1.0)
    uv = jnp.stack(
        [coord[..., 0] * 0.5 + 0.5, coord[..., 1] * -0.5 + 0.5], axis=-1
    )
    compare = coord[..., 2] - shadow_bias
    tx = uv[..., 0] * size - 0.5
    ty = uv[..., 1] * size - 0.5
    x0 = jnp.floor(tx)
    y0 = jnp.floor(ty)
    fx = tx - x0
    fy = ty - y0
    # clamp the base so out-of-range neighborhoods read the +inf border
    xi = jnp.clip(x0.astype(jnp.int32), -2, size - 1)
    yi = jnp.clip(y0.astype(jnp.int32), -2, size - 1)
    xi0 = jnp.clip(xi, 0, size - 1)
    yi0 = jnp.clip(yi, 0, size - 1)
    return uv, compare, fx, fy, xi, yi, xi0, yi0


def _pcf_blend(passed, fx, fy, uv, shadow_strength, pcf):
    """4-tap PCF blend from 9 pass planes (0/1 f32) -- the ONE blend
    implementation every packed layout (and the fused Pallas path) shares,
    so results stay bit-identical across fetch machineries."""
    def lin(dx, dy):
        c00 = passed[dy * 3 + dx]
        c10 = passed[dy * 3 + dx + 1]
        c01 = passed[(dy + 1) * 3 + dx]
        c11 = passed[(dy + 1) * 3 + dx + 1]
        return (c00 * (1 - fx) + c10 * fx) * (1 - fy) + (c01 * (1 - fx) + c11 * fx) * fy

    if pcf == "deferred":
        s4 = 0.25 * (lin(0, 0) + lin(1, 0) + lin(0, 1) + lin(1, 1))
    else:
        # forward: 4 point taps at +-half-texel diagonals = the 2x2 corners
        s4 = 0.25 * (passed[0] + passed[1] + passed[3] + passed[4])
    s4 = 1.0 + (s4 - 1.0) * shadow_strength

    in_range = (
        (uv[..., 0] >= 0.0) & (uv[..., 0] <= 1.0) & (uv[..., 1] >= 0.0) & (uv[..., 1] <= 1.0)
    )
    return jnp.where((shadow_strength > 0.0) & in_range, s4, 1.0)


def _pcf_tail(nb9, compare, fx, fy, uv, xi, yi, xi0, yi0, size,
              shadow_strength, pcf):
    """Comparison + 4-tap PCF blend shared by every packed layout.
    nb9: list of 9 depth planes in (dy*3+dx) order."""
    passed = []
    for dy in range(3):
        for dx in range(3):
            txc = xi0 + dx
            tyc = yi0 + dy
            true_x = xi + dx
            true_y = yi + dy
            in_map = (true_x >= 0) & (true_x < size) & (true_y >= 0) & (true_y < size)
            d = nb9[dy * 3 + dx]
            ok = (compare <= d) | ~in_map | (txc != true_x) | (tyc != true_y)
            passed.append(ok.astype(jnp.float32))
    return _pcf_blend(passed, fx, fy, uv, shadow_strength, pcf)


@named_pass("ShadowPCF")
def shadow_factor_packed(
    shadow9_flat: jnp.ndarray,
    size: int,
    world_pos: jnp.ndarray,
    light_view_proj: jnp.ndarray,
    shadow_strength,
    shadow_bias,
    pcf: str = "deferred",
) -> jnp.ndarray:
    """shadow_factor with one packed-neighborhood gather per pixel.
    shadow9_flat: (S*S, 12) from pack_shadow9."""
    uv, compare, fx, fy, xi, yi, xi0, yi0 = _shadow_project(
        world_pos, light_view_proj, size, shadow_bias
    )
    nb = jnp.take(shadow9_flat, yi0 * size + xi0, axis=0).astype(jnp.float32)
    nb9 = [nb[..., k] for k in range(9)]
    return _pcf_tail(nb9, compare, fx, fy, uv, xi, yi, xi0, yi0, size,
                     shadow_strength, pcf)


# ---------------------------------------------------------------------------
# Superblock-packed PCF (production TPU path): the (S*S, 12) per-texel table
# above is measurably latency-bound -- TPU row gathers fall off a cliff once
# the table exceeds ~80k rows (measured 3.5 ns/row below, 12-19 ns/row
# above).  Packing BH x BW texel blocks (+2 apron) into one row keeps the
# table at S^2/(BH*BW) rows -- 65k at 2048^2 -- restoring the fast path;
# a small Pallas kernel extracts each pixel's 3x3 window from the fetched
# row (dynamic lane select is the one op XLA can't fuse without
# materializing 9 x (N, 128) selects -- measured 39 ms; in VMEM it's ~3 ms).
# ---------------------------------------------------------------------------


def shadow_block_shape(size: int) -> tuple:
    """Block dims (bh, bw) keeping the packed table on a fast-gather path.

    Square 8x8 blocks at every map size: (8+2)*(8+2) = 100 lanes pads to
    128 -- the lane budget the round-4 on-metal prober confirmed is the
    real fast-path limit (>128 lanes is 1.4-2x slower at every table size,
    while plain f32 128-lane rows stay fast to >=262k rows, so the 4096^2
    map's 262144-row table rides ONE plain gather).  Round 3's 8x16
    widening + u16 split-pair (256-lane rows) targeted a stale ~96k-row
    cliff and measured a 2x loss (BENCHLOG round-4 gather law)."""
    b = max(4, min(8, size // 256))
    return b, b


def pack_shadow_blocks(shadow_map: jnp.ndarray) -> jnp.ndarray:
    """(S, S) depth -> (S/bh * S/bw, 128|256) f32 superblock rows.

    Row r = block (by, bx) holds texels [by*bh .. by*bh+bh+1] x
    [bx*bw .. bx*bw+bw+1] (apron +2 on the positive side only: a base pixel
    inside the block taps at most +2), +inf outside the map (border = lit),
    channel (y_in_block)*(bw+2) + x_in_block.

    Stored f32 (Mosaic has no f16), so unlike pack_shadow9 there is no
    quantization and no +5e-4 lift: comparisons are bit-identical to the
    unpacked ``shadow_factor`` reference.  The wider table stays on the
    fast gather path (width does not move gather cost; rows do)."""
    # Overlapping windows from FOUR block-shifted copies of the core table.
    # The earlier 100-strided-slice channel stack compiled into dozens of
    # (1, nby*nbx) remat copies padded 128x (12.8 GB of HLO temp at 4096^2:
    # OOMed pica outright; same XLA pathology as the round-4 HZB rewrite).
    # The +2 apron rows/cols of a window are the FIRST rows/cols of the
    # next block, so shifting the transposed core along a BLOCK axis (+inf
    # fill at the map edge -- border = lit) supplies every apron channel.
    # On-metal sweep of formulations (BENCHLOG round-4 batch 3): this
    # per-lane stack = 6.3 ms; concat-then-blocked-transpose = 24.8 ms
    # (the (nby, bh+2, nbx, bw+2) transpose is the killer); chunked lane
    # concat = 13.6 ms; grouped non-affine layout = 7.6 ms.
    # channel (dy, dx) of block (by, bx) = map[by*bh+dy, bx*bw+dx]
    return _pack_blocks_core(shadow_map, jnp.float32(jnp.inf))


def pack_shadow_blocks_u16(shadow_map: jnp.ndarray) -> jnp.ndarray:
    """Superblock table with ceil-quantized u16 depths: halves the gather
    bytes per row (the round-5 gather-law rows decide whether the PCF gather
    rides the bf16-speed path at 262144 rows like the round-4 law suggests).

    Quantization: ``q = ceil(clip(d, 0, 1) * 65535)``, border = 65535
    (= always lit, the +inf analog).  Ceil is monotone, so a true pass
    ``compare <= depth`` NEVER flips to shadowed when both sides quantize
    (``ceil(c*K) <= ceil(d*K)``); the only divergence vs the f32 table is a
    sliver of extra light when ``depth < compare <= depth + 1/65535`` --
    bounded by 1.5e-5 of depth range against the 2e-3 default comparison
    bias.  DEFAULT ON (RenderSettings.shadow_table_u16; round-5 metal: PCF
    18.7 ms vs 34.5, pack 3.4 vs 9.2 at 4096^2); the f32 table is the
    opt-out bit-exact oracle surface for tests."""
    q = jnp.clip(
        jnp.ceil(shadow_map.astype(jnp.float32) * 65535.0), 0.0, 65535.0
    ).astype(jnp.uint16)
    return _pack_blocks_core(q, jnp.uint16(65535))


def _pack_blocks_core(sm: jnp.ndarray, border):
    """Shared superblock packing over any element dtype (see
    pack_shadow_blocks for the layout + the measured formulation notes)."""
    s = sm.shape[0]
    bh, bw = shadow_block_shape(s)
    c = (bh + 2) * (bw + 2)
    cpad = 128 if c <= 128 else 256
    assert c <= 256, (bh, bw)
    nby, nbx = s // bh, s // bw
    core = (
        sm.reshape(nby, bh, nbx, bw)
        .transpose(0, 2, 1, 3)
        .reshape(nby, nbx, bh * bw)
    )
    right = jnp.concatenate(
        [core[:, 1:], jnp.full((nby, 1, bh * bw), border, sm.dtype)], axis=1
    )
    down = jnp.concatenate(
        [core[1:], jnp.full((1, nbx, bh * bw), border, sm.dtype)], axis=0
    )
    diag = jnp.concatenate(
        [down[:, 1:], jnp.full((nby, 1, bh * bw), border, sm.dtype)], axis=1
    )
    chans = []
    for dy in range(bh + 2):
        for dx in range(bw + 2):
            if dy < bh and dx < bw:
                src, ch = core, dy * bw + dx
            elif dy < bh:
                src, ch = right, dy * bw + (dx - bw)
            elif dx < bw:
                src, ch = down, (dy - bh) * bw + dx
            else:
                src, ch = diag, (dy - bh) * bw + (dx - bw)
            chans.append(src[..., ch])
    flat = jnp.stack(chans, axis=-1).reshape(nby * nbx, c)
    return jnp.pad(flat, ((0, 0), (0, cpad - c)))


def _select9_kernel(rows_ref, base_ref, out_ref, *, deltas, pix, lanes_n):
    """Extract 9 dynamic lanes per row: out[p, k] = rows[p, base[p]+deltas[k]].
    rows_ref (1, P, L) f32 OR u16 (converted in VMEM -- u16 input blocks
    halve the kernel's DMA bytes and drop the 2.4 ms XLA-side convert the
    round-5 op dump exposed; integer depths <= 65535 convert exactly);
    base_ref (1, 1, P) i32; out (1, P, 16) f32.

    A "fused" variant that also did the 9 comparisons in VMEM and emitted
    one i32 bitmask per pixel (16x smaller output) was measured 1.76x
    SLOWER on metal (59.9 vs 34.1 ms at 4096^2/1080p -- BENCHLOG round-4
    batch 3), so the kernel stays a pure lane select and the compare +
    blend run in XLA where they fuse into the lighting consumer."""
    rows = rows_ref[0]                              # (P, L)
    if rows.dtype != jnp.float32:
        # u16 -> i32 -> f32: Mosaic has no direct u16->f32 cast (verified
        # on metal round 5); the i32 hop is exact for depths <= 65535
        rows = rows.astype(jnp.int32).astype(jnp.float32)
    base = base_ref[0, 0, :][:, None]               # (P, 1) -> lanes broadcast
    lanes = jax.lax.broadcasted_iota(jnp.int32, (pix, lanes_n), 1)
    for k, d in enumerate(deltas):
        sel = lanes == (base + d)
        out_ref[0, :, k] = jnp.sum(jnp.where(sel, rows, 0.0), axis=1)


def _select9_call(rows_p, base_p, grid, pix, lanes_n, deltas, interpret):
    from jax.experimental import pallas as pl
    out = pl.pallas_call(
        lambda r, b, o: _select9_kernel(
            r, b, o, deltas=deltas, pix=pix, lanes_n=lanes_n
        ),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((1, pix, lanes_n), lambda g: (g, 0, 0)),
            pl.BlockSpec((1, 1, pix), lambda g: (g, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, pix, 16), lambda g: (g, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((grid, pix, 16), jnp.float32),
        interpret=interpret,
    )(rows_p, base_p)
    return out.reshape(grid * pix, 16)


def _select9_fetch(blocks_flat, row_idx, base, deltas, interpret=False):
    """Gather + 3x3 lane select with the row gather emitted directly in the
    kernel's (grid, pix, L) block shape: reshaping the INDEX array before
    the gather costs nothing, while reshaping/padding the gathered rows
    afterwards copied the whole ~1 GB row array (the 3.9 ms `reshape` in
    the round-5 ShadowPCF op dump).  Bit-identical to gather-then-_select9."""
    n = row_idx.shape[0]
    pix = 1024
    n_pad = -(-n // pix) * pix
    idx_p = jnp.pad(row_idx, (0, n_pad - n)).reshape(-1, pix)
    # u16 rows stay u16 through the gather AND into the kernel (VMEM
    # astype): halves both the materialized row bytes and the kernel DMA
    rows_p = blocks_flat[idx_p]            # (grid, pix, L) -- no data reshape
    base_p = jnp.pad(base, (0, n_pad - n)).reshape(-1, 1, pix)
    grid = n_pad // pix
    lanes_n = blocks_flat.shape[-1]
    out = _select9_call(rows_p, base_p, grid, pix, lanes_n, deltas, interpret)
    return out[:n, :9]


@named_pass("ShadowPCF")
def shadow_factor_blocks(
    blocks_flat: jnp.ndarray,
    size: int,
    world_pos: jnp.ndarray,
    light_view_proj: jnp.ndarray,
    shadow_strength,
    shadow_bias,
    pcf: str = "deferred",
    interpret: bool = False,
) -> jnp.ndarray:
    """shadow_factor via the superblock table (pack_shadow_blocks): one
    fast-path row gather + Pallas 3x3 lane select per pixel.  On an f32
    table the compares are unquantized -- bit-comparable to the unpacked
    ``shadow_factor`` reference.  On a u16 table (pack_shadow_blocks_u16)
    the compare value quantizes into the same ceil domain, so the
    comparison stays conservative (see pack_shadow_blocks_u16)."""
    bh, bw = shadow_block_shape(size)
    nby, nbx = size // bh, size // bw
    uv, compare, fx, fy, xi, yi, xi0, yi0 = _shadow_project(
        world_pos, light_view_proj, size, shadow_bias
    )
    row = (yi0 // bh) * nbx + (xi0 // bw)
    base = (yi0 % bh) * (bw + 2) + (xi0 % bw)
    # ONE plain row gather at every map size: 128-lane f32 tables measured
    # fast to >=262k rows on the current toolchain (round-4 gather law);
    # the u16 table halves the row bytes on the same plain gather.  The
    # gather is emitted directly in the select kernel's block shape
    # (_select9_fetch) -- reshaping the gathered rows cost a ~1 GB copy.
    deltas = tuple(dy * (bw + 2) + dx for dy in range(3) for dx in range(3))
    nb = _select9_fetch(
        blocks_flat, row.reshape(-1), base.reshape(-1), deltas,
        interpret=interpret)
    nb = nb.reshape(compare.shape + (9,))
    nb9 = [nb[..., k] for k in range(9)]
    if blocks_flat.dtype == jnp.uint16:
        # integer-domain compare: ceil into [0, 65536] (65536 > any stored
        # value keeps beyond-far receivers shadowed, matching f32 behavior)
        compare = jnp.clip(jnp.ceil(compare * 65535.0), 0.0, 65536.0)
    return _pcf_tail(nb9, compare, fx, fy, uv, xi, yi, xi0, yi0, size,
                     shadow_strength, pcf)
