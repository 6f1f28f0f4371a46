"""Texture sampling: atlas gathers with wrap/clamp, bilinear/trilinear, cube.

TPUs have no texture units, so D3D sampler state becomes explicit math over
the packed atlas (textures/atlas.py).  Implements the reference's sampler
set: material sampler = WRAP + mips (``ForwardRenderer.cpp:956-959``,
anisotropic approximated as trilinear), IBL sampler = CLAMP linear
(``:982-985``), shadow comparison sampling lives in ops/shadow.py.

Mip selection follows the D3D spec: level = log2(max axis of the UV
footprint), from screen-space UV derivatives (forward differences, the
software analog of the GPU's 2x2 quad derivatives).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

ADDRESS_WRAP = 0
ADDRESS_CLAMP = 1


def _decode_combined_u8(rows: jnp.ndarray, c: int) -> jnp.ndarray:
    """Decode gathered u8 combined-material lanes to linear f32 BEFORE any
    filtering -- the D3D12 sRGB-typed-texture sampling order (per-texel
    decode, linear-space filter blend).

    The u8 atlas (round-5, textures/image.py encode_combined_u8) stores the
    color channels (base rgb 0:3, emissive 8:11 of each 16-channel block)
    on a GAMMA-2.0 byte curve and everything else as linear bytes -- the
    same 8-bit storage class as the reference's RGBA8/BC maps
    (``TextureLoader.cpp`` sRGB view promotion), on a dyadic curve whose
    decode is ONE multiply.  True sRGB bytes were measured on metal: the
    piecewise pow chain costs ~24 ms per 2M-pixel tap (transcendentals on
    every gathered lane), erasing the entire 25 ms gather saving; gamma-2.0
    is finer than sRGB8 below mid-grey and ~1 sRGB LSB coarser at white,
    i.e. still 8-bit-class error against the f32 path.  Every atlas layout
    interleaves texels as ``texel*C + channel``, so ``lane % C`` is the
    channel class; the decode is a single ELEMENTWISE chain (lane-mask
    select) that XLA fuses straight into the gather consumer."""
    x = rows.astype(jnp.float32) * jnp.float32(1.0 / 255.0)
    ch = np.arange(rows.shape[-1]) % c
    g2_lane = jnp.asarray((ch < 3) | ((ch >= 8) & (ch < 11)))
    return jnp.where(g2_lane, x * x, x)


def _rows_to_f32(rows: jnp.ndarray, c: int) -> jnp.ndarray:
    """Gathered atlas lanes -> linear f32 (u8 atlases decode, others cast).

    The u8 decode assumes COMBINED_C-interleaved material lanes (gamma-2
    color channels at ``lane % c`` in {0,1,2,8,9,10}); a u8 atlas with any
    other channel semantics must NOT route through here or its channels
    would silently get squared -- hence the hard check (ADVICE r5)."""
    if rows.dtype == jnp.uint8:
        assert c == 16 and rows.shape[-1] % c == 0, (
            "u8 atlas decode is defined only for COMBINED_C=16-interleaved "
            f"material rows, got lanes={rows.shape[-1]} c={c}"
        )
        return _decode_combined_u8(rows, c)
    return rows.astype(jnp.float32)


def gather_rows_onehot_matmul(
    table: jnp.ndarray,
    idx: jnp.ndarray,
    blk: int = 1024,
    interpret: bool = False,
) -> jnp.ndarray:
    """Row gather from a SMALL table as one-hot matmuls on the MXU.

    Per-request row gathers are request-bound (~5-6 ns each regardless of
    table size -- the round-5/6 gather law), so 2M requests cost ~11 ms
    even from a 128 KB env atlas.  For a VMEM-resident table, a
    (blk, rows) one-hot built in-kernel and contracted on the MXU does
    the same selection at matmul rates: 2M x 1024 x 128 bf16 MACs is
    ~1.4 ms of MXU time.  Exact: one-hot rows select single table rows,
    fp contraction with one nonzero per row reproduces the table value
    bit-for-bit at f32 accumulate for bf16/f32 tables.

    table: (rows, C); idx: any shape, i32 row indices (in range).
    Returns idx.shape + (C,) f32.  Use ONLY for small tables (the whole
    table must sit in VMEM: rows * C * itemsize <= ~4 MB).
    """
    import jax
    from jax.experimental import pallas as pl

    rows, c = table.shape
    assert rows * c * table.dtype.itemsize <= (4 << 20), (rows, c)
    shape = idx.shape
    flat = idx.reshape(-1).astype(jnp.int32)
    n = flat.shape[0]
    n_pad = -(-n // blk) * blk
    flat = jnp.pad(flat, (0, n_pad - n))

    # bf16 tables are exact in one MXU pass (the stored values ARE bf16);
    # f32 tables need the bf16x3 HIGHEST path -- TPU's DEFAULT precision is
    # a single bf16 pass that would round the gathered values
    prec = (
        jax.lax.Precision.DEFAULT if table.dtype == jnp.bfloat16
        else jax.lax.Precision.HIGHEST
    )

    def kernel(idx_ref, table_ref, out_ref):
        # 1D idx block (Mosaic: a (1, blk) 2D block trips the 8-sublane
        # tiling rule; the 1D lane-vector form does not)
        r = jax.lax.broadcasted_iota(jnp.int32, (blk, rows), 1)
        oh = (r == idx_ref[:][:, None]).astype(table_ref.dtype)
        out_ref[...] = jax.lax.dot_general(
            oh, table_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=prec,
        )

    out = pl.pallas_call(
        kernel,
        grid=(n_pad // blk,),
        in_specs=[
            pl.BlockSpec((blk,), lambda i: (i,)),
            pl.BlockSpec((rows, c), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((blk, c), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n_pad, c), jnp.float32),
        interpret=interpret,
    )(flat, table)
    return out[:n].reshape(*shape, c)


def _wrap_index(i: jnp.ndarray, size: jnp.ndarray, mode: int) -> jnp.ndarray:
    if mode == ADDRESS_WRAP:
        return jnp.mod(i, size)
    return jnp.clip(i, 0, size - 1)


def _edge_gated_uv_derivs(uv, same_tri_x, same_tri_y, same_tri_bx, same_tri_by,
                          uv_above, uv_below):
    """Screen-space UV derivatives that never cross a triangle edge: forward
    difference when the +x/+y neighbor is the same triangle, else backward
    difference when the -x/-y neighbor is, else 0 (the GPU quad-helper-lane
    analog).  An ungated backward fallback would read the OTHER triangle's
    (or an empty pixel's undefined) uv and produce garbage mips at
    silhouette pixels."""
    dx = jnp.diff(uv, axis=1, append=uv[:, -1:, :])
    dy = jnp.diff(uv, axis=0, append=uv[-1:, :, :] if uv_below is None else uv_below)
    bx = jnp.diff(uv, axis=1, prepend=uv[:, :1, :])
    by = jnp.diff(uv, axis=0, prepend=uv[:1, :, :] if uv_above is None else uv_above)
    zero = jnp.zeros_like(uv)
    dx = jnp.where(
        same_tri_x[..., None], dx,
        jnp.where(same_tri_bx[..., None], bx, zero) if same_tri_bx is not None else bx,
    )
    dy = jnp.where(
        same_tri_y[..., None], dy,
        jnp.where(same_tri_by[..., None], by, zero) if same_tri_by is not None else by,
    )
    return dx, dy


def uv_screen_lod(uv: jnp.ndarray, base_w: jnp.ndarray, base_h: jnp.ndarray,
                  same_tri_x: jnp.ndarray, same_tri_y: jnp.ndarray,
                  uv_above: jnp.ndarray | None = None,
                  uv_below: jnp.ndarray | None = None,
                  same_tri_bx: jnp.ndarray | None = None,
                  same_tri_by: jnp.ndarray | None = None) -> jnp.ndarray:
    """Per-pixel LOD from screen-space UV derivatives.

    uv: (H, W, 2).  base_w/base_h: (H, W) mip-0 texture size per pixel.
    same_tri_x/y: (H, W) bool -- whether the +x / +y neighbor belongs to the
    same triangle; same_tri_bx/by the same for the -x / -y neighbor
    (derivatives across triangle edges are garbage; we fall back to the
    other direction or 0, akin to GPU quad helper lanes).  When bx/by masks
    are None the backward difference is used ungated (legacy callers).

    uv_above/uv_below: (1, W, 2) optional true neighbor rows when uv is a
    row slab of a larger frame (sharded rendering); default = edge rows
    (the frame-boundary behavior).
    """
    dx, dy = _edge_gated_uv_derivs(
        uv, same_tri_x, same_tri_y, same_tri_bx, same_tri_by, uv_above, uv_below
    )
    sz = jnp.stack([base_w.astype(jnp.float32), base_h.astype(jnp.float32)], axis=-1)
    lx = jnp.sum((dx * sz) ** 2, axis=-1)
    ly = jnp.sum((dy * sz) ** 2, axis=-1)
    rho2 = jnp.maximum(lx, ly)
    return 0.5 * jnp.log2(jnp.maximum(rho2, 1e-12))


def footprint_lod(dx: jnp.ndarray, dy: jnp.ndarray,
                  base_w: jnp.ndarray, base_h: jnp.ndarray) -> jnp.ndarray:
    """Isotropic LOD from explicit uv derivatives (the footprint half of
    uv_screen_lod): max screen-axis footprint in texels, squared-log2."""
    sz = jnp.stack(
        [base_w.astype(jnp.float32), base_h.astype(jnp.float32)], axis=-1)
    lx = jnp.sum((dx * sz) ** 2, axis=-1)
    ly = jnp.sum((dy * sz) ** 2, axis=-1)
    rho2 = jnp.maximum(lx, ly)
    return 0.5 * jnp.log2(jnp.maximum(rho2, 1e-12))


def footprint_lod_aniso(dx: jnp.ndarray, dy: jnp.ndarray,
                        base_w: jnp.ndarray, base_h: jnp.ndarray,
                        max_aniso: int):
    """Anisotropic (lod, dmaj, extent) from explicit uv derivatives (the
    footprint half of uv_screen_lod_aniso)."""
    sz = jnp.stack(
        [base_w.astype(jnp.float32), base_h.astype(jnp.float32)], axis=-1)
    lx = jnp.sum((dx * sz) ** 2, axis=-1)
    ly = jnp.sum((dy * sz) ** 2, axis=-1)
    rho_maj = jnp.maximum(jnp.maximum(lx, ly), 1e-12)
    rho_min = jnp.maximum(jnp.minimum(lx, ly), 1e-12)
    n_eff = jnp.clip(jnp.sqrt(rho_maj / rho_min), 1.0, float(max_aniso))
    rho_eff = jnp.maximum(rho_min, rho_maj / (n_eff * n_eff))
    lod = 0.5 * jnp.log2(rho_eff)
    dmaj = jnp.where((lx >= ly)[..., None], dx, dy)
    extent = 1.0 - 1.0 / n_eff
    return lod, dmaj, extent


def uv_screen_lod_aniso(uv: jnp.ndarray, base_w: jnp.ndarray, base_h: jnp.ndarray,
                        same_tri_x: jnp.ndarray, same_tri_y: jnp.ndarray,
                        max_aniso: int,
                        uv_above: jnp.ndarray | None = None,
                        uv_below: jnp.ndarray | None = None,
                        same_tri_bx: jnp.ndarray | None = None,
                        same_tri_by: jnp.ndarray | None = None):
    """Anisotropic footprint: like ``uv_screen_lod`` but returns
    ``(lod, dmaj, extent)`` for an N-tap line filter along the major axis
    (the software analog of ``D3D12_FILTER_ANISOTROPIC``,
    ``Renderer.cpp`` material sampler):

    * ``lod`` is taken from the MINOR axis, clamped so the implied
      anisotropy never exceeds ``max_aniso`` (no under-filtering),
    * ``dmaj`` is the uv-space derivative along the major axis,
    * ``extent`` in [0, 1) scales the tap offsets; 0 when the footprint is
      isotropic, so N identical taps reduce exactly to the trilinear
      sample (tested).
    """
    dx, dy = _edge_gated_uv_derivs(
        uv, same_tri_x, same_tri_y, same_tri_bx, same_tri_by, uv_above, uv_below
    )
    sz = jnp.stack([base_w.astype(jnp.float32), base_h.astype(jnp.float32)], axis=-1)
    lx = jnp.sum((dx * sz) ** 2, axis=-1)
    ly = jnp.sum((dy * sz) ** 2, axis=-1)
    rho_maj = jnp.maximum(jnp.maximum(lx, ly), 1e-12)
    rho_min = jnp.maximum(jnp.minimum(lx, ly), 1e-12)
    n_eff = jnp.clip(jnp.sqrt(rho_maj / rho_min), 1.0, float(max_aniso))
    # minor-axis LOD, floored so footprint/N taps still covers the major axis
    rho_eff = jnp.maximum(rho_min, rho_maj / (n_eff * n_eff))
    lod = 0.5 * jnp.log2(rho_eff)
    dmaj = jnp.where((lx >= ly)[..., None], dx, dy)
    extent = 1.0 - 1.0 / n_eff
    return lod, dmaj, extent


def apply_texture_transform(uv: jnp.ndarray, offset_scale: jnp.ndarray, rotation: jnp.ndarray) -> jnp.ndarray:
    """KHR_texture_transform as the shaders apply it
    (``DeferredBasePass.hlsl:49-56``): scale, rotate, offset.

    offset_scale: (..., 4) = (off.x, off.y, scale.x, scale.y)
    rotation: (..., 2) = (cos, sin)
    """
    scaled = uv * offset_scale[..., 2:4]
    cos_r = rotation[..., 0]
    sin_r = rotation[..., 1]
    rot = jnp.stack(
        [
            scaled[..., 0] * cos_r - scaled[..., 1] * sin_r,
            scaled[..., 0] * sin_r + scaled[..., 1] * cos_r,
        ],
        axis=-1,
    )
    return rot + offset_scale[..., 0:2]


def cube_direction_to_face_uv(direction: jnp.ndarray):
    """D3D cubemap addressing: direction (..., 3) -> (face (...,) i32,
    uv (..., 2) in [0,1]).  Face order +X,-X,+Y,-Y,+Z,-Z."""
    x, y, z = direction[..., 0], direction[..., 1], direction[..., 2]
    ax, ay, az = jnp.abs(x), jnp.abs(y), jnp.abs(z)

    is_x = (ax >= ay) & (ax >= az)
    is_y = (~is_x) & (ay >= az)
    is_z = ~(is_x | is_y)

    face = jnp.where(
        is_x,
        jnp.where(x >= 0, 0, 1),
        jnp.where(is_y, jnp.where(y >= 0, 2, 3), jnp.where(z >= 0, 4, 5)),
    ).astype(jnp.int32)

    ma = jnp.where(is_x, ax, jnp.where(is_y, ay, az))
    ma = jnp.maximum(ma, 1e-20)
    # D3D face (u, v) conventions (D3D11 spec 18.9 "Cube Map Face Fetch")
    u = jnp.where(
        is_x,
        jnp.where(x >= 0, -z, z),
        jnp.where(is_y, x, jnp.where(z >= 0, x, -x)),
    )
    v = jnp.where(is_x, -y, jnp.where(is_y, jnp.where(y >= 0, z, -z), -y))
    uv = jnp.stack([(u / ma + 1.0) * 0.5, (v / ma + 1.0) * 0.5], axis=-1)
    return face, uv



# ---------------------------------------------------------------------------
# Quad-tap sampling: one gather per bilinear tap.
#
# The quad atlas (textures/atlas.py build_pyramid_quad_atlas) stores each
# texel's full 2x2 bilinear footprint in one row and sampling fetches it with
# a single row gather.  Wrap for the +1 neighbors is baked into the quads at
# build time.  Measured TPU gather costs (2M rows, big table): row width
# matters less than its shape -- bf16 64-wide ~ bf16 16-wide ~ half of f32
# 16-wide, while NON-power-of-two widths (44, 48) are ~2.3x slower.  Keep
# quad rows a power of two and in bf16.
# ---------------------------------------------------------------------------


_MIP_RECT_LEVELS = 14


def _pyramid_rect(rect0, level):
    """rect0: (..., 4) float (x0, y0, w0, h0); level: (...,) int32 ->
    (x, y, w, h) of that mip, level clamped to the chain length.

    Mip L of a pow2 texture sits at x-offset 2*(w0 - (w0 >> L)) in the
    pyramid atlas row (textures/atlas.py build_pyramid_quad_atlas), so the
    rect computes with shifts -- no per-pixel table lookups.
    """
    x0 = rect0[..., 0].astype(jnp.int32)
    y0 = rect0[..., 1].astype(jnp.int32)
    w0 = rect0[..., 2].astype(jnp.int32)
    h0 = rect0[..., 3].astype(jnp.int32)
    mx = jnp.maximum(w0, h0).astype(jnp.float32)
    lmax = jnp.round(jnp.log2(jnp.maximum(mx, 1.0))).astype(jnp.int32)
    lv = jnp.clip(level, 0, lmax)
    w = jnp.maximum(w0 >> lv, 1)
    h = jnp.maximum(h0 >> lv, 1)
    # Tail levels of tall (h0 > w0) textures all have w == 1; each sits one
    # extra column right (must match textures/atlas.py build_pyramid_quad_atlas).
    lw = jnp.round(jnp.log2(jnp.maximum(w0.astype(jnp.float32), 1.0))).astype(jnp.int32)
    x = x0 + 2 * (w0 - w) + jnp.maximum(lv - lw, 0)
    return x, y0, w, h


def sample_pyramid_bilinear(
    quad_flat: jnp.ndarray,
    atlas_width: int,
    rect0: jnp.ndarray,
    uv: jnp.ndarray,
    level: jnp.ndarray,
    address_mode: int = ADDRESS_WRAP,
) -> jnp.ndarray:
    """One bilinear tap = one quad-record gather; mip rect arithmetic.

    quad_flat is (H*W, 4*C): the 2x2 footprint of a C-channel texture
    (corner order TL, TR, BL, BR) -- C=4 for single textures, C=16 for the
    combined material atlas (keep 4*C a power of two: non-pow2 gather row
    widths are ~2.3x slower). Returns (..., C)."""
    c = quad_flat.shape[-1] // 4
    x, y, w, h = _pyramid_rect(rect0, level)
    tx = uv[..., 0] * w.astype(jnp.float32) - 0.5
    ty = uv[..., 1] * h.astype(jnp.float32) - 0.5
    if address_mode == ADDRESS_CLAMP:
        # D3D clamps each tap: below half a texel both taps land on texel 0,
        # so the blend fraction must die out (clamping only the index would
        # wrongly blend texels 0 and 1 there).
        tx = jnp.clip(tx, 0.0, w.astype(jnp.float32) - 1.0)
        ty = jnp.clip(ty, 0.0, h.astype(jnp.float32) - 1.0)
    fx0 = jnp.floor(tx)
    fy0 = jnp.floor(ty)
    fx = (tx - fx0)[..., None]
    fy = (ty - fy0)[..., None]
    ix = _wrap_index(fx0.astype(jnp.int32), w, address_mode)
    iy = _wrap_index(fy0.astype(jnp.int32), h, address_mode)
    flat = (y + iy) * atlas_width + (x + ix)
    quad = _rows_to_f32(jnp.take(quad_flat, flat, axis=0), c)
    top = quad[..., 0:c] * (1.0 - fx) + quad[..., c : 2 * c] * fx
    bot = quad[..., 2 * c : 3 * c] * (1.0 - fx) + quad[..., 3 * c :] * fx
    return top * (1.0 - fy) + bot * fy


def sample_table_bilinear_matmul(
    table: jnp.ndarray, uv: jnp.ndarray
) -> jnp.ndarray:
    """Bilinear sample of a SMALL table via hat-function matmuls -- no gather.

    Small-table gathers hit a pathological XLA path on TPU (measured 146 ms
    for a 16 KB table at 2M indices), but a dense (P, TW) @ (TW, TH*C)
    matmul runs on the MXU in ~1 ms.  Bilinear weights are hat functions
    max(0, 1 - |t - i|), which reproduce 2-tap linear filtering exactly.
    CLAMP addressing, half-texel centers (D3D SampleLevel mip-0 semantics).

    table: (TH, TW, C) traced; uv: (..., 2) in [0, 1].  Returns (..., C).
    Use for the BRDF LUT and env irradiance tail; cost scales with TH*TW*C,
    so keep tables at most a few thousand entries.
    """
    th, tw, c = table.shape
    shape = uv.shape[:-1]
    tx = jnp.clip(uv[..., 0] * tw - 0.5, 0.0, tw - 1.0).reshape(-1)
    ty = jnp.clip(uv[..., 1] * th - 0.5, 0.0, th - 1.0).reshape(-1)
    ix = jnp.arange(tw, dtype=jnp.float32)
    iy = jnp.arange(th, dtype=jnp.float32)
    wx = jnp.maximum(0.0, 1.0 - jnp.abs(tx[:, None] - ix[None, :]))  # (P, TW)
    wy = jnp.maximum(0.0, 1.0 - jnp.abs(ty[:, None] - iy[None, :]))  # (P, TH)
    # rows first: (P, TW) @ (TW, TH*C), then the column mix elementwise.
    # HIGHEST precision: TPU's DEFAULT is one bf16 pass, which would round
    # the hat weights/table and break the "exact 2-tap bilinear" contract
    # on metal (the same latent bug the round-6 parity gate caught in the
    # raster's record matmuls).
    z = jnp.matmul(
        wx, table.transpose(1, 0, 2).reshape(tw, th * c),
        precision=jax.lax.Precision.HIGHEST,
    )  # (P, TH*C)
    out = jnp.sum(z.reshape(-1, th, c) * wy[..., None], axis=1)
    return out.reshape(shape + (c,))


def sample_cube_tail_matmul(
    tail: jnp.ndarray, direction: jnp.ndarray
) -> jnp.ndarray:
    """Cubemap bilinear sample of a small per-face tail table (the
    reference's SampleLevel(maxMip) irradiance fetch,
    ``DeferredLighting.hlsl:85-87``) -- per-face hat matmuls + face select,
    no gathers.  tail: (6, TH, TW, C); direction: (..., 3)."""
    face, uv = cube_direction_to_face_uv(direction)
    out = sample_table_bilinear_matmul(tail[0], uv)
    for f in range(1, 6):
        out = jnp.where(
            (face == f)[..., None], sample_table_bilinear_matmul(tail[f], uv), out
        )
    return out


def sample_pyramid_trilinear(
    quad_flat: jnp.ndarray,
    atlas_width: int,
    rect0: jnp.ndarray,
    uv: jnp.ndarray,
    lod: jnp.ndarray,
    address_mode: int = ADDRESS_WRAP,
) -> jnp.ndarray:
    lod = jnp.maximum(lod, 0.0)
    l0 = jnp.floor(lod).astype(jnp.int32)
    frac = jnp.clip(lod - l0.astype(jnp.float32), 0.0, 1.0)[..., None]
    a = sample_pyramid_bilinear(quad_flat, atlas_width, rect0, uv, l0, address_mode)
    b = sample_pyramid_bilinear(quad_flat, atlas_width, rect0, uv, l0 + 1, address_mode)
    return a * (1.0 - frac) + b * frac


def sample_pyramid_tri(
    tri_flat: jnp.ndarray,
    atlas_width: int,
    rect0: jnp.ndarray,
    uv: jnp.ndarray,
    lod: jnp.ndarray,
    address_mode: int = ADDRESS_WRAP,
    select_kernel: bool = False,
    interpret: bool = False,
) -> jnp.ndarray:
    """Trilinear pyramid sample with ONE row gather over the packed
    atlas (textures/atlas.py build_pyramid_tri_atlas): lanes 0:4C of the
    gathered row are the mip-L bilinear quad, lanes 4C:13C the parent
    texel's 3x3 at mip L+1, from which the second tap's 2x2 footprint is a
    lane select.  Bit-exact vs ``sample_pyramid_trilinear`` on the
    matching quad atlas (same stored texels, same blend order).

    tri_flat: (H*W, 16C); returns (..., C).  WRAP: the base-index relation
    is computed on UNwrapped floors (ix2_raw - (ix_raw >> 1) in {-1, 0} is
    pure arithmetic while the level width halves), then the window content
    -- built with wrap padding -- lands the wrapped texels; on a saturated
    axis (w == 1 tail) every window column is the same texel, so the
    clipped select stays exact.
    """
    c = tri_flat.shape[-1] // 16
    lod = jnp.maximum(lod, 0.0)
    l0 = jnp.floor(lod).astype(jnp.int32)
    frac = jnp.clip(lod - l0.astype(jnp.float32), 0.0, 1.0)[..., None]

    # --- tap a: mip l0, from the row's own quad (lanes 0:4C) ---
    x, y, w, h = _pyramid_rect(rect0, l0)
    wf = w.astype(jnp.float32)
    hf = h.astype(jnp.float32)
    tx = uv[..., 0] * wf - 0.5
    ty = uv[..., 1] * hf - 0.5
    if address_mode == ADDRESS_CLAMP:
        tx = jnp.clip(tx, 0.0, wf - 1.0)
        ty = jnp.clip(ty, 0.0, hf - 1.0)
    fx0 = jnp.floor(tx)
    fy0 = jnp.floor(ty)
    fx = (tx - fx0)[..., None]
    fy = (ty - fy0)[..., None]
    ix_raw = fx0.astype(jnp.int32)
    iy_raw = fy0.astype(jnp.int32)
    ix = _wrap_index(ix_raw, w, address_mode)
    iy = _wrap_index(iy_raw, h, address_mode)
    if select_kernel and c == 16:
        # VMEM decode path (_mat_select_kernel): all select parameters are
        # pre-gather arithmetic, so the row gather is emitted directly in
        # the kernel's block shape and the u8 decode + quad/3x3 blends run
        # on resident data
        _, _, w2k, h2k = _pyramid_rect(rect0, l0 + 1)
        tx2k = uv[..., 0] * w2k.astype(jnp.float32) - 0.5
        ty2k = uv[..., 1] * h2k.astype(jnp.float32) - 0.5
        if address_mode == ADDRESS_CLAMP:
            tx2k = jnp.clip(tx2k, 0.0, w2k.astype(jnp.float32) - 1.0)
            ty2k = jnp.clip(ty2k, 0.0, h2k.astype(jnp.float32) - 1.0)
        fx20k = jnp.floor(tx2k)
        fy20k = jnp.floor(ty2k)
        ix2k = fx20k.astype(jnp.int32)
        iy2k = fy20k.astype(jnp.int32)
        lead = uv.shape[:-1]
        params7 = jnp.stack([
            (tx - fx0), (ty - fy0),
            (tx2k - fx20k), (ty2k - fy20k),
            frac[..., 0],
            jnp.clip(ix2k - (ix_raw >> 1) + 1, 0, 1).astype(jnp.float32),
            jnp.clip(iy2k - (iy_raw >> 1) + 1, 0, 1).astype(jnp.float32),
        ]).reshape(7, -1)
        rows_idx = ((y + iy) * atlas_width + (x + ix)).reshape(-1)
        out = _mat_select_call(
            tri_flat, rows_idx, params7, c, interpret=interpret)
        return out.reshape(lead + (c,))
    # SELECT-THEN-DECODE (round 5): the 3x3 window selects commute exactly
    # with the per-element u8/bf16 decode (selects move values; the decode
    # is per-texel), so they run on the RAW rows and only the winning 8c
    # lanes decode to f32 -- instead of all 13c (2 GB of materialized f32
    # rows per tap at the 256-lane sponza tier; round-5 MaterialTap dump).
    row = jnp.take(tri_flat, (y + iy) * atlas_width + (x + ix), axis=0)
    quad = _rows_to_f32(row[..., 0 : 4 * c], c)
    top = quad[..., 0:c] * (1.0 - fx) + quad[..., c : 2 * c] * fx
    bot = quad[..., 2 * c : 3 * c] * (1.0 - fx) + quad[..., 3 * c :] * fx
    a = top * (1.0 - fy) + bot * fy

    # --- tap b: mip l0+1, reconstructed from the packed parent 3x3 ---
    _, _, w2, h2 = _pyramid_rect(rect0, l0 + 1)
    w2f = w2.astype(jnp.float32)
    h2f = h2.astype(jnp.float32)
    tx2 = uv[..., 0] * w2f - 0.5
    ty2 = uv[..., 1] * h2f - 0.5
    if address_mode == ADDRESS_CLAMP:
        tx2 = jnp.clip(tx2, 0.0, w2f - 1.0)
        ty2 = jnp.clip(ty2, 0.0, h2f - 1.0)
    fx20 = jnp.floor(tx2)
    fy20 = jnp.floor(ty2)
    fx2 = (tx2 - fx20)[..., None]
    fy2 = (ty2 - fy20)[..., None]
    ix2_raw = fx20.astype(jnp.int32)
    iy2_raw = fy20.astype(jnp.int32)
    # 3x3 window column/row of the base corner: parent p = i>>1, base in
    # {p-1, p} -> col = i2 - (p - 1) in {0, 1}; the clip covers the
    # saturated tail (w == w2), where the window is uniform anyway
    cox = jnp.clip(ix2_raw - (ix_raw >> 1) + 1, 0, 1)[..., None]
    roy = jnp.clip(iy2_raw - (iy_raw >> 1) + 1, 0, 1)[..., None]
    r3 = row[..., 4 * c : 13 * c].reshape(row.shape[:-1] + (3, 3, c))
    win_t = jnp.where(cox[..., None] == 0, r3[..., 0, 0:2, :], r3[..., 0, 1:3, :])
    win_m = jnp.where(cox[..., None] == 0, r3[..., 1, 0:2, :], r3[..., 1, 1:3, :])
    win_b = jnp.where(cox[..., None] == 0, r3[..., 2, 0:2, :], r3[..., 2, 1:3, :])
    row_top = jnp.where(roy[..., None] == 0, win_t, win_m)
    row_bot = jnp.where(roy[..., None] == 0, win_m, win_b)
    rt = _rows_to_f32(row_top.reshape(row_top.shape[:-2] + (2 * c,)), c)
    rb = _rows_to_f32(row_bot.reshape(row_bot.shape[:-2] + (2 * c,)), c)
    top2 = rt[..., 0:c] * (1.0 - fx2) + rt[..., c:] * fx2
    bot2 = rb[..., 0:c] * (1.0 - fx2) + rb[..., c:] * fx2
    b = top2 * (1.0 - fy2) + bot2 * fy2

    return a * (1.0 - frac) + b * frac


def _mat_select_kernel(rows_ref, par_ref, out_ref, *, c):
    """Packed-trilinear MATERIAL decode in VMEM (the sample_pyramid_tri
    tail): u8->f32 + gamma-2 decode, tap-a quad blend, tap-b 2x2-of-3x3
    window select + blend, mip lerp -- one streaming pass over the gathered
    256-lane rows.  Like _env_select_kernel this is lane-sparse (16-lane
    groups of a 256-lane row), so measure before defaulting on
    (RenderSettings.mat_select_kernel)."""
    rows = rows_ref[0]
    if rows.dtype == jnp.uint8:
        import jax as _jax

        x = rows.astype(jnp.int32).astype(jnp.float32) * jnp.float32(1.0 / 255.0)
        ch = _jax.lax.broadcasted_iota(jnp.int32, rows.shape, 1) % c
        g2 = (ch < 3) | ((ch >= 8) & (ch < 11))
        rows = jnp.where(g2, x * x, x)
    elif rows.dtype != jnp.float32:
        rows = rows.astype(jnp.float32)
    p = par_ref[0]
    col = lambda i: p[i, :][:, None]
    fx, fy, fx2, fy2, frac = col(0), col(1), col(2), col(3), col(4)
    cox0 = col(5) < 0.5
    roy0 = col(6) < 0.5

    def lc(i):
        return rows[:, i * c : (i + 1) * c]

    top = lc(0) * (1.0 - fx) + lc(1) * fx
    bot = lc(2) * (1.0 - fx) + lc(3) * fx
    a = top * (1.0 - fy) + bot * fy

    def r3(j, i):
        return lc(4 + j * 3 + i)

    row_top_l = jnp.where(roy0, jnp.where(cox0, r3(0, 0), r3(0, 1)),
                          jnp.where(cox0, r3(1, 0), r3(1, 1)))
    row_top_r = jnp.where(roy0, jnp.where(cox0, r3(0, 1), r3(0, 2)),
                          jnp.where(cox0, r3(1, 1), r3(1, 2)))
    row_bot_l = jnp.where(roy0, jnp.where(cox0, r3(1, 0), r3(1, 1)),
                          jnp.where(cox0, r3(2, 0), r3(2, 1)))
    row_bot_r = jnp.where(roy0, jnp.where(cox0, r3(1, 1), r3(1, 2)),
                          jnp.where(cox0, r3(2, 1), r3(2, 2)))
    top2 = row_top_l * (1.0 - fx2) + row_top_r * fx2
    bot2 = row_bot_l * (1.0 - fx2) + row_bot_r * fx2
    b = top2 * (1.0 - fy2) + bot2 * fy2
    out_ref[0] = a * (1.0 - frac) + b * frac


def _mat_select_call(tri_flat, rows_idx, params7, c, interpret=False):
    """Gather packed material rows in the kernel's block shape and decode
    in VMEM.  rows_idx: (N,) i32; params7: (7, N) f32
    [fx, fy, fx2, fy2, frac, cox, roy].  Returns (N, c) f32."""
    import jax
    from jax.experimental import pallas as pl

    n = rows_idx.shape[0]
    pix = 1024
    n_pad = -(-n // pix) * pix
    idx_p = jnp.pad(rows_idx, (0, n_pad - n)).reshape(-1, pix)
    rows_p = tri_flat[idx_p]               # (grid, pix, L) -- u8 stays u8
    par_p = jnp.pad(params7, ((0, 0), (0, n_pad - n))).reshape(
        7, -1, pix).transpose(1, 0, 2)     # (grid, 7, pix)
    grid = n_pad // pix
    lanes_n = tri_flat.shape[-1]
    import functools

    out = pl.pallas_call(
        functools.partial(_mat_select_kernel, c=c),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((1, pix, lanes_n), lambda g: (g, 0, 0)),
            pl.BlockSpec((1, 7, pix), lambda g: (g, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, pix, c), lambda g: (g, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((grid, pix, c), jnp.float32),
        interpret=interpret,
    )(rows_p, par_p)
    return out.reshape(n_pad, c)[:n]


def sample_pyramid_tri_level(
    tri_flat: jnp.ndarray,
    atlas_width: int,
    rect0: jnp.ndarray,
    uv: jnp.ndarray,
    level: jnp.ndarray,
    address_mode: int = ADDRESS_WRAP,
) -> jnp.ndarray:
    """Single bilinear tap at an integer mip over the PACKED tri atlas
    (lanes 0:4C are exactly the quad atlas) -- serves the bilinear filter
    mode on a packed-trilinear material atlas without a second layout."""
    c = tri_flat.shape[-1] // 16
    x, y, w, h = _pyramid_rect(rect0, level)
    tx = uv[..., 0] * w.astype(jnp.float32) - 0.5
    ty = uv[..., 1] * h.astype(jnp.float32) - 0.5
    if address_mode == ADDRESS_CLAMP:
        tx = jnp.clip(tx, 0.0, w.astype(jnp.float32) - 1.0)
        ty = jnp.clip(ty, 0.0, h.astype(jnp.float32) - 1.0)
    fx0 = jnp.floor(tx)
    fy0 = jnp.floor(ty)
    fx = (tx - fx0)[..., None]
    fy = (ty - fy0)[..., None]
    ix = _wrap_index(fx0.astype(jnp.int32), w, address_mode)
    iy = _wrap_index(fy0.astype(jnp.int32), h, address_mode)
    quad = _rows_to_f32(
        jnp.take(tri_flat, (y + iy) * atlas_width + (x + ix), axis=0)[
            ..., 0 : 4 * c
        ],
        c,
    )
    top = quad[..., 0:c] * (1.0 - fx) + quad[..., c : 2 * c] * fx
    bot = quad[..., 2 * c : 3 * c] * (1.0 - fx) + quad[..., 3 * c :] * fx
    return top * (1.0 - fy) + bot * fy


def sample_cube_pyramid(
    env_quad_flat: jnp.ndarray,
    atlas_width: int,
    face_rect0,
    direction: jnp.ndarray,
    lod: jnp.ndarray,
) -> jnp.ndarray:
    """Cubemap sampling over the pyramid atlas.  face_rect0: (6, 4) traced
    array; the per-pixel face select uses 6 static slices + where (no
    gather)."""
    rect, uv = _cube_face_rect(face_rect0, direction)
    lod = jnp.maximum(lod, 0.0)
    l0 = jnp.floor(lod).astype(jnp.int32)
    frac = jnp.clip(lod - l0.astype(jnp.float32), 0.0, 1.0)[..., None]
    a = sample_pyramid_bilinear(env_quad_flat, atlas_width, rect, uv, l0, ADDRESS_CLAMP)
    b = sample_pyramid_bilinear(env_quad_flat, atlas_width, rect, uv, l0 + 1, ADDRESS_CLAMP)
    return a * (1.0 - frac) + b * frac


def _cube_face_rect(face_rect0, direction):
    """Shared cube face select: direction -> (rect (..., 4) f32, uv)."""
    face, uv = cube_direction_to_face_uv(direction)
    rect = jnp.zeros(face.shape + (4,), jnp.float32)
    for f in range(6):
        rect = jnp.where(
            (face == f)[..., None], face_rect0[f].astype(jnp.float32), rect
        )
    return rect, uv


def sample_cube_pyramid_tri(
    env_tri_flat: jnp.ndarray,
    atlas_width: int,
    face_rect0,
    direction: jnp.ndarray,
    lod: jnp.ndarray,
    matmul_gather: bool = False,
    select_kernel: bool = False,
    interpret: bool = False,
) -> jnp.ndarray:
    """Trilinear cubemap sample with ONE row gather (the packed-trilinear
    atlas, textures/atlas.py build_pyramid_tri_atlas): lanes 0:16 of the
    gathered row are the mip-L bilinear quad, lanes 16:52 the parent texel's
    3x3 at mip L+1, from which the second tap's 2x2 footprint is a cheap
    lane select (base index is always parent-1 or parent).  Bit-exact vs
    ``sample_cube_pyramid`` on the two-gather quad atlas (same stored bf16
    texels, same blend order); reference semantics: trilinear prefiltered
    env fetch, ``DeferredLighting.hlsl:76-91``.

    env_tri_flat: (H*W, 64); face_rect0: (6, 4); returns (..., 4) f32.
    """
    rect, uv = _cube_face_rect(face_rect0, direction)
    lod = jnp.maximum(lod, 0.0)
    l0 = jnp.floor(lod).astype(jnp.int32)
    frac = jnp.clip(lod - l0.astype(jnp.float32), 0.0, 1.0)[..., None]

    seamless = env_tri_flat.shape[-1] >= 128  # cube=True rows carry borders

    # --- tap a: mip l0.  SEAMLESS addressing: the base index runs the full
    # [-1, w-1] bilinear range (uv in [0,1] exactly for cube directions);
    # the +1 side blends into the cross-face texels baked into the quad
    # channels, the -1 side selects the baked border lanes (L/T/corner/
    # L2/T2, textures/atlas.py build_pyramid_tri_atlas cube=True) -- the
    # D3D12 seamless-cube behavior with the SAME single gather.  Legacy
    # 64-lane atlases keep the old CLAMP path. ---
    x, y, w, h = _pyramid_rect(rect, l0)
    wf = w.astype(jnp.float32)
    hf = h.astype(jnp.float32)
    if seamless:
        tx = uv[..., 0] * wf - 0.5
        ty = uv[..., 1] * hf - 0.5
    else:
        tx = jnp.clip(uv[..., 0] * wf - 0.5, 0.0, wf - 1.0)
        ty = jnp.clip(uv[..., 1] * hf - 0.5, 0.0, hf - 1.0)
    fx0 = jnp.floor(tx)
    fy0 = jnp.floor(ty)
    fx = (tx - fx0)[..., None]
    fy = (ty - fy0)[..., None]
    ix_raw = fx0.astype(jnp.int32)
    iy_raw = fy0.astype(jnp.int32)
    ix = _wrap_index(ix_raw, w, ADDRESS_CLAMP)
    iy = _wrap_index(iy_raw, h, ADDRESS_CLAMP)
    env_rows = (y + iy) * atlas_width + (x + ix)
    if select_kernel and seamless and not matmul_gather:
        # VMEM decode path: every per-pixel select parameter is computable
        # BEFORE the gather, so the row gather is emitted directly in the
        # kernel's block shape and the whole seamless decode runs on
        # resident data (_env_select_kernel)
        _, _, w2k, h2k = _pyramid_rect(rect, l0 + 1)
        tx2k = uv[..., 0] * w2k.astype(jnp.float32) - 0.5
        ty2k = uv[..., 1] * h2k.astype(jnp.float32) - 0.5
        fx20k = jnp.floor(tx2k)
        fy20k = jnp.floor(ty2k)
        ix2k = fx20k.astype(jnp.int32)
        iy2k = fy20k.astype(jnp.int32)
        lead = uv.shape[:-1]
        params9 = jnp.stack([
            (tx - fx0), (ty - fy0),
            (tx2k - fx20k), (ty2k - fy20k),
            frac[..., 0],
            (ix_raw < 0).astype(jnp.float32),
            (iy_raw < 0).astype(jnp.float32),
            (ix2k - (ix >> 1) + 1).astype(jnp.float32),
            (iy2k - (iy >> 1) + 1).astype(jnp.float32),
        ]).reshape(9, -1)
        out = _env_select_call(
            env_tri_flat, env_rows.reshape(-1), params9,
            interpret=interpret)
        return out.reshape(lead + (4,))
    table_bytes = env_tri_flat.shape[0] * env_tri_flat.shape[-1] * env_tri_flat.dtype.itemsize
    if matmul_gather and table_bytes <= (4 << 20):
        # env atlases are small (~1-2k rows): the MXU one-hot gather beats
        # the per-request row gather (gather_rows_onehot_matmul); larger
        # tables fall back to the plain gather (VMEM residency cap)
        row = gather_rows_onehot_matmul(env_tri_flat, env_rows,
                                        interpret=interpret)
    else:
        # SELECT-THEN-DECODE: border/window selects commute exactly with
        # the per-element bf16->f32 convert, so they run on the RAW rows
        # and only the winning lane groups convert (the full-row convert
        # alone cost 2.45 ms/frame -- round-5 IBLAmbient op dump)
        row = jnp.take(env_tri_flat, env_rows, axis=0)
    quad = row[..., 0:16]
    q00, q10 = quad[..., 0:4], quad[..., 4:8]
    q01, q11 = quad[..., 8:12], quad[..., 12:16]
    if seamless:
        m_ix = (ix_raw < 0)[..., None]
        m_iy = (iy_raw < 0)[..., None]
        bl_, bt_, bc_ = row[..., 52:56], row[..., 56:60], row[..., 60:64]
        bl2, bt2 = row[..., 64:68], row[..., 68:72]
        tl = jnp.where(m_ix & m_iy, bc_, jnp.where(m_ix, bl_, jnp.where(m_iy, bt_, q00)))
        tr = jnp.where(m_ix & m_iy, bt_, jnp.where(m_ix, q00, jnp.where(m_iy, bt2, q10)))
        bl = jnp.where(m_ix & m_iy, bl_, jnp.where(m_ix, bl2, jnp.where(m_iy, q00, q01)))
        br = jnp.where(m_ix & m_iy, q00, jnp.where(m_ix, q01, jnp.where(m_iy, q10, q11)))
    else:
        tl, tr, bl, br = q00, q10, q01, q11
    tl, tr, bl, br = (v.astype(jnp.float32) for v in (tl, tr, bl, br))
    a = (tl * (1.0 - fx) + tr * fx) * (1.0 - fy) + (bl * (1.0 - fx) + br * fx) * fy

    # --- tap b: mip l0+1, reconstructed from the packed parent 3x3 (whose
    # border cells are cross-face under cube=True, so it is seamless for
    # free) ---
    _, _, w2, h2 = _pyramid_rect(rect, l0 + 1)
    w2f = w2.astype(jnp.float32)
    h2f = h2.astype(jnp.float32)
    if seamless:
        tx2 = uv[..., 0] * w2f - 0.5
        ty2 = uv[..., 1] * h2f - 0.5
    else:
        tx2 = jnp.clip(uv[..., 0] * w2f - 0.5, 0.0, w2f - 1.0)
        ty2 = jnp.clip(uv[..., 1] * h2f - 0.5, 0.0, h2f - 1.0)
    fx20 = jnp.floor(tx2)
    fy20 = jnp.floor(ty2)
    fx2 = (tx2 - fx20)[..., None]
    fy2 = (ty2 - fy20)[..., None]
    ix2 = fx20.astype(jnp.int32) if seamless else _wrap_index(
        fx20.astype(jnp.int32), w2, ADDRESS_CLAMP)
    iy2 = fy20.astype(jnp.int32) if seamless else _wrap_index(
        fy20.astype(jnp.int32), h2, ADDRESS_CLAMP)
    # 3x3 window column/row of the base corner: parent p = i>>1, base in
    # {p-1, p} -> col = i2 - (p - 1) in {0, 1} (1 when clamped at the edge)
    cox = (ix2 - (ix >> 1) + 1)[..., None]
    roy = (iy2 - (iy >> 1) + 1)[..., None]
    r3 = row[..., 16:52].reshape(row.shape[:-1] + (3, 3, 4))
    win_t = jnp.where(cox[..., None] == 0, r3[..., 0, 0:2, :], r3[..., 0, 1:3, :])
    win_m = jnp.where(cox[..., None] == 0, r3[..., 1, 0:2, :], r3[..., 1, 1:3, :])
    win_b = jnp.where(cox[..., None] == 0, r3[..., 2, 0:2, :], r3[..., 2, 1:3, :])
    row_top = jnp.where(roy[..., None] == 0, win_t, win_m).astype(jnp.float32)
    row_bot = jnp.where(roy[..., None] == 0, win_m, win_b).astype(jnp.float32)
    top2 = row_top[..., 0, :] * (1.0 - fx2) + row_top[..., 1, :] * fx2
    bot2 = row_bot[..., 0, :] * (1.0 - fx2) + row_bot[..., 1, :] * fx2
    b = top2 * (1.0 - fy2) + bot2 * fy2

    return a * (1.0 - frac) + b * frac


def _env_select_kernel(rows_ref, par_ref, out_ref):
    """Seamless packed-env decode in VMEM: tap-a 2x2 (with baked cross-face
    border lanes) + tap-b 2x2 from the parent 3x3, blended to one RGBA per
    pixel.  NOTE round-5 metal: measured a LOSS in-frame (16.9 ms vs XLA's
    ~8 ms chain) -- the decode works on 4-lane channel groups, so every VPU
    op wastes 31/32 lanes.  Kept for a future lane-transposed formulation;
    default OFF (RenderSettings.env_select_kernel)."""
    rows = rows_ref[0]
    if rows.dtype != jnp.float32:
        rows = rows.astype(jnp.float32)
    p = par_ref[0]
    col = lambda i: p[i, :][:, None]
    fx, fy, fx2, fy2, frac = col(0), col(1), col(2), col(3), col(4)
    m_ix = col(5) > 0.5
    m_iy = col(6) > 0.5
    cox0 = col(7) < 0.5
    roy0 = col(8) < 0.5

    def lane4(i):
        return rows[:, i : i + 4]

    q00, q10, q01, q11 = lane4(0), lane4(4), lane4(8), lane4(12)
    bl_, bt_, bc_ = lane4(52), lane4(56), lane4(60)
    bl2, bt2 = lane4(64), lane4(68)
    tl = jnp.where(m_ix & m_iy, bc_, jnp.where(m_ix, bl_, jnp.where(m_iy, bt_, q00)))
    tr = jnp.where(m_ix & m_iy, bt_, jnp.where(m_ix, q00, jnp.where(m_iy, bt2, q10)))
    bl = jnp.where(m_ix & m_iy, bl_, jnp.where(m_ix, bl2, jnp.where(m_iy, q00, q01)))
    br = jnp.where(m_ix & m_iy, q00, jnp.where(m_ix, q01, jnp.where(m_iy, q10, q11)))
    a = (tl * (1.0 - fx) + tr * fx) * (1.0 - fy) + (bl * (1.0 - fx) + br * fx) * fy

    def r3(j, i):
        return lane4(16 + (j * 3 + i) * 4)

    row_top_l = jnp.where(roy0, jnp.where(cox0, r3(0, 0), r3(0, 1)),
                          jnp.where(cox0, r3(1, 0), r3(1, 1)))
    row_top_r = jnp.where(roy0, jnp.where(cox0, r3(0, 1), r3(0, 2)),
                          jnp.where(cox0, r3(1, 1), r3(1, 2)))
    row_bot_l = jnp.where(roy0, jnp.where(cox0, r3(1, 0), r3(1, 1)),
                          jnp.where(cox0, r3(2, 0), r3(2, 1)))
    row_bot_r = jnp.where(roy0, jnp.where(cox0, r3(1, 1), r3(1, 2)),
                          jnp.where(cox0, r3(2, 1), r3(2, 2)))
    top2 = row_top_l * (1.0 - fx2) + row_top_r * fx2
    bot2 = row_bot_l * (1.0 - fx2) + row_bot_r * fx2
    b = top2 * (1.0 - fy2) + bot2 * fy2
    out = a * (1.0 - frac) + b * frac
    out_ref[0, :, 0:4] = out
    out_ref[0, :, 4:8] = out  # pad lanes (keeps the block 8-wide)


def _env_select_call(env_tri_flat, env_rows, params9, interpret=False):
    """Gather the packed env rows directly in the kernel's block shape and
    run the seamless decode in VMEM.  env_rows: (N,) i32; params9: (9, N)
    f32 [fx, fy, fx2, fy2, frac, m_ix, m_iy, cox, roy].  Returns (N, 4)."""
    import jax
    from jax.experimental import pallas as pl

    n = env_rows.shape[0]
    pix = 1024
    n_pad = -(-n // pix) * pix
    idx_p = jnp.pad(env_rows, (0, n_pad - n)).reshape(-1, pix)
    rows_p = env_tri_flat[idx_p]          # (grid, pix, L) -- bf16 stays bf16
    par_p = jnp.pad(params9, ((0, 0), (0, n_pad - n))).reshape(
        9, -1, pix).transpose(1, 0, 2)    # (grid, 9, pix)
    grid = n_pad // pix
    lanes_n = env_tri_flat.shape[-1]
    out = pl.pallas_call(
        _env_select_kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((1, pix, lanes_n), lambda g: (g, 0, 0)),
            pl.BlockSpec((1, 9, pix), lambda g: (g, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, pix, 8), lambda g: (g, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((grid, pix, 8), jnp.float32),
        interpret=interpret,
    )(rows_p, par_p)
    return out.reshape(n_pad, 8)[:n, :4]


def sample_cube_pyramid_level(
    env_quad_flat: jnp.ndarray,
    atlas_width: int,
    face_rect0,
    direction: jnp.ndarray,
    level: jnp.ndarray,
) -> jnp.ndarray:
    """Single-tap cube sample at an integer mip (the reference's
    SampleLevel(maxMip) irradiance fetch)."""
    rect, uv = _cube_face_rect(face_rect0, direction)
    return sample_pyramid_bilinear(env_quad_flat, atlas_width, rect, uv, level, ADDRESS_CLAMP)
