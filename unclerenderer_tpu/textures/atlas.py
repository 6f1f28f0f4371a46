"""Texture atlas: all scene textures + mip chains packed into one 2D array.

TPUs have no texture units; sampling is explicit gathers (ops/texture.py).
Packing every (texture, mip) rectangle into a single HBM-resident array keeps
the per-pixel sample path to one table lookup + four gathers per tap, with a
uniform code path for every material slot (the analog of the reference's one
big shader-visible descriptor heap, ``DeferredRenderer.cpp:2880-3168``).

Table trick: each texture's mip table has MAX_MIPS entries; levels beyond the
real chain repeat the 1x1 tail, so LOD clamping is baked into the table and
the sampler never branches.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from ..core.logging import log_info

MAX_MIPS = 14  # up to 8192


@dataclasses.dataclass
class TextureAtlas:
    data: np.ndarray = None          # (H, W, 4) float32 linear
    mip_x: np.ndarray = None         # (n_tex, MAX_MIPS) int32
    mip_y: np.ndarray = None         # (n_tex, MAX_MIPS) int32
    mip_w: np.ndarray = None         # (n_tex, MAX_MIPS) int32
    mip_h: np.ndarray = None         # (n_tex, MAX_MIPS) int32
    mip_count: np.ndarray = None     # (n_tex,) int32

    @property
    def num_textures(self) -> int:
        return 0 if self.mip_x is None else int(self.mip_x.shape[0])


class _ShelfPacker:
    """Simple shelf packer: rows of decreasing height."""

    def __init__(self, width: int):
        self.width = width
        self.rows: list[list[int]] = []  # [y, x_cursor, row_height]
        self.height = 0

    def place(self, w: int, h: int) -> tuple[int, int]:
        for row in self.rows:
            if row[1] + w <= self.width and h <= row[2]:
                x = row[1]
                row[1] += w
                return x, row[0]
        y = self.height
        self.rows.append([y, w, h])
        self.height += h
        return 0, y


def _round_up(v: int, m: int) -> int:
    return ((v + m - 1) // m) * m


def build_atlas(texture_mips: list[list[np.ndarray]], pad: int = 0) -> TextureAtlas:
    """Pack a list of mip chains (each: list of (h, w, 4) float32 arrays).

    Returns a TextureAtlas whose ``data`` height is rounded to 8 rows (TPU
    sublane alignment for f32).
    """
    n = len(texture_mips)
    atlas = TextureAtlas(
        mip_x=np.zeros((n, MAX_MIPS), np.int32),
        mip_y=np.zeros((n, MAX_MIPS), np.int32),
        mip_w=np.ones((n, MAX_MIPS), np.int32),
        mip_h=np.ones((n, MAX_MIPS), np.int32),
        mip_count=np.zeros(n, np.int32),
    )
    if n == 0:
        atlas.data = np.zeros((8, 128, 4), np.float32)
        return atlas


    # Sort rectangles by height (desc) for decent shelf utilization; keep
    # (tex, mip) identity with each.
    rects = []
    for t, mips in enumerate(texture_mips):
        atlas.mip_count[t] = len(mips)
        for lv, img in enumerate(mips):
            rects.append((img.shape[0], img.shape[1], t, lv))
    rects.sort(key=lambda r: (-r[0], -r[1]))

    max_w = max(r[1] for r in rects)
    total_area = sum(r[0] * r[1] for r in rects)
    width = max(128, max_w)
    width = 1 << int(np.ceil(np.log2(width)))
    # widen until the packed height is roughly square-ish
    while width * width < total_area * 1.3 and width < 16384:
        width *= 2

    packer = _ShelfPacker(width)
    places = {}
    for h, w, t, lv in rects:
        x, y = packer.place(w + pad, h + pad)
        places[(t, lv)] = (x, y)

    channels = texture_mips[0][0].shape[-1]
    height = _round_up(max(packer.height, 8), 8)
    data = np.zeros((height, width, channels), np.float32)
    for t, mips in enumerate(texture_mips):
        for lv, img in enumerate(mips):
            x, y = places[(t, lv)]
            h, w = img.shape[:2]
            data[y : y + h, x : x + w] = img
            atlas.mip_x[t, lv] = x
            atlas.mip_y[t, lv] = y
            atlas.mip_w[t, lv] = w
            atlas.mip_h[t, lv] = h
        # bake LOD clamp: repeat the last real mip for the tail entries
        last = len(mips) - 1
        for lv in range(len(mips), MAX_MIPS):
            atlas.mip_x[t, lv] = atlas.mip_x[t, last]
            atlas.mip_y[t, lv] = atlas.mip_y[t, last]
            atlas.mip_w[t, lv] = atlas.mip_w[t, last]
            atlas.mip_h[t, lv] = atlas.mip_h[t, last]

    atlas.data = data
    log_info(
        f"texture atlas: {n} textures, {len(rects)} mips packed into "
        f"{width}x{height} ({data.nbytes / 1e6:.1f} MB f32)"
    )
    return atlas


# ---------------------------------------------------------------------------
# Seamless cube-face borders (ARCHITECTURE deviation #4): D3D12 hardware
# filters across cube face edges (the IBL taps, DeferredLighting.hlsl:76-91).
# The packed quad/tri layouts store every texel's whole filter footprint per
# row, so cross-face texels can be BAKED at build time -- sampling keeps its
# single gather.  Borders resolve through the direction roundtrip: a border
# texel's center direction (u/v extrapolated past the face) re-addressed by
# the standard dominant-axis rule lands on the neighbor face's texel,
# orientation handled automatically.  Conventions mirror
# ops/texture.py cube_direction_to_face_uv exactly (D3D 18.9 face fetch).
# ---------------------------------------------------------------------------


def _cube_face_dir(f: int, uc: np.ndarray, vc: np.ndarray) -> np.ndarray:
    """Face-local centered coords (uc, vc in [-1, 1], extrapolation ok) ->
    direction, the exact inverse of cube_direction_to_face_uv's per-face
    (u, v) selection.  Face order +X,-X,+Y,-Y,+Z,-Z."""
    one = np.ones_like(uc)
    if f == 0:
        return np.stack([one, -vc, -uc], -1)
    if f == 1:
        return np.stack([-one, -vc, uc], -1)
    if f == 2:
        return np.stack([uc, one, vc], -1)
    if f == 3:
        return np.stack([uc, -one, -vc], -1)
    if f == 4:
        return np.stack([uc, -vc, one], -1)
    return np.stack([-uc, -vc, -one], -1)


def _cube_dir_to_texel(d: np.ndarray, s: int):
    """Directions (..., 3) -> (face, iy, ix) nearest texel on an s-sized
    face -- the numpy mirror of ops/texture.py cube_direction_to_face_uv."""
    x, y, z = d[..., 0], d[..., 1], d[..., 2]
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    is_x = (ax >= ay) & (ax >= az)
    is_y = (~is_x) & (ay >= az)
    face = np.where(
        is_x, np.where(x >= 0, 0, 1),
        np.where(is_y, np.where(y >= 0, 2, 3), np.where(z >= 0, 4, 5)),
    ).astype(np.int32)
    ma = np.maximum(np.where(is_x, ax, np.where(is_y, ay, az)), 1e-20)
    u = np.where(is_x, np.where(x >= 0, -z, z),
                 np.where(is_y, x, np.where(z >= 0, x, -x)))
    v = np.where(is_x, -y, np.where(is_y, np.where(y >= 0, z, -z), -y))
    uu = (u / ma + 1.0) * 0.5
    vv = (v / ma + 1.0) * 0.5
    ix = np.clip(np.floor(uu * s).astype(np.int64), 0, s - 1)
    iy = np.clip(np.floor(vv * s).astype(np.int64), 0, s - 1)
    return face, iy, ix


def _cube_extend(faces: list[np.ndarray]) -> list[np.ndarray]:
    """6 (s, s, c) face images -> 6 (s+2, s+2, c) images whose 1-texel
    border holds the adjacent faces' texels (corners take the nearest texel
    of whichever face the corner direction's dominant axis picks)."""
    s, c = faces[0].shape[0], faces[0].shape[-1]
    stack = np.stack(faces)  # (6, s, s, c)
    exts = []
    border_y, border_x = np.meshgrid(
        np.arange(-1, s + 1), np.arange(-1, s + 1), indexing="ij"
    )
    on_border = (
        (border_y == -1) | (border_y == s) | (border_x == -1) | (border_x == s)
    )
    by = border_y[on_border].astype(np.float64)
    bx = border_x[on_border].astype(np.float64)
    uc = (bx + 0.5) / s * 2.0 - 1.0
    vc = (by + 0.5) / s * 2.0 - 1.0
    for f in range(6):
        ext = np.zeros((s + 2, s + 2, c), faces[f].dtype)
        ext[1:-1, 1:-1] = faces[f]
        nf, niy, nix = _cube_dir_to_texel(_cube_face_dir(f, uc, vc), s)
        ext[border_y[on_border] + 1, border_x[on_border] + 1] = stack[nf, niy, nix]
        exts.append(ext)
    return exts


def build_pyramid_quad_atlas(texture_mips: list[list[np.ndarray]], wrap=True,
                             dtype=np.float32, ext_of=None):
    """Quad atlas with an *arithmetic* mip layout: each texture's mips sit in
    one row, mip L at x-offset 2*(w0 - (w0 >> L)) from the texture origin.
    A sampler can compute any mip rectangle from just (x0, y0, w0, h0) --
    no per-pixel mip-table gathers (small-table gathers are pathologically
    slow on TPU).

    Requires power-of-two texture sizes (all reference assets comply);
    non-pow2 inputs are padded up with wrapped content so WRAP sampling
    stays correct at the original frequency... they are instead rejected
    with an assert for now.

    wrap may be a bool or a per-texture list of bools (WRAP vs CLAMP quads).

    ext_of: optional callable (t, lv) -> (h+2, w+2, C) border-extended level
    image; when given, the quad's +x/+y/+xy channels come from it instead of
    the wrap/clamp shifts (cube faces bake cross-face borders this way).

    Works for any channel count C (all chains must agree): single textures
    are C=4, the combined material atlas is C=11 (render/renderer.py).

    Returns (data (H, W, 4*C) f32, rect0 (n_tex, 4) i32 = (x0, y0, w0, h0)).
    """
    n = len(texture_mips)
    rect0 = np.zeros((n, 4), np.int32)
    if n == 0:
        return np.zeros((8, 128, 16), np.float32), rect0
    channels = texture_mips[0][0].shape[-1]
    wraps = [wrap] * n if isinstance(wrap, bool) else list(wrap)

    rows = []
    for t, chain in enumerate(texture_mips):
        h0, w0 = chain[0].shape[:2]
        assert (w0 & (w0 - 1)) == 0 and (h0 & (h0 - 1)) == 0, (
            f"pyramid atlas requires power-of-two textures, got {w0}x{h0}"
        )
        # Tall (h0 > w0) chains have mips past the point the width saturates
        # at 1; each of those gets its own extra column (the reader's
        # _pyramid_rect arithmetic matches, ops/texture.py).
        tail = max(h0.bit_length() - w0.bit_length(), 0)
        rows.append((h0, 2 * w0 + tail, t))
    rows.sort(key=lambda r: (-r[0], -r[1]))

    width = max(128, 1 << int(np.ceil(np.log2(max(r[1] for r in rows)))))
    total_area = sum(r[0] * r[1] for r in rows)
    while width * width < total_area * 1.3 and width < 16384:
        width *= 2

    packer = _ShelfPacker(width)
    places = {}
    for h, w, t in rows:
        places[t] = packer.place(w, h)
    height = _round_up(max(packer.height, 8), 8)
    data = np.zeros((height, width, 4 * channels), dtype)
    c = channels

    # Mip rectangles, computed once: offset 2*(w0 - w_lv) plus one extra
    # column per tail level whose width already saturated at 1 (tall
    # textures).  Must match ops/texture.py _pyramid_rect exactly -- the
    # occupancy check below is the build-time guard on that contract (it
    # replaced the old all-zeros data scan when the fill went parallel).
    mip_rects = {}
    occupancy = np.zeros((height, width), np.uint8)
    for t, chain in enumerate(texture_mips):
        x0, y0 = places[t]
        h0, w0 = chain[0].shape[:2]
        lw0 = int(np.log2(w0))
        rects = []
        for lv, img in enumerate(chain):
            xl = x0 + 2 * (w0 - max(w0 >> lv, 1)) + max(lv - lw0, 0)
            h, w = img.shape[:2]
            rects.append((xl, y0, w, h))
            occupancy[y0 : y0 + h, xl : xl + w] += 1
        mip_rects[t] = rects
    assert occupancy.max() <= 1, "pyramid atlas mip rectangles overlap"
    del occupancy

    def _fill_texture(t: int) -> None:
        # Each texture writes a disjoint atlas region (guarded above), so
        # textures fuse in parallel on the task pool.  The quad's +x/+y/+xy
        # shifted copies are written as two strided slice assignments each
        # (wrap duplicates the first row/column, clamp the last) -- no
        # np.roll/concatenate temporaries, and the only dtype conversion is
        # the final store.
        chain = texture_mips[t]
        x0, y0 = places[t]
        h0, w0 = chain[0].shape[:2]
        rect0[t] = (x0, y0, w0, h0)
        for lv, img in enumerate(chain):
            xl, _, w, h = mip_rects[t][lv]
            dst = data[y0 : y0 + h, xl : xl + w]
            if ext_of is not None:
                ext = ext_of(t, lv)
                dst[..., 0:c] = ext[1:-1, 1:-1]
                dst[..., c : 2 * c] = ext[1:-1, 2:]
                dst[..., 2 * c : 3 * c] = ext[2:, 1:-1]
                dst[..., 3 * c :] = ext[2:, 2:]
                continue
            ex = 0 if wraps[t] else w - 1  # wrap -> col 0, clamp -> last col
            ey = 0 if wraps[t] else h - 1
            dst[..., 0:c] = img
            dst[:, : w - 1, c : 2 * c] = img[:, 1:]
            dst[:, w - 1, c : 2 * c] = img[:, ex]
            dst[: h - 1, :, 2 * c : 3 * c] = img[1:]
            dst[h - 1, :, 2 * c : 3 * c] = img[ey]
            dst[: h - 1, : w - 1, 3 * c :] = img[1:, 1:]
            dst[: h - 1, w - 1, 3 * c :] = img[1:, ex]
            dst[h - 1, : w - 1, 3 * c :] = img[ey, 1:]
            dst[h - 1, w - 1, 3 * c :] = img[ey, ex]

    from ..core.tasks import parallel_map

    parallel_map(_fill_texture, range(n))
    log_info(
        f"pyramid quad atlas: {n} textures into {width}x{height} "
        f"({data.nbytes / 1e6:.1f} MB {np.dtype(dtype).name})"
    )
    return data, rect0


def build_pyramid_tri_atlas(texture_mips: list[list[np.ndarray]],
                            dtype=np.float32, wrap=False, cube=False):
    """Packed-trilinear pyramid atlas (env cubes AND, optionally, the
    combined material atlas).

    Each texel row carries BOTH taps of a trilinear sample of a C-channel
    texture:
      lanes     0:4C -- the texel's own 2x2 bilinear quad at its mip
                        (corner order TL,TR,BL,BR like the quad atlas),
      lanes  4C:13C -- the 3x3 neighborhood of its PARENT texel at the
                        next mip (row-major, wrap- or edge-padded to match
                        the address mode),
      lanes 13C:16C -- zero pad to 16C (non-pow2 gather rows are ~2.3x
                        slower; 16C is the next power of two of 13C for
                        pow2 C).

    Why 3x3 is always enough: a uv that lands on texel ix = floor(u*w - 0.5)
    at mip L has its mip-L+1 bilinear base index in {ix>>1 - 1, ix>>1}, so
    the 2x2 footprint sits inside the 3x3 centred on (ix>>1, iy>>1).  The
    samplers (ops/texture.py sample_cube_pyramid_tri / sample_pyramid_tri)
    therefore need ONE row gather per trilinear sample instead of two,
    bit-exact vs the two-gather path.  C=4 env rows are 64 bf16 lanes
    (128 B); C=16 combined-material rows are 256 lanes (512 B) -- the same
    byte width as a 128-lane f32 row.  Replaces the reference's hardware
    trilinear fetches (``DeferredLighting.hlsl:76-91``,
    ``ForwardRenderer.cpp:956-959`` anisotropic base).

    wrap: bool or per-texture list, same semantics as
    build_pyramid_quad_atlas (False = CLAMP -- cube faces; True = WRAP --
    tiling material textures).

    cube=True (requires exactly 6 equal square chains): SEAMLESS cube-edge
    filtering (ARCHITECTURE deviation #4, the D3D12 hardware behavior at
    ``DeferredLighting.hlsl:76-91``'s IBL taps).  Quad +neighbors and the
    parent 3x3 windows bake CROSS-FACE texels (_cube_extend), and five
    extra border texels pack after the 13C payload --
      lanes 13C+0C: L  = (x-1, y)      lanes 13C+1C: T  = (x, y-1)
      lanes 13C+2C: Cr = (x-1, y-1)    lanes 13C+3C: L2 = (x-1, y+1)
      lanes 13C+4C: T2 = (x+1, y-1)
    -- exactly the texels a bilinear footprint with base index -1 needs, so
    the sampler (ops/texture.py sample_cube_pyramid_tri) covers the minus
    edges by lane select with the SAME single gather.  Rows widen to 32C
    (env C=4 -> 128 bf16 lanes, still inside the 128-lane fast-gather
    budget).

    Chains may be rectangular (pow2, tall tails supported) and may stop
    short of 1x1: the last level packs its own padded 3x3 as its "parent",
    which is harmless because the sampler's lod is clamped to
    mip_count - 1 by the caller, making the parent-tap weight exactly 0
    at the last level.
    """
    for chain in texture_mips:
        h0, w0 = chain[0].shape[:2]
        assert len(chain) <= max(int(w0).bit_length(), int(h0).bit_length()), (
            f"tri atlas chain longer than the mip pyramid ({w0}x{h0}, "
            f"got {len(chain)} levels)"
        )
    c = texture_mips[0][0].shape[-1]
    assert (c & (c - 1)) == 0, f"tri atlas channel count must be pow2, got {c}"
    wraps = [wrap] * len(texture_mips) if isinstance(wrap, bool) else list(wrap)

    exts = None
    ext_of = None
    if cube:
        assert len(texture_mips) == 6 and not any(wraps), "cube = 6 CLAMP faces"
        levels_n = len(texture_mips[0])
        assert all(len(ch) == levels_n for ch in texture_mips)
        exts = [
            _cube_extend([ch[lv].astype(np.float32) for ch in texture_mips])
            for lv in range(levels_n)
        ]
        ext_of = lambda t, lv: exts[lv][t]  # noqa: E731

    quad, rect0 = build_pyramid_quad_atlas(texture_mips, wrap=wrap,
                                           dtype=np.float32, ext_of=ext_of)
    height, width = quad.shape[:2]
    row_c = (32 if cube else 16) * c
    data = np.zeros((height, width, row_c), np.float32)
    data[..., : 4 * c] = quad
    del quad
    for t, chain in enumerate(texture_mips):
        x0, y0, w0, _h0 = (int(v) for v in rect0[t])
        lw0 = int(np.log2(w0))
        pad_mode = "wrap" if wraps[t] else "edge"
        levels = len(chain)
        for lv, img in enumerate(chain):
            h, w = img.shape[:2]
            # same per-level x offset as build_pyramid_quad_atlas /
            # _pyramid_rect (incl. the tall-texture tail shift)
            xl = x0 + 2 * (w0 - max(w0 >> lv, 1)) + max(lv - lw0, 0)
            nxt = chain[min(lv + 1, levels - 1)].astype(np.float32)
            if cube and lv + 1 < levels:
                pad = exts[lv + 1][t]  # cross-face parent window
            elif cube:
                pad = exts[lv][t] if nxt.shape[0] == h else np.pad(
                    nxt, ((1, 1), (1, 1), (0, 0)), mode="edge")
            else:
                pad = np.pad(nxt, ((1, 1), (1, 1), (0, 0)), mode=pad_mode)
            # parent center of texel i is i>>1; when the parent level is a
            # saturated self-reference (last level / saturated axis) the
            # window content is uniform along that axis, so the sampler's
            # clipped column/row select stays exact
            py = np.minimum(np.arange(h) >> 1, nxt.shape[0] - 1)
            px = np.minimum(np.arange(w) >> 1, nxt.shape[1] - 1)
            for j in range(3):
                rows = pad[py + j]
                for i in range(3):
                    lo = 4 * c + (j * 3 + i) * c
                    data[y0:y0 + h, xl:xl + w, lo:lo + c] = rows[:, px + i]
            if cube:
                # minus-edge border texels for the sampler's ix/iy == -1
                # bilinear bases: L, T, corner, L2, T2 (see docstring)
                ext = exts[lv][t]
                for k, (oy, ox) in enumerate(
                    ((1, 0), (0, 1), (0, 0), (2, 0), (0, 2))
                ):
                    lo = 13 * c + k * c
                    data[y0:y0 + h, xl:xl + w, lo:lo + c] = ext[
                        oy : oy + h, ox : ox + w
                    ]
    if np.dtype(dtype) != np.float32:
        data = data.astype(dtype)
    log_info(
        f"pyramid tri atlas: {len(texture_mips)} chains into {width}x{height}"
        f" ({data.nbytes / 1e6:.1f} MB {np.dtype(dtype).name})"
    )
    return data, rect0
