"""Tiled homogeneous visibility-buffer rasterizer (XLA implementation).

This replaces the D3D12 fixed-function raster pipeline
(``Shaders/DeferredBasePass.hlsl`` VS + the IA/rasterizer stages) with a
TPU-native formulation:

* **Clipless homogeneous rasterization** (Olano-Greer style): edge functions
  are built from 2D cross products of viewport-scaled *homogeneous* vertex
  coordinates, so triangles crossing the w=0 plane rasterize correctly with
  no near-plane clipping and no new vertices -- everything stays
  static-shaped.
* **Edge evaluation as matmul**: for a tile of P pixels and a chunk of K
  triangles, all 3K edge functions evaluate as one ``[P,3] @ [3,5K]`` matmul
  (3 edges + depth numerator + depth denominator) -- dense MXU work.
* **Depth test as argmax**: reverse-Z depth (near=1, far=0) means "nearest
  wins" is a commutative max/argmax over triangles.  No scatter, no ordering,
  no atomics -- opaque rasterization is a reduction.
* The output is a *visibility buffer* (depth + winning triangle id per
  pixel); materials resolve in a separate per-pixel pass
  (ops/interpolate.py), the modern GPU-driven structure rather than the
  reference's per-model draw loop.

Conventions: D3D viewport (x right, y down, pixel centers at +0.5),
D3D triangle orientation (front = clockwise in screen space), top-left fill
rule.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

CULL_NONE = 0
CULL_BACK = 1
CULL_FRONT = 2

DEPTH_MAX = 0  # reverse-Z main pass: nearest = largest z_ndc, clear to 0
DEPTH_MIN = 1  # shadow pass (LESS_EQUAL, D32 cleared to 1): nearest = smallest


def viewport_homogeneous(clip: jnp.ndarray, width: int, height: int) -> jnp.ndarray:
    """Clip coords (V,4) -> homogeneous pixel coords (V,3) = (X, Y, w) with
    X/w = pixel x, Y/w = pixel y (D3D viewport: y flipped, origin top-left)."""
    x, y, w = clip[..., 0], clip[..., 1], clip[..., 3]
    px = (x * 0.5 + w * 0.5) * width
    py = (w * 0.5 - y * 0.5) * height
    return jnp.stack([px, py, w], axis=-1)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class RasterSetup:
    """Per-triangle rasterization coefficients (all (T, ...))."""

    edges: jnp.ndarray   # (T, 3, 3) edge coefficients (a, b, c) per edge
    num_z: jnp.ndarray   # (T, 3) depth numerator coefficients
    num_w: jnp.ndarray   # (T, 3) depth denominator coefficients
    valid: jnp.ndarray   # (T,) bool
    bbox: jnp.ndarray    # (T, 4) pixel-space AABB (x0, y0, x1, y1), inclusive


def triangle_setup(
    pix_h: jnp.ndarray,
    z_clip: jnp.ndarray,
    tris: jnp.ndarray,
    tri_mask: jnp.ndarray,
    cull_mode: int = CULL_BACK,
    width: int = 0,
    height: int = 0,
) -> RasterSetup:
    """Build edge/depth coefficients for each triangle (indexed mesh).

    pix_h: (V, 3) homogeneous pixel coords, z_clip: (V,) clip-space z.
    tris: (T, 3) vertex indices.  tri_mask: (T,) draw mask (culling results).

    NOTE: per-triangle vertex gathers lower poorly on TPU; the render paths
    de-index geometry at scene build and use triangle_setup_expanded.
    """
    return triangle_setup_from_verts(
        pix_h[tris[:, 0]], pix_h[tris[:, 1]], pix_h[tris[:, 2]],
        z_clip[tris[:, 0]], z_clip[tris[:, 1]], z_clip[tris[:, 2]],
        tri_mask, cull_mode, width, height,
    )


def triangle_setup_expanded(
    pix_h: jnp.ndarray,
    z_clip: jnp.ndarray,
    tri_mask: jnp.ndarray,
    cull_mode: int = CULL_BACK,
    width: int = 0,
    height: int = 0,
) -> RasterSetup:
    """Setup for de-indexed geometry: vertex i of triangle t lives at row
    3t + i.  Gather-free (reshape + slice only)."""
    t = pix_h.shape[0] // 3
    p = pix_h.reshape(t, 3, 3)
    z = z_clip.reshape(t, 3)
    return triangle_setup_from_verts(
        p[:, 0], p[:, 1], p[:, 2], z[:, 0], z[:, 1], z[:, 2],
        tri_mask, cull_mode, width, height,
    )


def triangle_setup_from_verts(
    p0: jnp.ndarray,
    p1: jnp.ndarray,
    p2: jnp.ndarray,
    z0: jnp.ndarray,
    z1: jnp.ndarray,
    z2: jnp.ndarray,
    tri_mask: jnp.ndarray,
    cull_mode: int = CULL_BACK,
    width: int = 0,
    height: int = 0,
) -> RasterSetup:
    """Core edge/depth coefficient build from per-triangle vertices.

    Orientation: for a clockwise-on-screen triangle (D3D front face,
    FrontCounterClockwise=FALSE) with all w > 0, det < 0 under the y-down
    viewport mapping (verified against the reference's own BoxTextured
    asset: camera-facing faces carry negative determinants); edge signs are
    flipped so the rasterized interior is always e_k > 0.
    """

    e0 = jnp.cross(p1, p2)
    e1 = jnp.cross(p2, p0)
    e2 = jnp.cross(p0, p1)
    det = jnp.einsum("td,td->t", e0, p0)

    # det < 0 <=> D3D front face (clockwise) for visible tris.
    front = det < 0.0
    if cull_mode == CULL_BACK:
        keep = front
        edges = -jnp.stack([e0, e1, e2], axis=1)
    elif cull_mode == CULL_FRONT:
        keep = ~front
        edges = jnp.stack([e0, e1, e2], axis=1)
    else:  # CULL_NONE: orient every triangle's interior positive
        keep = jnp.ones_like(front)
        sign = jnp.where(front, -1.0, 1.0)[:, None, None]
        edges = jnp.stack([e0, e1, e2], axis=1) * sign

    valid = tri_mask & keep & (det != 0.0)

    w0, w1, w2 = p0[:, 2], p1[:, 2], p2[:, 2]
    num_z = (
        edges[:, 0] * z0[:, None] + edges[:, 1] * z1[:, None] + edges[:, 2] * z2[:, None]
    )
    num_w = (
        edges[:, 0] * w0[:, None] + edges[:, 1] * w1[:, None] + edges[:, 2] * w2[:, None]
    )

    # Conservative pixel bbox. Vertices with w <= 0 project behind the
    # camera; such triangles get the full viewport (cheap and correct).
    eps = 1e-9
    any_behind = (w0 <= eps) | (w1 <= eps) | (w2 <= eps)
    sx = jnp.stack([p0[:, 0] / jnp.maximum(w0, eps),
                    p1[:, 0] / jnp.maximum(w1, eps),
                    p2[:, 0] / jnp.maximum(w2, eps)], axis=1)
    sy = jnp.stack([p0[:, 1] / jnp.maximum(w0, eps),
                    p1[:, 1] / jnp.maximum(w1, eps),
                    p2[:, 1] / jnp.maximum(w2, eps)], axis=1)
    x0 = jnp.where(any_behind, 0.0, jnp.floor(sx.min(axis=1)))
    y0 = jnp.where(any_behind, 0.0, jnp.floor(sy.min(axis=1)))
    x1 = jnp.where(any_behind, float(max(width - 1, 0)), jnp.ceil(sx.max(axis=1)))
    y1 = jnp.where(any_behind, float(max(height - 1, 0)), jnp.ceil(sy.max(axis=1)))
    bbox = jnp.stack(
        [
            jnp.clip(x0, 0, max(width - 1, 0)),
            jnp.clip(y0, 0, max(height - 1, 0)),
            jnp.clip(x1, 0, max(width - 1, 0)),
            jnp.clip(y1, 0, max(height - 1, 0)),
        ],
        axis=1,
    )
    # Off-screen bbox -> invalid.
    on_screen = (x1 >= 0) & (y1 >= 0) & (x0 <= width - 1) & (y0 <= height - 1)
    valid = valid & (on_screen | any_behind)

    return RasterSetup(edges=edges, num_z=num_z, num_w=num_w, valid=valid, bbox=bbox)


def _coverage(ev: jnp.ndarray, edges: jnp.ndarray) -> jnp.ndarray:
    """Top-left fill rule: e > 0, or e == 0 on a top/left edge.
    ev: (..., K, 3) edge values; edges: (K, 3, 3) coefficients."""
    a = edges[..., 0]
    b = edges[..., 1]
    top_left = (a > 0.0) | ((a == 0.0) & (b > 0.0))
    inside = (ev > 0.0) | ((ev == 0.0) & top_left)
    return jnp.all(inside, axis=-1)


@partial(
    jax.jit,
    static_argnames=("width", "height", "tile_h", "tile_w", "chunk", "depth_mode"),
)
def rasterize(
    setup: RasterSetup,
    width: int,
    height: int,
    tile_h: int = 32,
    tile_w: int = 64,
    chunk: int = 128,
    depth_mode: int = DEPTH_MAX,
    y_offset=0,
):
    """Rasterize to a visibility buffer.

    Returns (depth (H, W) f32, tri_id (H, W) i32).  tri_id is -1 where empty.
    depth is z_ndc: reverse-Z in DEPTH_MAX mode (0 = empty/far), standard-Z
    in DEPTH_MIN mode (1 = empty/far).

    Brute-force tiling: every tile scans every triangle chunk, with a
    per-(tile, chunk) bbox rejection that XLA turns into masked work (the
    Pallas kernel + binned lists make the rejection real wall-clock savings).

    y_offset (traced scalar ok): first pixel row this call rasterizes --
    used by the multi-chip path to give each device its row slab of the
    full viewport while triangle setup stays in full-viewport coordinates.
    """
    # Pad the viewport up to tile multiples; outputs crop back.
    pad_w = -(-width // tile_w) * tile_w
    pad_h = -(-height // tile_h) * tile_h
    n_ty, n_tx = pad_h // tile_h, pad_w // tile_w
    n_tiles = n_ty * n_tx
    pix = tile_h * tile_w

    t = setup.edges.shape[0]
    n_chunks = max(1, -(-t // chunk))
    t_pad = n_chunks * chunk

    def pad(x, fill=0):
        pad_n = t_pad - x.shape[0]
        if pad_n == 0:
            return x
        cfg = [(0, pad_n)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, cfg, constant_values=fill)

    # Flatten edge coefficients for the matmul: (n_chunks, 3, 5K) where the
    # 5K columns are [3K edge | K num_z | K num_w].
    edges = pad(setup.edges).reshape(n_chunks, chunk * 3, 3)
    num_z = pad(setup.num_z).reshape(n_chunks, chunk, 3)
    num_w = pad(setup.num_w).reshape(n_chunks, chunk, 3)
    valid = pad(setup.valid, fill=False).reshape(n_chunks, chunk)
    bbox = pad(setup.bbox).reshape(n_chunks, chunk, 4)

    # Pixel coordinate grid per tile.
    ty_idx = jnp.arange(n_tiles, dtype=jnp.int32) // n_tx
    tx_idx = jnp.arange(n_tiles, dtype=jnp.int32) % n_tx
    yy = jnp.arange(tile_h, dtype=jnp.float32)[:, None]
    xx = jnp.arange(tile_w, dtype=jnp.float32)[None, :]
    # (n_tiles, pix, 3) homogeneous pixel centers
    y_off = jnp.asarray(y_offset, jnp.float32)
    qx0 = tx_idx[:, None, None] * tile_w + xx[None] + 0.5  # (n_tiles, 1, tw)
    qy0 = ty_idx[:, None, None] * tile_h + yy[None] + 0.5 + y_off  # (n_tiles, th, 1)
    qx = jnp.broadcast_to(qx0, (n_tiles, tile_h, tile_w)).reshape(n_tiles, pix)
    qy = jnp.broadcast_to(qy0, (n_tiles, tile_h, tile_w)).reshape(n_tiles, pix)
    q = jnp.stack([qx, qy, jnp.ones_like(qx)], axis=-1)

    # Tile pixel bounds for bbox rejection.
    tile_x0 = (tx_idx * tile_w).astype(jnp.float32)
    tile_y0 = (ty_idx * tile_h).astype(jnp.float32) + y_off
    tile_x1 = tile_x0 + (tile_w - 1)
    tile_y1 = tile_y0 + (tile_h - 1)

    empty_depth = 0.0 if depth_mode == DEPTH_MAX else 1.0

    def chunk_step(carry, inputs):
        best_key, best_id = carry  # (n_tiles, pix) each
        c_edges, c_nz, c_nw, c_valid, c_bbox, c_base = inputs

        # (n_tiles, pix, 3K): all edge functions for this chunk, every tile.
        # HIGHEST precision: the TPU MXU's default f32 matmul truncates to
        # bf16 passes, which breaks depth-test determinism at ~1e-3.
        hi = jax.lax.Precision.HIGHEST
        ev = jnp.einsum("npd,kd->npk", q, c_edges, precision=hi).reshape(
            n_tiles, pix, chunk, 3
        )
        cov = _coverage(ev, c_edges.reshape(chunk, 3, 3))
        nz = jnp.einsum("npd,kd->npk", q, c_nz, precision=hi)
        nw = jnp.einsum("npd,kd->npk", q, c_nw, precision=hi)
        depth = nz / jnp.where(nw != 0.0, nw, 1.0)
        ok = (
            cov
            & (nw > 0.0)
            & (depth >= 0.0)
            & (depth <= 1.0)
            & c_valid[None, None, :]
        )
        # bbox-vs-tile rejection (masking only in XLA; real skip in Pallas).
        overlap = (
            (c_bbox[None, :, 0] <= tile_x1[:, None])
            & (c_bbox[None, :, 2] >= tile_x0[:, None])
            & (c_bbox[None, :, 1] <= tile_y1[:, None])
            & (c_bbox[None, :, 3] >= tile_y0[:, None])
        )  # (n_tiles, K)
        ok = ok & overlap[:, None, :]

        key = depth if depth_mode == DEPTH_MAX else (1.0 - depth)
        key = jnp.where(ok, key, -1.0)
        k_best = jnp.max(key, axis=-1)
        k_arg = jnp.argmax(key, axis=-1).astype(jnp.int32)
        better = k_best > best_key
        best_key = jnp.where(better, k_best, best_key)
        best_id = jnp.where(better, c_base + k_arg, best_id)
        return (best_key, best_id), None

    init = (
        jnp.full((n_tiles, pix), -1.0, jnp.float32),
        jnp.full((n_tiles, pix), -1, jnp.int32),
    )
    bases = jnp.arange(n_chunks, dtype=jnp.int32) * chunk
    (best_key, best_id), _ = jax.lax.scan(
        chunk_step, init, (edges, num_z, num_w, valid, bbox, bases)
    )

    hit = best_key >= 0.0
    if depth_mode == DEPTH_MAX:
        depth = jnp.where(hit, best_key, empty_depth)
    else:
        depth = jnp.where(hit, 1.0 - best_key, empty_depth)
    tri_id = jnp.where(hit, best_id, -1)

    # Untile: (n_tiles, pix) -> (H, W), cropping tile padding.
    depth = (
        depth.reshape(n_ty, n_tx, tile_h, tile_w)
        .transpose(0, 2, 1, 3)
        .reshape(pad_h, pad_w)[:height, :width]
    )
    tri_id = (
        tri_id.reshape(n_ty, n_tx, tile_h, tile_w)
        .transpose(0, 2, 1, 3)
        .reshape(pad_h, pad_w)[:height, :width]
    )
    return depth, tri_id
