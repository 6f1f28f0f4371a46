"""Texture sampling ops: pyramid quad atlas vs direct numpy filtering."""

import numpy as np
import jax.numpy as jnp
import pytest

from unclerenderer_tpu.ops import texture as tex
from unclerenderer_tpu.textures.atlas import build_pyramid_quad_atlas
from unclerenderer_tpu.textures.image import generate_mips


def _bilinear_wrap(img, u, v):
    h, w = img.shape[:2]
    tx, ty = u * w - 0.5, v * h - 0.5
    x0, y0 = int(np.floor(tx)), int(np.floor(ty))
    fx, fy = tx - x0, ty - y0
    def t(x, y):
        return img[y % h, x % w]
    top = t(x0, y0) * (1 - fx) + t(x0 + 1, y0) * fx
    bot = t(x0, y0 + 1) * (1 - fx) + t(x0 + 1, y0 + 1) * fx
    return top * (1 - fy) + bot * fy


def test_pyramid_bilinear_matches_numpy():
    rng = np.random.default_rng(0)
    img = rng.random((32, 64, 4)).astype(np.float32)
    mips = generate_mips(img)
    data, rect0 = build_pyramid_quad_atlas([mips])
    flat = jnp.asarray(data.reshape(-1, 16))
    aw = data.shape[1]
    r0 = jnp.asarray(np.broadcast_to(rect0[0].astype(np.float32), (8, 4)))
    uvs = rng.random((8, 2)).astype(np.float32)
    for level, ref_img in [(0, mips[0]), (1, mips[1]), (2, mips[2])]:
        out = np.asarray(
            tex.sample_pyramid_bilinear(
                flat, aw, r0, jnp.asarray(uvs), jnp.full(8, level, jnp.int32)
            )
        )
        for i, (u, v) in enumerate(uvs):
            np.testing.assert_allclose(
                out[i], _bilinear_wrap(ref_img, u, v), atol=1e-5
            )


def test_pyramid_level_clamps_to_chain_end():
    img = np.full((16, 16, 4), 0.0, np.float32)
    img[:8] = 1.0  # mean 0.5 at the 1x1 tail
    mips = generate_mips(img)
    data, rect0 = build_pyramid_quad_atlas([mips])
    flat = jnp.asarray(data.reshape(-1, 16))
    r0 = jnp.asarray(rect0[0].astype(np.float32))[None, :]
    out = np.asarray(
        tex.sample_pyramid_bilinear(
            flat, data.shape[1], r0,
            jnp.asarray([[0.3, 0.7]], jnp.float32), jnp.asarray([13], jnp.int32),
        )
    )
    np.testing.assert_allclose(out[0], 0.5, atol=1e-6)


def test_pyramid_trilinear_blends():
    img = np.zeros((8, 8, 4), np.float32)  # mip0 = 0
    mips = generate_mips(img)
    mips[1] = np.ones_like(mips[1])  # mip1 = 1 (synthetic)
    data, rect0 = build_pyramid_quad_atlas([mips])
    flat = jnp.asarray(data.reshape(-1, 16))
    r0 = jnp.asarray(rect0[0].astype(np.float32))[None, :]
    out = np.asarray(
        tex.sample_pyramid_trilinear(
            flat, data.shape[1], r0,
            jnp.asarray([[0.5, 0.5]], jnp.float32), jnp.asarray([0.25], jnp.float32),
        )
    )
    np.testing.assert_allclose(out[0], 0.25, atol=1e-5)


def test_cube_pyramid_face_selection():
    # six faces with distinct constant colors
    chains = []
    for f in range(6):
        img = np.full((4, 4, 4), (f + 1) / 6.0, np.float32)
        chains.append(generate_mips(img))
    data, rect0 = build_pyramid_quad_atlas(chains, wrap=False)
    flat = jnp.asarray(data.reshape(-1, 16))
    r0 = jnp.asarray(rect0.astype(np.float32))
    dirs = jnp.asarray(
        [[1, 0, 0], [-1, 0, 0], [0, 1, 0], [0, -1, 0], [0, 0, 1], [0, 0, -1]],
        jnp.float32,
    )
    out = np.asarray(
        tex.sample_cube_pyramid(flat, data.shape[1], r0, dirs, jnp.zeros(6, jnp.float32))
    )
    np.testing.assert_allclose(out[:, 0], (np.arange(6) + 1) / 6.0, atol=1e-5)


def test_table_matmul_matches_gather_bilinear():
    """Hat-function matmul sampling (ops/texture.py sample_table_bilinear_matmul)
    must match the quad-gather sampler exactly (CLAMP, mip 0)."""
    import numpy as np
    import jax.numpy as jnp
    from unclerenderer_tpu.ops import texture as tex
    from unclerenderer_tpu.textures.atlas import build_pyramid_quad_atlas

    rng = np.random.default_rng(7)
    table = rng.random((16, 32, 4), np.float32)
    quad, rect0 = build_pyramid_quad_atlas([[table]], wrap=False)
    uv = jnp.asarray(rng.random((64, 2), np.float32))
    ref = tex.sample_pyramid_bilinear(
        jnp.asarray(quad).reshape(-1, 16), quad.shape[1],
        jnp.asarray(rect0[0], jnp.float32), uv,
        jnp.zeros((64,), jnp.int32), tex.ADDRESS_CLAMP,
    )
    got = tex.sample_table_bilinear_matmul(jnp.asarray(table), uv)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_cube_tail_matmul_matches_gather():
    import numpy as np
    import jax.numpy as jnp
    from unclerenderer_tpu.ops import texture as tex
    from unclerenderer_tpu.textures.atlas import build_pyramid_quad_atlas

    rng = np.random.default_rng(11)
    tail = rng.random((6, 4, 4, 4), np.float32)
    quad, rect0 = build_pyramid_quad_atlas([[tail[f]] for f in range(6)], wrap=False)
    dirs = jnp.asarray(rng.normal(size=(128, 3)).astype(np.float32))
    ref = tex.sample_cube_pyramid_level(
        jnp.asarray(quad).reshape(-1, 16), quad.shape[1],
        jnp.asarray(rect0, jnp.float32), dirs, jnp.zeros((128,), jnp.int32),
    )
    got = tex.sample_cube_tail_matmul(jnp.asarray(tail), dirs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


@pytest.mark.parametrize("shape", [(16, 4), (4, 16), (32, 2), (2, 2)])
def test_pyramid_every_mip_nonsquare(shape):
    """Tall chains have tail mips past width saturation; each mip of every
    aspect ratio must read back exactly (regression: tall tail mips used to
    share one atlas slot and overwrite each other)."""
    rng = np.random.default_rng(3)
    h, w = shape
    img = rng.random((h, w, 4)).astype(np.float32)
    mips = generate_mips(img)
    assert len(mips) == int(np.log2(max(h, w))) + 1
    # a second tall texture in the same atlas guards against cross-texture
    # corruption from out-of-slot writes
    img2 = rng.random((h, w, 4)).astype(np.float32)
    data, rect0 = build_pyramid_quad_atlas([mips, generate_mips(img2)])
    flat = jnp.asarray(data.reshape(-1, 16))
    aw = data.shape[1]
    for level, ref_img in enumerate(mips):
        mh, mw = ref_img.shape[:2]
        # texel-center taps reproduce the mip texels exactly
        uv = np.stack(
            np.meshgrid(
                (np.arange(mw) + 0.5) / mw, (np.arange(mh) + 0.5) / mh
            ),
            axis=-1,
        ).reshape(-1, 2).astype(np.float32)
        r0 = jnp.asarray(
            np.broadcast_to(rect0[0].astype(np.float32), (uv.shape[0], 4))
        )
        out = np.asarray(
            tex.sample_pyramid_bilinear(
                flat, aw, r0, jnp.asarray(uv),
                jnp.full(uv.shape[0], level, jnp.int32),
            )
        )
        np.testing.assert_allclose(
            out, ref_img.reshape(-1, 4), atol=1e-5,
            err_msg=f"shape {shape} mip {level}",
        )


def test_anisotropic_reduces_to_trilinear_when_isotropic():
    """With an isotropic footprint the aniso extent is 0, so the N taps
    collapse onto the trilinear sample exactly."""
    import jax.numpy as jnp

    from unclerenderer_tpu.ops import texture as tex

    rng = np.random.default_rng(2)
    H = W = 16
    # smooth isotropic uv field: uv = (x, y) / W (du/dx == dv/dy, no skew)
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    uv = jnp.asarray(np.stack([xx / W, yy / H], axis=-1))
    same = jnp.ones((H, W), bool)
    bw = jnp.full((H, W), 64.0)
    bh = jnp.full((H, W), 64.0)
    lod_a, dmaj, extent = tex.uv_screen_lod_aniso(uv, bw, bh, same, same, 8)
    lod_t = tex.uv_screen_lod(uv, bw, bh, same, same)
    # interior only: the last row/col have degenerate forward differences
    np.testing.assert_allclose(np.asarray(extent)[:-1, :-1], 0.0, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(lod_a)[:-1, :-1], np.asarray(lod_t)[:-1, :-1], atol=1e-5
    )


def test_anisotropic_lod_sharper_at_grazing():
    """A strongly anisotropic footprint (long in x) must pick a finer LOD
    than the isotropic max-axis rule, clamped by max_anisotropy."""
    import jax.numpy as jnp

    from unclerenderer_tpu.ops import texture as tex

    H = W = 8
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    # 16:1 anisotropy: u moves 16 texels/px, v moves 1
    uv = jnp.asarray(np.stack([xx * 16.0 / 64.0, yy * 1.0 / 64.0], axis=-1))
    same = jnp.ones((H, W), bool)
    bw = bh = jnp.full((H, W), 64.0)
    lod_iso = tex.uv_screen_lod(uv, bw, bh, same, same)
    for n, want_ratio in ((4, 4.0), (16, 16.0)):
        lod_a, dmaj, extent = tex.uv_screen_lod_aniso(uv, bw, bh, same, same, n)
        # minor axis is 1 texel/px -> lod 0 at full aniso; clamped at N=4
        # to rho_maj / 16 -> lod = log2(16/4) = 2
        want = np.log2(16.0 / min(n, 16.0))
        np.testing.assert_allclose(np.asarray(lod_a)[2, 2], want, atol=1e-4)
        assert float(np.asarray(lod_a)[2, 2]) < float(np.asarray(lod_iso)[2, 2])
        np.testing.assert_allclose(
            np.asarray(extent)[2, 2], 1.0 - 1.0 / min(n, 16), atol=1e-4
        )


def test_cube_pyramid_tri_matches_two_gather():
    """The packed-trilinear env atlas (one 64-lane gather,
    textures/atlas.py build_pyramid_tri_atlas + ops/texture.py
    sample_cube_pyramid_tri) must be BIT-EXACT vs the two-gather quad-atlas
    path for the same bf16-stored chains: random directions plus face
    centers/edges/corners, lods covering integer, fractional, 0, lmax and
    past-the-end clamping."""
    from unclerenderer_tpu.textures.atlas import build_pyramid_tri_atlas

    try:
        from ml_dtypes import bfloat16 as np_bf16
    except ImportError:  # pragma: no cover
        np_bf16 = np.float32

    rng = np.random.default_rng(23)
    chains = [
        generate_mips(rng.random((16, 16, 4), np.float32)) for _ in range(6)
    ]
    quad, rq = build_pyramid_quad_atlas(chains, wrap=False, dtype=np_bf16)
    tri, rt = build_pyramid_tri_atlas(chains, dtype=np_bf16)
    np.testing.assert_array_equal(rq, rt)

    n = 512
    dirs = rng.normal(size=(n, 3)).astype(np.float32)
    # exact face centers, edges and corners exercise the CLAMP paths
    specials = np.array(
        [[1, 0, 0], [-1, 0, 0], [0, 1, 0], [0, -1, 0], [0, 0, 1], [0, 0, -1],
         [1, 1, 0], [1, -1, 0], [1, 0, 1], [-1, 1, 1], [1, 1, 1], [-1, -1, -1],
         [1, 0.999, 0.999], [1, -0.999, 0.999]],
        np.float32,
    )
    dirs = jnp.asarray(np.concatenate([dirs, specials]))
    m = dirs.shape[0]
    lods = jnp.asarray(
        np.concatenate([
            rng.uniform(0.0, 4.0, m - 8).astype(np.float32),
            np.array([0.0, 1.0, 2.0, 3.0, 4.0, 3.5, 7.0, -1.0], np.float32),
        ])
    )
    ref = tex.sample_cube_pyramid(
        jnp.asarray(quad.astype(np.float32)).reshape(-1, 16), quad.shape[1],
        jnp.asarray(rq, jnp.float32), dirs, lods,
    )
    got = tex.sample_cube_pyramid_tri(
        jnp.asarray(tri.astype(np.float32)).reshape(-1, 64), tri.shape[1],
        jnp.asarray(rt, jnp.float32), dirs, lods,
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_cube_pyramid_tri_truncated_chain():
    """Prefiltered IBL cubes often stop their mip chain short of 1x1 (e.g.
    at 4x4): the packed-trilinear atlas must accept the truncated chain and
    stay bit-exact vs the two-gather quad path for lods clamped to the real
    last level (the caller clamp, ops/pbr.py) -- including exactly lmax,
    where the last level's self-referenced parent 3x3 gets weight 0."""
    from unclerenderer_tpu.textures.atlas import build_pyramid_tri_atlas

    rng = np.random.default_rng(31)
    chains = [
        generate_mips(rng.random((16, 16, 4), np.float32))[:3]  # 16,8,4
        for _ in range(6)
    ]
    quad, rq = build_pyramid_quad_atlas(chains, wrap=False)
    tri, rt = build_pyramid_tri_atlas(chains)
    lmax = float(len(chains[0]) - 1)
    dirs = jnp.asarray(rng.normal(size=(256, 3)).astype(np.float32))
    lods = jnp.asarray(
        np.concatenate([
            rng.uniform(0.0, lmax, 252).astype(np.float32),
            np.array([0.0, 1.0, 1.5, lmax], np.float32),
        ])
    )
    ref = tex.sample_cube_pyramid(
        jnp.asarray(quad).reshape(-1, 16), quad.shape[1],
        jnp.asarray(rq, jnp.float32), dirs, lods,
    )
    got = tex.sample_cube_pyramid_tri(
        jnp.asarray(tri).reshape(-1, 64), tri.shape[1],
        jnp.asarray(rt, jnp.float32), dirs, lods,
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_cube_pyramid_tri_flat_env():
    """The 1x1-chain degenerate case (flat fallback env, testing.py) returns
    the constant at every lod."""
    from unclerenderer_tpu.textures.atlas import build_pyramid_tri_atlas

    chains = [[np.full((1, 1, 4), 0.1, np.float32)] for _ in range(6)]
    tri, rt = build_pyramid_tri_atlas(chains)
    dirs = jnp.asarray(np.random.default_rng(5).normal(size=(32, 3)).astype(np.float32))
    lods = jnp.asarray(np.linspace(0.0, 3.0, 32, dtype=np.float32))
    out = np.asarray(
        tex.sample_cube_pyramid_tri(
            jnp.asarray(tri).reshape(-1, 64), tri.shape[1],
            jnp.asarray(rt, jnp.float32), dirs, lods,
        )
    )
    np.testing.assert_allclose(out, 0.1, atol=1e-6)


@pytest.mark.parametrize("wrap,c,shape,levels", [
    (True, 4, (32, 32), 6),      # square full chain, WRAP
    (False, 4, (32, 32), 6),     # CLAMP
    (True, 16, (64, 64), 7),     # combined-material channel count
    (True, 4, (16, 64), 7),      # wide rectangular (tall tail on w axis)
    (True, 4, (64, 16), 7),      # tall rectangular
    (True, 16, (64, 64), 4),     # truncated chain (stops at 8x8)
])
def test_pyramid_tri_matches_two_gather(wrap, c, shape, levels):
    """sample_pyramid_tri (ONE row gather over the packed tri atlas) must be
    BIT-EXACT vs sample_pyramid_trilinear (two quad gathers) for the same
    stored chains -- WRAP and CLAMP addressing, C=4 and C=16 channels,
    rectangular chains with saturated tails, truncated chains, tiling and
    negative uvs, lods hitting 0 / integers / fractions / lmax."""
    from unclerenderer_tpu.textures.atlas import (
        build_pyramid_quad_atlas,
        build_pyramid_tri_atlas,
    )

    rng = np.random.default_rng(int(shape[0]) * 131 + c + levels)
    h0, w0 = shape
    full = generate_mips(rng.random((h0, w0, 4), np.float32))
    if c != 4:
        # synthesize a C-channel chain by tiling the 4-channel mips
        full = [np.tile(m, (1, 1, c // 4)) for m in full]
    chains = [full[:levels], [m * 0.5 for m in full][:levels]]
    quad, rq = build_pyramid_quad_atlas(chains, wrap=wrap)
    tri, rt = build_pyramid_tri_atlas(chains, wrap=wrap)
    np.testing.assert_array_equal(rq, rt)
    assert tri.shape[-1] == 16 * c

    mode = tex.ADDRESS_WRAP if wrap else tex.ADDRESS_CLAMP
    n = 512
    uv = jnp.asarray(rng.uniform(-2.0, 3.0, (n, 2)).astype(np.float32))
    lmax = float(levels - 1)
    lods = jnp.asarray(
        np.concatenate([
            rng.uniform(0.0, lmax, n - 6).astype(np.float32),
            np.array([0.0, 1.0, 1.5, lmax - 0.25, lmax, -0.5], np.float32),
        ])
    )
    which = rng.integers(0, 2, n)
    rect = jnp.asarray(np.stack([rq[i] for i in which]).astype(np.float32))
    ref = tex.sample_pyramid_trilinear(
        jnp.asarray(quad).reshape(-1, 4 * c), quad.shape[1], rect, uv, lods, mode
    )
    got = tex.sample_pyramid_tri(
        jnp.asarray(tri).reshape(-1, 16 * c), tri.shape[1], rect, uv, lods, mode
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    # the packed atlas also serves single-level bilinear taps (lanes 0:4C)
    lvl = jnp.asarray(rng.integers(0, levels, n, dtype=np.int64), jnp.int32)
    ref_b = tex.sample_pyramid_bilinear(
        jnp.asarray(quad).reshape(-1, 4 * c), quad.shape[1], rect, uv, lvl, mode
    )
    got_b = tex.sample_pyramid_tri_level(
        jnp.asarray(tri).reshape(-1, 16 * c), tri.shape[1], rect, uv, lvl, mode
    )
    np.testing.assert_array_equal(np.asarray(got_b), np.asarray(ref_b))


def test_cube_extend_borders_are_cross_face():
    """_cube_extend: the 1-texel border of each extended face holds texels
    from OTHER faces (labeled-cube check), and the interior is untouched."""
    from unclerenderer_tpu.textures.atlas import _cube_extend

    s = 8
    faces = [np.full((s, s, 1), float(f), np.float32) for f in range(6)]
    exts = _cube_extend(faces)
    for f in range(6):
        np.testing.assert_array_equal(exts[f][1:-1, 1:-1, 0], faces[f][..., 0])
        border = np.concatenate([
            exts[f][0, :, 0], exts[f][-1, :, 0],
            exts[f][1:-1, 0, 0], exts[f][1:-1, -1, 0],
        ])
        assert (border != f).all(), f"face {f} border references itself"
        assert set(np.unique(border)) <= set(range(6))


def test_cube_seamless_continuity_and_interior_exactness():
    """cube=True atlas + sampler: (a) directions sweeping across a face
    edge produce a CONTINUOUS signal (the old clamped build steps at the
    edge); (b) interior samples are bit-identical to the clamped build
    (the seamless machinery only changes edge texels)."""
    from unclerenderer_tpu.textures.atlas import build_pyramid_tri_atlas

    rng = np.random.default_rng(41)
    s = 16

    # faces = smooth function of direction so cross-edge continuity is
    # meaningful: bake f(dir) = 0.5 + 0.5*dir at each texel center direction
    from unclerenderer_tpu.textures.atlas import _cube_face_dir

    faces = []
    for f in range(6):
        ys, xs = np.meshgrid(np.arange(s), np.arange(s), indexing="ij")
        uc = (xs + 0.5) / s * 2 - 1
        vc = (ys + 0.5) / s * 2 - 1
        d = _cube_face_dir(f, uc.astype(np.float64), vc.astype(np.float64))
        d = d / np.linalg.norm(d, axis=-1, keepdims=True)
        img = (0.5 + 0.5 * d).astype(np.float32)
        faces.append(np.concatenate([img, np.ones_like(img[..., :1])], -1))
    chains = [generate_mips(f) for f in faces]

    tri_seam, r_seam = build_pyramid_tri_atlas(chains, cube=True)
    tri_old, r_old = build_pyramid_tri_atlas(chains)
    assert tri_seam.shape[-1] == 128 and tri_old.shape[-1] == 64
    np.testing.assert_array_equal(r_seam, r_old)

    def sample(tri, r, dirs, lod=0.0):
        m = dirs.shape[0]
        return np.asarray(tex.sample_cube_pyramid_tri(
            jnp.asarray(tri).reshape(-1, tri.shape[-1]), tri.shape[1],
            jnp.asarray(r, jnp.float32), jnp.asarray(dirs),
            jnp.full((m,), lod, jnp.float32),
        ))

    # (a) sweep across the +X/+Z edge (x = z plane), through the edge at t=0
    t = np.linspace(-0.25, 0.25, 201, dtype=np.float32)
    dirs = np.stack([1.0 + t, np.full_like(t, 0.3), 1.0 - t], -1)
    for lod in (0.0, 1.0, 1.7):
        out = sample(tri_seam, r_seam, dirs, lod)[..., :3]
        jumps = np.abs(np.diff(out, axis=0)).max()
        out_old = sample(tri_old, r_old, dirs, lod)[..., :3]
        jumps_old = np.abs(np.diff(out_old, axis=0)).max()
        # texel step along the sweep is ~2/201 of a face; continuous
        # filtering keeps adjacent-sample jumps at the texel-quantization
        # scale, while the clamped build steps across the seam
        assert jumps <= jumps_old + 1e-6, (lod, jumps, jumps_old)
        assert jumps < 0.06, (lod, jumps)

    # (b) interior: face-center region samples identical in both builds
    t2 = np.linspace(-0.3, 0.3, 64, dtype=np.float32)
    interior = np.stack([np.ones_like(t2), t2, t2 * 0.5], -1)
    for lod in (0.0, 1.3):
        a = sample(tri_seam, r_seam, interior, lod)
        b = sample(tri_old, r_old, interior, lod)
        np.testing.assert_array_equal(a, b)


def test_u8_atlas_bit_exact_vs_decoded_f32():
    """The u8 combined-material atlas (round-5 staged experiment,
    RenderSettings.material_atlas_u8) must sample BIT-EXACTLY like an f32
    atlas holding the device-decoded bytes: the decode is elementwise, so
    decode(gather(x)) == gather(decode(x)) and every filter blend sees
    identical inputs.  Covers the packed-tri row gather, its bilinear
    tri_level slice, and the unpacked quad gather; plus byte round-trip
    exactness of the gamma-2.0 encode (encode(decode(b)) == b)."""
    from unclerenderer_tpu.ops.texture import _decode_combined_u8
    from unclerenderer_tpu.textures.atlas import build_pyramid_tri_atlas
    from unclerenderer_tpu.textures.image import COMBINED_C, encode_combined_u8

    rng = np.random.default_rng(27)
    c = COMBINED_C

    # byte round-trip: random bytes -> decoded linear f32 -> encode must
    # restore the exact bytes on every channel class (gamma-2.0 color
    # channels, linear rest)
    b = rng.integers(0, 256, (32, 32, c), dtype=np.int64).astype(np.uint8)
    lin = b.astype(np.float32) / 255.0
    for sl in (slice(0, 3), slice(8, 11)):
        lin[..., sl] = lin[..., sl] ** 2
    np.testing.assert_array_equal(encode_combined_u8(lin), b)

    full = generate_mips(rng.random((64, 64, 4), np.float32))
    chains_f32 = [
        [np.tile(m, (1, 1, c // 4)) for m in full],
        [np.tile(m * 0.5, (1, 1, c // 4)) for m in full],
    ]
    chains_u8 = [[encode_combined_u8(lv) for lv in ch] for ch in chains_f32]
    tri_u8, rt = build_pyramid_tri_atlas(chains_u8, wrap=True, dtype=np.uint8)
    assert tri_u8.dtype == np.uint8 and tri_u8.shape[-1] == 16 * c

    flat_u8 = jnp.asarray(tri_u8).reshape(-1, 16 * c)
    flat_f32 = _decode_combined_u8(flat_u8, c)  # one whole-table decode

    n = 512
    uv = jnp.asarray(rng.uniform(-2.0, 3.0, (n, 2)).astype(np.float32))
    lods = jnp.asarray(rng.uniform(0.0, 6.0, n).astype(np.float32))
    which = rng.integers(0, 2, n)
    rect = jnp.asarray(np.stack([rt[i] for i in which]).astype(np.float32))

    got = tex.sample_pyramid_tri(flat_u8, tri_u8.shape[1], rect, uv, lods)
    ref = tex.sample_pyramid_tri(flat_f32, tri_u8.shape[1], rect, uv, lods)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    lvl = jnp.asarray(rng.integers(0, 7, n, dtype=np.int64), jnp.int32)
    got_b = tex.sample_pyramid_tri_level(flat_u8, tri_u8.shape[1], rect, uv, lvl)
    ref_b = tex.sample_pyramid_tri_level(flat_f32, tri_u8.shape[1], rect, uv, lvl)
    np.testing.assert_array_equal(np.asarray(got_b), np.asarray(ref_b))

    quad_u8, rq = build_pyramid_quad_atlas(chains_u8, wrap=True, dtype=np.uint8)
    qflat_u8 = jnp.asarray(quad_u8).reshape(-1, 4 * c)
    qflat_f32 = _decode_combined_u8(qflat_u8, c)
    rect_q = jnp.asarray(np.stack([rq[i] for i in which]).astype(np.float32))
    got_q = tex.sample_pyramid_bilinear(qflat_u8, quad_u8.shape[1], rect_q, uv, lvl)
    ref_q = tex.sample_pyramid_bilinear(qflat_f32, quad_u8.shape[1], rect_q, uv, lvl)
    np.testing.assert_array_equal(np.asarray(got_q), np.asarray(ref_q))



def test_gather_rows_onehot_matmul_exact():
    """The MXU one-hot gather (small-table fast path) is bit-exact vs the
    plain row gather for bf16 and f32 tables, any index shape, including
    non-blk-divisible request counts."""
    import numpy as np
    import jax.numpy as jnp

    from unclerenderer_tpu.ops.texture import gather_rows_onehot_matmul

    rng = np.random.default_rng(2)
    for dtype in (jnp.bfloat16, jnp.float32):
        table = jnp.asarray(
            rng.standard_normal((1024, 128)).astype(np.float32), dtype)
        idx = jnp.asarray(
            rng.integers(0, 1024, (33, 7)).astype(np.int32))
        got = gather_rows_onehot_matmul(table, idx, blk=128, interpret=True)
        want = table[idx].astype(jnp.float32)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_env_select_kernel_matches_xla_decode():
    """The VMEM env decode (select_kernel=True, ops/texture.py
    _env_select_kernel) reproduces the XLA seamless decode: identical
    expressions on identical f32 values; the venues contract mul+add to
    fma differently, so the bound is the 1-2 ulp fma/reassociation noise
    (measured max rel 2.4e-7), far inside the frame gate's 1e-5."""
    from unclerenderer_tpu.textures.atlas import _cube_face_dir, build_pyramid_tri_atlas

    rng = np.random.default_rng(7)
    s = 16
    faces = []
    for f in range(6):
        img = rng.random((s, s, 4)).astype(np.float32)
        faces.append(img)
    chains = [generate_mips(f) for f in faces]
    tri_seam, r_seam = build_pyramid_tri_atlas(chains, cube=True)
    flat = jnp.asarray(tri_seam).reshape(-1, 128)
    r = jnp.asarray(r_seam, jnp.float32)

    m = 3000
    dirs = rng.normal(size=(m, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    lods = rng.uniform(0.0, 4.0, m).astype(np.float32)

    a = np.asarray(tex.sample_cube_pyramid_tri(
        flat, tri_seam.shape[1], r, jnp.asarray(dirs), jnp.asarray(lods),
    ))
    b = np.asarray(tex.sample_cube_pyramid_tri(
        flat, tri_seam.shape[1], r, jnp.asarray(dirs), jnp.asarray(lods),
        select_kernel=True, interpret=True,
    ))
    np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-7)

    # bf16 atlas (the production env dtype): same bit-equality (the kernel
    # converts in VMEM exactly where the XLA path converts)
    flat16 = flat.astype(jnp.bfloat16)
    a16 = np.asarray(tex.sample_cube_pyramid_tri(
        flat16, tri_seam.shape[1], r, jnp.asarray(dirs), jnp.asarray(lods),
    ))
    b16 = np.asarray(tex.sample_cube_pyramid_tri(
        flat16, tri_seam.shape[1], r, jnp.asarray(dirs), jnp.asarray(lods),
        select_kernel=True, interpret=True,
    ))
    np.testing.assert_allclose(a16, b16, rtol=1e-6, atol=1e-7)


def test_mat_select_kernel_matches_xla_decode():
    """The VMEM material decode (sample_pyramid_tri select_kernel=True)
    reproduces the XLA packed-trilinear tail on both u8 and bf16 atlases
    (fma/reassociation ulp bound, as the env kernel)."""
    from unclerenderer_tpu.textures.atlas import build_pyramid_tri_atlas
    from unclerenderer_tpu.textures.image import encode_combined_u8

    rng = np.random.default_rng(11)
    chains = []
    for i in range(3):
        base = rng.random((32, 32, 16)).astype(np.float32)
        chain = [base]
        while chain[-1].shape[0] > 1:
            n = chain[-1]
            chain.append(n[::2, ::2])
        chains.append(chain)
    for u8 in (False, True):
        ch = ([[encode_combined_u8(lv) for lv in c] for c in chains]
              if u8 else chains)
        tri, r0 = build_pyramid_tri_atlas(
            ch, wrap=True, dtype=(np.uint8 if u8 else np.float32))
        flat = jnp.asarray(tri).reshape(-1, tri.shape[-1])
        m = 2500
        uv = jnp.asarray(rng.uniform(-0.4, 1.6, (m, 2)).astype(np.float32))
        lods = jnp.asarray(rng.uniform(0.0, 4.5, m).astype(np.float32))
        rect = jnp.asarray(
            np.repeat(r0[rng.integers(0, 3, m)], 1, axis=0).astype(np.float32))
        a = np.asarray(tex.sample_pyramid_tri(
            flat, tri.shape[1], rect, uv, lods))
        b = np.asarray(tex.sample_pyramid_tri(
            flat, tri.shape[1], rect, uv, lods,
            select_kernel=True, interpret=True))
        np.testing.assert_allclose(
            a, b, rtol=1e-6, atol=1e-7, err_msg=f"u8={u8}")
