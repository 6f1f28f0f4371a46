"""Texture pipeline: PNG decode vs PIL oracle, DDS/BC decode on the
reference's own assets, mip generation, atlas packing."""

import numpy as np
import pytest

from unclerenderer_tpu.textures.atlas import MAX_MIPS, build_atlas
from unclerenderer_tpu.textures.dds import load_dds
from unclerenderer_tpu.textures.image import (
    TextureCache,
    default_grid_texture,
    generate_mips,
    load_image,
)
from unclerenderer_tpu.textures.png import decode_png, load_png


def _pil_png(path):
    from PIL import Image

    return np.asarray(Image.open(path).convert("RGBA"), np.uint8)


def test_png_matches_pil_box(reference_assets):
    p = reference_assets / "BoxTextured" / "CesiumLogoFlat.png"
    mine = load_png(p)
    ref = _pil_png(p)
    assert mine is not None
    assert mine.shape == ref.shape
    np.testing.assert_array_equal(mine, ref)


def test_png_matches_pil_duck(reference_assets):
    p = reference_assets / "Duck" / "DuckCM.png"
    mine = load_png(p)
    ref = _pil_png(p)
    np.testing.assert_array_equal(mine, ref)


def test_png_synthetic_roundtrip(tmp_path):
    from PIL import Image

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (37, 53, 4), np.uint8)  # odd sizes
    p = tmp_path / "t.png"
    Image.fromarray(img, "RGBA").save(p)
    mine = load_png(p)
    np.testing.assert_array_equal(mine, img)


def test_png_grayscale(tmp_path):
    from PIL import Image

    img = (np.arange(64 * 64) % 256).astype(np.uint8).reshape(64, 64)
    p = tmp_path / "g.png"
    Image.fromarray(img, "L").save(p)
    mine = load_png(p)
    assert mine.shape == (64, 64, 4)
    np.testing.assert_array_equal(mine[..., 0], img)
    np.testing.assert_array_equal(mine[..., 3], 255)


def test_png_palette(tmp_path):
    from PIL import Image

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (16, 16, 3), np.uint8)
    pal = Image.fromarray(img, "RGB").quantize(colors=16)
    p = tmp_path / "p.png"
    pal.save(p)
    mine = load_png(p)
    ref = _pil_png(p)
    np.testing.assert_array_equal(mine, ref)


def test_dds_bc1(reference_assets):
    dds = load_dds(reference_assets / "sponza" / "textures" / "background.dds")
    assert dds is not None
    assert dds.width == 1024 and dds.height == 1024
    assert dds.mip_count == 11
    assert not dds.is_cube
    mip0 = dds.mips[0][0]
    assert mip0.shape == (1024, 1024, 4)
    assert mip0.dtype == np.uint8
    # Plausible image content (not constant).
    assert mip0[..., :3].std() > 5
    # Mip sizes halve.
    assert dds.mips[0][1].shape == (512, 512, 4)
    assert dds.mips[0][10].shape == (1, 1, 4)


def test_dds_bc5_normal_map(reference_assets):
    dds = load_dds(reference_assets / "sponza" / "textures" / "background_bump.dds")
    assert dds is not None
    mip0 = dds.mips[0][0]
    # BC5: RG channels active, B zeroed.
    assert mip0[..., 0].std() > 1
    assert np.all(mip0[..., 2] == 0)
    # Normal maps hover around 128 in both channels.
    assert 100 < mip0[..., 0].mean() < 156
    assert 100 < mip0[..., 1].mean() < 156


def test_dds_bc3_alpha(reference_assets):
    dds = load_dds(
        reference_assets / "sponza" / "textures" / "chain_texture-chain_texture_mask.dds"
    )
    assert dds is not None
    mip0 = dds.mips[0][0]
    # Chain mask has both opaque and transparent regions.
    assert mip0[..., 3].min() < 50
    assert mip0[..., 3].max() > 200


def test_dds_uncompressed_brdf_lut(reference_assets):
    dds = load_dds(reference_assets / "Textures" / "PreintegratedGF.dds")
    assert dds is not None
    assert dds.width == 128 and dds.height == 32
    lut = dds.mips[0][0]
    assert lut.shape == (32, 128, 4)
    assert lut.dtype == np.float32  # R16G16_UNORM -> [0,1] floats
    # BRDF split-sum LUT: the scale term approaches 1 at grazing/low-rough.
    assert lut[..., 0].max() > 0.5
    assert 0.0 <= lut[..., 1].min() and lut[..., 1].max() <= 1.0


def test_bc_native_matches_numpy(reference_assets):
    """The C++ and numpy BC decoders must agree bit-exactly."""
    from unclerenderer_tpu.textures import native
    from unclerenderer_tpu.textures.dds import _decode_bc_numpy

    if native.get_native() is None:
        pytest.skip("native library not built")
    raw = (reference_assets / "sponza" / "textures" / "lion.dds").read_bytes()
    block_data = raw[128 : 128 + (256 // 4) * (256 // 4) * 8]  # 256x256 worth of BC1
    a = native.bc_decode(block_data, 256, 256, 1)
    b = _decode_bc_numpy(block_data, 256, 256, 1)
    np.testing.assert_array_equal(a, b)


def test_generate_mips():
    img = np.ones((8, 4, 4), np.float32)
    img[0:4] = 0.0
    mips = generate_mips(img)
    assert [m.shape[:2] for m in mips] == [(8, 4), (4, 2), (2, 1), (1, 1)]
    assert mips[-1][0, 0, 0] == pytest.approx(0.5)


def test_atlas_pack_and_lookup():
    rng = np.random.default_rng(0)
    chains = [
        generate_mips(rng.random((64, 64, 4), np.float32).astype(np.float32)),
        generate_mips(rng.random((32, 16, 4), np.float32).astype(np.float32)),
        generate_mips(np.full((4, 4, 4), 0.25, np.float32)),
    ]
    atlas = build_atlas(chains)
    assert atlas.num_textures == 3
    # Every mip is retrievable from its rect.
    for t, chain in enumerate(chains):
        for lv, img in enumerate(chain):
            x, y = atlas.mip_x[t, lv], atlas.mip_y[t, lv]
            w, h = atlas.mip_w[t, lv], atlas.mip_h[t, lv]
            assert (h, w) == img.shape[:2]
            np.testing.assert_array_equal(atlas.data[y : y + h, x : x + w], img)
        # LOD clamp baked in: tail entries repeat the 1x1 mip.
        assert atlas.mip_w[t, MAX_MIPS - 1] == 1
        assert atlas.mip_h[t, MAX_MIPS - 1] == 1
    # No overlaps: paint rects and check each texel painted at most once.
    mask = np.zeros(atlas.data.shape[:2], np.int32)
    for t in range(3):
        for lv in range(len(chains[t])):
            x, y = atlas.mip_x[t, lv], atlas.mip_y[t, lv]
            w, h = atlas.mip_w[t, lv], atlas.mip_h[t, lv]
            mask[y : y + h, x : x + w] += 1
    assert mask.max() == 1


def test_texture_cache_defaults():
    cache = TextureCache()
    mips = cache.load_or_default("/nonexistent/missing.png")
    assert mips[0].shape == (256, 256, 4)
    # cached: same object back
    assert cache.load_or_default("/nonexistent/missing.png") is mips
    solid = cache.load_or_solid("", [0.5, 0.5, 1.0, 1.0])
    np.testing.assert_allclose(solid[0][0, 0], [0.5, 0.5, 1.0, 1.0])


def test_load_image_srgb_linearizes(reference_assets):
    lin = load_image(reference_assets / "Duck" / "DuckCM.png", srgb=True)
    raw = load_image(reference_assets / "Duck" / "DuckCM.png", srgb=False)
    # sRGB decode darkens midtones.
    assert lin[0][..., :3].mean() < raw[0][..., :3].mean()
    # Alpha untouched.
    np.testing.assert_array_equal(lin[0][..., 3], raw[0][..., 3])


def test_default_grid():
    g = default_grid_texture()
    assert g.shape == (256, 256, 4)
    assert len(np.unique(g[..., 0])) == 2


def test_bc7_decode(reference_assets):
    from unclerenderer_tpu.textures import native

    if native.get_native() is None:
        pytest.skip("native library not built")
    dds = load_dds(
        reference_assets / "pica_pica" / "textures" / "Decal_Caution_baseColor.dds"
    )
    assert dds is not None
    mip0 = dds.mips[0][0]
    assert mip0.shape == (512, 512, 4) and mip0.dtype == np.uint8
    # Caution decal: black + yellow diagonal stripes.
    rgb = mip0[..., :3].astype(np.float32)
    yellowish = (rgb[..., 0] > 150) & (rgb[..., 1] > 120) & (rgb[..., 2] < 100)
    darkish = rgb.max(axis=-1) < 80
    assert 0.2 < yellowish.mean() < 0.8
    assert 0.2 < darkish.mean() < 0.8
    assert yellowish.mean() + darkish.mean() > 0.95


def test_bc6h_env_cube(reference_assets):
    from unclerenderer_tpu.textures import native

    if native.get_native() is None:
        pytest.skip("native library not built")
    dds = load_dds(reference_assets / "Textures" / "output_pmrem.dds")
    assert dds is not None
    assert dds.is_cube and dds.mip_count == 9
    assert len(dds.mips) == 6
    mip0 = dds.mips[0][0]
    assert mip0.shape == (256, 256, 4) and mip0.dtype == np.float32
    # HDR environment: positive, plausible radiance range, not constant.
    assert mip0[..., :3].min() >= 0.0
    assert 0.5 < mip0[..., :3].max() < 100.0
    assert mip0[..., :3].std() > 0.05
    # mip chain decodes down to 1x1
    assert dds.mips[0][8].shape == (1, 1, 4)
    # faces differ (not garbage repetition)
    assert not np.allclose(dds.mips[0][0], dds.mips[1][0])


def _dds_header_rgba8(width, height, mips, *, depth=0, flags_extra=0,
                      caps2=0, dx10=None):
    """Minimal DDS header builder (RGBA8 masks or DX10 extension)."""
    import struct

    flags = 0x1 | 0x2 | 0x4 | 0x1000 | (0x20000 if mips > 1 else 0) | flags_extra
    hdr = b"DDS " + struct.pack(
        "<7I", 124, flags, height, width, width * 4, depth, mips
    )
    hdr += b"\x00" * 44  # reserved
    if dx10 is not None:
        hdr += struct.pack("<2I4s5I", 32, 0x4, b"DX10", 0, 0, 0, 0, 0)
    else:
        hdr += struct.pack(
            "<2I4s6I", 32, 0x40, b"\x00\x00\x00\x00", 32,
            0x000000FF, 0x0000FF00, 0x00FF0000, 0xFF000000, 0,
        )[:32]
    hdr += struct.pack("<5I", 0x1000 | (0x400000 if mips > 1 else 0), caps2, 0, 0, 0)
    assert len(hdr) == 128, len(hdr)
    if dx10 is not None:
        hdr += struct.pack("<5I", *dx10)  # dxgi, dim, misc, arraySize, misc2
    return hdr


def test_dds_volume_texture(tmp_path):
    """3D (volume) DDS: depth slices per mip, depth halving per level
    (TextureLoader.cpp:178-363 parity)."""
    rng = np.random.default_rng(0)
    w = h = d = 4
    mips = 2
    vol0 = rng.integers(0, 255, (d, h, w, 4), dtype=np.uint8)
    vol1 = rng.integers(0, 255, (d // 2, h // 2, w // 2, 4), dtype=np.uint8)
    payload = vol0.tobytes() + vol1.tobytes()
    # legacy header: DDSD_DEPTH + DDSCAPS2_VOLUME
    f = tmp_path / "vol.dds"
    f.write_bytes(
        _dds_header_rgba8(w, h, mips, depth=d, flags_extra=0x800000,
                          caps2=0x200000) + payload
    )
    img = load_dds(f)
    assert img is not None and img.is_volume and img.depth == 4
    assert len(img.mips) == 1 and len(img.mips[0]) == 2
    np.testing.assert_array_equal(img.mips[0][0], vol0)
    np.testing.assert_array_equal(img.mips[0][1], vol1)


def test_dds_texture_array(tmp_path):
    """DX10 texture array: one full mip chain per item."""
    import struct

    rng = np.random.default_rng(1)
    w = h = 4
    items = [rng.integers(0, 255, (h, w, 4), dtype=np.uint8) for _ in range(3)]
    # DXGI_RGBA8 = 28, dim 3 = TEXTURE2D, arraySize 3
    f = tmp_path / "arr.dds"
    f.write_bytes(
        _dds_header_rgba8(w, h, 1, dx10=(28, 3, 0, 3, 0))
        + b"".join(i.tobytes() for i in items)
    )
    img = load_dds(f)
    assert img is not None and img.array_size == 3 and not img.is_volume
    assert len(img.mips) == 3
    for got, want in zip(img.mips, items):
        np.testing.assert_array_equal(got[0], want)


def test_sponza_material_chains_from_reference():
    """The Sponza-class bench tier's material source: real DDS sets +
    factors parsed from Assets/sponza/untitled.gltf (geometry .bin is
    missing from the checkout; materials/textures are not).  Skips when the
    reference assets are unavailable."""
    import pytest

    from unclerenderer_tpu.render.testing import sponza_material_chains

    sp = sponza_material_chains(max_combos=3)
    if sp is None:
        pytest.skip("sponza gltf/textures unavailable")
    chains, factors = sp
    assert len(chains) == len(factors) >= 2
    for ch in chains:
        # combined 16-channel chains, capped at 512 (the round-5 judged
        # default -- UNCLE_SPONZA_CAP), full mip pyramid
        assert ch[0].shape[-1] == 16
        assert max(ch[0].shape[:2]) <= 512
        assert ch[-1].shape[:2] == (1, 1)
    # the gltf's real constants ride along (sponza is non-metallic)
    assert all(float(f["metallic"]) == 0.0 for f in factors)
    assert all(0.5 < float(f["roughness"]) <= 1.0 for f in factors)
    # normal maps are RG-encoded (BC5): the combined normal slot must not
    # be the neutral flat value everywhere for a material that has one
    nm = chains[0][0][..., 6:8]
    assert float(np.abs(nm - 0.5).max()) > 0.05
