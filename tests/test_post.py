"""Post stack, HZB and culling: ports verified against closed-form values."""

import numpy as np
import jax.numpy as jnp
import pytest

from unclerenderer_tpu.ops.post import (
    auto_exposure_ev,
    cas_sharpen,
    pbr_neutral_tonemap,
    temporal_aa,
    tonemap,
)
from unclerenderer_tpu.ops.hzb import build_hzb, hzb_layout, hzb_load
from unclerenderer_tpu.ops.cull import frustum_cull, occlusion_cull
from unclerenderer_tpu import mathlib as m


def _ref_pbr_neutral(color):
    """Scalar reference of Tonemap.hlsl:34-57."""
    start_compression = 0.8 - 0.04
    desaturation = 0.15
    color = np.array(color, np.float64)
    x = color.min()
    offset = x - 6.25 * x * x if x < 0.08 else 0.04
    color = color - offset
    peak = color.max()
    if peak < start_compression:
        return color
    d = 1.0 - start_compression
    new_peak = 1.0 - d * d / (peak + d - start_compression)
    color = color * (new_peak / max(peak, 1e-4))
    g = 1.0 - 1.0 / (desaturation * (peak - new_peak) + 1.0)
    return color * (1 - g) + new_peak * np.ones(3) * g


def test_pbr_neutral_matches_reference_scalar():
    cases = [
        [0.1, 0.2, 0.3],
        [0.5, 0.5, 0.5],
        [1.5, 0.3, 0.1],
        [4.0, 4.0, 4.0],
        [0.02, 0.01, 0.005],
        [0.9, 0.85, 0.8],
    ]
    got = np.asarray(pbr_neutral_tonemap(jnp.asarray(cases, jnp.float32)))
    for i, c in enumerate(cases):
        np.testing.assert_allclose(got[i], _ref_pbr_neutral(c), rtol=1e-4, atol=1e-5)


def test_tonemap_gamma_and_exposure():
    hdr = jnp.full((4, 4, 3), 0.25, jnp.float32)
    out = tonemap(hdr, jnp.float32(2.0), jnp.float32(0.0), False, False, jnp.float32(2.2))
    np.testing.assert_allclose(np.asarray(out), 0.5 ** (1 / 2.2), rtol=1e-5)
    # auto exposure multiplies by exp2(ev)
    out2 = tonemap(hdr, jnp.float32(1.0), jnp.float32(1.0), False, True, jnp.float32(2.2))
    np.testing.assert_allclose(np.asarray(out2), 0.5 ** (1 / 2.2), rtol=1e-5)


def test_temporal_aa_clamps_history():
    cur = jnp.full((8, 8, 3), 0.5, jnp.float32)
    hist = jnp.full((8, 8, 3), 5.0, jnp.float32)  # way outside neighborhood
    out = temporal_aa(cur, hist, jnp.float32(0.9), jnp.array(True))
    # history clamped to neighborhood (all 0.5) -> output 0.5
    np.testing.assert_allclose(np.asarray(out), 0.5, atol=1e-6)
    # without history: pass through
    out2 = temporal_aa(cur, hist, jnp.float32(0.9), jnp.array(False))
    np.testing.assert_allclose(np.asarray(out2), 0.5)
    # in-range history blends by weight
    hist3 = jnp.full((8, 8, 3), 0.4, jnp.float32)
    cur3 = cur.at[4, 4].set(jnp.asarray([0.3, 0.3, 0.3]))
    out3 = temporal_aa(cur3, hist3, jnp.float32(0.9), jnp.array(True))
    assert np.asarray(out3)[4, 4, 0] == pytest.approx(0.3 + (0.4 - 0.3) * 0.9, abs=1e-6)


def test_auto_exposure_converges_to_key():
    hdr = jnp.full((64, 64, 3), 0.5, jnp.float32)
    lum = float(np.dot([0.5, 0.5, 0.5], [0.2126, 0.7152, 0.0722]))
    ev = auto_exposure_ev(
        hdr, jnp.float32(0.0), jnp.array(False),
        jnp.float32(0.3), jnp.float32(0.1), jnp.float32(5.0),
        jnp.float32(3.0), jnp.float32(1.0), jnp.float32(1 / 60),
    )
    expect = np.clip(np.log2(0.3) - np.log2(lum), np.log2(0.1), np.log2(5.0))
    assert float(ev) == pytest.approx(expect, abs=1e-4)
    # temporal adaptation moves partially toward target
    ev2 = auto_exposure_ev(
        hdr, jnp.float32(0.0), jnp.array(True),
        jnp.float32(0.3), jnp.float32(0.1), jnp.float32(5.0),
        jnp.float32(3.0), jnp.float32(1.0), jnp.float32(1 / 60),
    )
    alpha = 1.0 - np.exp(-(1 / 60) * (3.0 if expect > 0 else 1.0))
    assert float(ev2) == pytest.approx(expect * alpha, abs=1e-4)


def test_cas_sharpens_edges():
    img = np.zeros((16, 16, 3), np.float32)
    img[:, 8:] = 1.0
    out = np.asarray(cas_sharpen(jnp.asarray(img), jnp.float32(0.5)))
    # flat regions unchanged
    np.testing.assert_allclose(out[:, :6], 0.0, atol=1e-4)
    np.testing.assert_allclose(out[:, 10:], 1.0, atol=1e-4)
    # edge contrast increases (values overshoot outside [0,1] range pre-clamp
    # or move toward extremes at the transition)
    assert out[8, 7, 0] <= img[8, 7, 0] + 1e-6
    assert out[8, 8, 0] >= img[8, 8, 0] - 1e-6


def test_hzb_build_and_load():
    depth = np.zeros((16, 16), np.float32)
    depth[0:8, 0:8] = 0.9  # near block
    depth[8:, 8:] = 0.2
    layout, total = hzb_layout(8, 8)
    pyr = np.asarray(build_hzb(jnp.asarray(depth), layout))
    assert pyr.shape == (total,)
    # mip0 (8x8): each texel = min of 2x2
    assert hzb_load(jnp.asarray(pyr), layout, jnp.int32(0), jnp.int32(0), jnp.int32(0)) == pytest.approx(0.9)
    assert hzb_load(jnp.asarray(pyr), layout, jnp.int32(0), jnp.int32(7), jnp.int32(0)) == pytest.approx(0.0)
    # last mip = global min
    last = len(layout) - 1
    assert hzb_load(jnp.asarray(pyr), layout, jnp.int32(last), jnp.int32(0), jnp.int32(0)) == pytest.approx(0.0)


def test_frustum_cull_vectorized_matches_scalar():
    view = m.look_to_lh([0, 0, 0], [0, 0, 1], [0, 1, 0])
    proj = m.perspective_reverse_z_infinite(np.pi / 2, 1.0, 0.1)
    planes = m.frustum_planes_from_view_proj(view @ proj)
    rng = np.random.default_rng(1)
    centers = rng.uniform(-20, 20, (64, 3)).astype(np.float32)
    bmin = centers - 1.0
    bmax = centers + 1.0
    got = np.asarray(frustum_cull(jnp.asarray(bmin), jnp.asarray(bmax), jnp.asarray(planes)))
    for i in range(64):
        assert got[i] == m.aabb_vs_frustum(planes, bmin[i], bmax[i])


def test_occlusion_cull_behind_big_occluder():
    view = m.look_to_lh([0, 0, 0], [0, 0, 1], [0, 1, 0])
    proj = m.perspective_reverse_z_infinite(np.pi / 2, 1.0, 0.1)
    vp = jnp.asarray(view @ proj)
    layout, total = hzb_layout(32, 32)
    # HZB of a full-screen wall at view z=5 (z_ndc = 0.1/5 = 0.02)
    depth_full = np.full((64, 64), 0.02, np.float32)
    pyr = build_hzb(jnp.asarray(depth_full), layout)
    bmin = jnp.asarray([[-1, -1, 9], [-1, -1, 2]], jnp.float32)
    bmax = jnp.asarray([[1, 1, 11], [1, 1, 3]], jnp.float32)
    occ = np.asarray(
        occlusion_cull(bmin, bmax, vp, pyr, layout, 32, 32)
    )
    assert occ[0]  # behind the wall -> occluded
    assert not occ[1]  # in front of the wall -> visible


@pytest.mark.parametrize("shape", [(64, 64), (60, 34), (128, 72)])
def test_hzb_pallas_tail_bit_exact(shape):
    """The single-launch Pallas tail cascade (build_hzb pallas_tail=True,
    interpret mode) must produce the identical packed pyramid as the XLA
    reduction chain -- including odd-dimension crop/clamp levels."""
    h, w = shape
    rng = np.random.default_rng(h * 7 + w)
    depth = jnp.asarray(rng.random((h, w)).astype(np.float32))
    layout, _total = hzb_layout(w // 2, h // 2)
    ref = np.asarray(build_hzb(depth, layout))
    got = np.asarray(build_hzb(depth, layout, pallas_tail=True, interpret=True))
    np.testing.assert_array_equal(got, ref)
