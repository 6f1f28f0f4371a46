"""Math foundations vs closed-form DirectXMath values."""

import numpy as np
import pytest

from unclerenderer_tpu import mathlib as m


def test_look_to_lh_origin_identity():
    v = m.look_to_lh([0, 0, 0], [0, 0, 1], [0, 1, 0])
    np.testing.assert_allclose(v, np.eye(4), atol=1e-6)


def test_look_to_lh_transforms_eye_to_origin():
    eye = np.array([1.0, 2.0, 3.0], np.float32)
    v = m.look_to_lh(eye, [0, 0, 1], [0, 1, 0])
    p = np.append(eye, 1.0) @ v
    np.testing.assert_allclose(p[:3], 0.0, atol=1e-6)


def test_look_at_lh_target_on_positive_z():
    eye = np.array([5.0, 1.0, -2.0], np.float32)
    target = np.array([0.0, 0.5, 4.0], np.float32)
    v = m.look_at_lh(eye, target, [0, 1, 0])
    p = np.append(target, 1.0) @ v
    assert p[0] == pytest.approx(0.0, abs=1e-5)
    assert p[1] == pytest.approx(0.0, abs=1e-5)
    assert p[2] == pytest.approx(np.linalg.norm(target - eye), abs=1e-5)


def test_reverse_z_infinite_projection():
    near = 0.1
    proj = m.perspective_reverse_z_infinite(np.pi / 2, 1.0, near)
    # Point exactly on the near plane -> z_ndc = 1.
    p = np.array([0.0, 0.0, near, 1.0], np.float32) @ proj
    assert p[2] / p[3] == pytest.approx(1.0)
    # Far away -> z_ndc -> 0.
    p = np.array([0.0, 0.0, 1e6, 1.0], np.float32) @ proj
    assert p[2] / p[3] == pytest.approx(0.0, abs=1e-6)
    # w_clip carries view z.
    assert p[3] == pytest.approx(1e6)
    # fov 90deg -> x scale 1.
    p = np.array([3.0, 0.0, 3.0, 1.0], np.float32) @ proj
    assert p[0] / p[3] == pytest.approx(1.0)


def test_orthographic_lh():
    proj = m.orthographic_lh(20.0, 10.0, 1.0, 11.0)
    p = np.array([10.0, 5.0, 11.0, 1.0], np.float32) @ proj
    np.testing.assert_allclose(p[:3] / p[3], [1.0, 1.0, 1.0], atol=1e-6)
    p = np.array([0.0, 0.0, 1.0, 1.0], np.float32) @ proj
    assert p[2] / p[3] == pytest.approx(0.0, abs=1e-7)


def test_rotation_roll_pitch_yaw_forward():
    # (0,0,1) rotated by yaw 90deg -> +X.
    rot = m.rotation_roll_pitch_yaw(0.0, np.pi / 2, 0.0)
    f = np.array([0, 0, 1, 0], np.float32) @ rot
    np.testing.assert_allclose(f[:3], [1, 0, 0], atol=1e-6)
    # pitch +90deg -> down (-Y): forward = (cosP sinY, -sinP, cosP cosY).
    rot = m.rotation_roll_pitch_yaw(np.pi / 2, 0.0, 0.0)
    f = np.array([0, 0, 1, 0], np.float32) @ rot
    np.testing.assert_allclose(f[:3], [0, -1, 0], atol=1e-6)


def test_forward_from_pitch_yaw_matches_matrix():
    for pitch, yaw in [(0.3, -1.2), (-0.9, 2.5), (0.0, 0.0)]:
        rot = m.rotation_roll_pitch_yaw(pitch, yaw, 0.0)
        f = (np.array([0, 0, 1, 0], np.float32) @ rot)[:3]
        np.testing.assert_allclose(f, m.forward_from_pitch_yaw(pitch, yaw), atol=1e-6)


def test_light_vector_is_y_flip():
    d = [-0.5, -1.0, -0.3]
    lv = m.light_vector_from_scene_direction(d)
    dn = np.asarray(d) / np.linalg.norm(d)
    np.testing.assert_allclose(lv, [dn[0], -dn[1], dn[2]], atol=1e-6)


def test_quaternion_to_matrix_axis_angle():
    # 90deg about Y: quaternion (0, sin45, 0, cos45).
    s = np.sin(np.pi / 4)
    q = [0.0, s, 0.0, np.cos(np.pi / 4)]
    rot = m.quaternion_to_matrix(q)
    v = np.array([0, 0, 1, 0], np.float32) @ rot
    # LH Y-rotation by +90deg takes +Z to +X... for row-vector DirectX
    # convention, same as rotation_y.
    ref = np.array([0, 0, 1, 0], np.float32) @ m.rotation_y(np.pi / 2)
    np.testing.assert_allclose(v, ref, atol=1e-6)


def test_halton_sequence():
    # Known values: base 2 -> 1/2, 1/4, 3/4, 1/8...
    assert m.halton(1, 2) == pytest.approx(0.5)
    assert m.halton(2, 2) == pytest.approx(0.25)
    assert m.halton(3, 2) == pytest.approx(0.75)
    assert m.halton(1, 3) == pytest.approx(1 / 3)
    assert m.halton(2, 3) == pytest.approx(2 / 3)
    assert m.halton(3, 3) == pytest.approx(1 / 9)


def test_frustum_planes_contain_visible_point():
    view = m.look_to_lh([0, 0, 0], [0, 0, 1], [0, 1, 0])
    proj = m.perspective_reverse_z_infinite(np.pi / 2, 1.0, 0.1)
    planes = m.frustum_planes_from_view_proj(view @ proj)
    assert planes.shape == (6, 4)
    # In front of the camera, inside the 90deg cone.
    assert m.aabb_vs_frustum(planes, [-0.1, -0.1, 4.9], [0.1, 0.1, 5.1])
    # Behind the camera.
    assert not m.aabb_vs_frustum(planes, [-0.1, -0.1, -5.1], [0.1, 0.1, -4.9])
    # Far to the left.
    assert not m.aabb_vs_frustum(planes, [-50.1, -0.1, 4.9], [-49.9, 0.1, 5.1])
    # Closer than the near plane.
    assert not m.aabb_vs_frustum(planes, [-0.001, -0.001, 0.01], [0.001, 0.001, 0.02])


def test_aabb_straddling_frustum_is_visible():
    view = m.look_to_lh([0, 0, 0], [0, 0, 1], [0, 1, 0])
    proj = m.perspective_reverse_z_infinite(np.pi / 2, 1.0, 0.1)
    planes = m.frustum_planes_from_view_proj(view @ proj)
    assert m.aabb_vs_frustum(planes, [-100, -100, -100], [100, 100, 100])


def test_transform_aabb():
    world = m.scaling([2.0, 1.0, 1.0]) @ m.translation([10.0, 0.0, 0.0])
    bmin, bmax = m.transform_aabb([-1, -1, -1], [1, 1, 1], world)
    np.testing.assert_allclose(bmin, [8, -1, -1], atol=1e-6)
    np.testing.assert_allclose(bmax, [12, 1, 1], atol=1e-6)


def test_taa_jitter_range():
    for i in range(16):
        j = m.taa_jitter(i)
        assert np.all(np.abs(j) <= 0.5)


def test_jittered_projection_offsets_ndc():
    proj = m.perspective_reverse_z_infinite(np.pi / 2, 1.0, 0.1)
    jp = m.jittered_projection(proj, np.array([0.5, 0.25], np.float32), 100, 50)
    p = np.array([0.0, 0.0, 2.0, 1.0], np.float32) @ jp
    # NDC offset = 2*jx/W = 0.01, 2*jy/H = 0.01.
    assert p[0] / p[3] == pytest.approx(0.01)
    assert p[1] / p[3] == pytest.approx(0.01)


def test_directional_light_view_proj_centers_scene():
    center = np.array([1.0, 2.0, 3.0], np.float32)
    vp = m.build_directional_light_view_proj(center, 10.0, [0.0, 1.0, 0.0001])
    p = np.append(center, 1.0) @ vp
    ndc = p[:3] / p[3]
    assert abs(ndc[0]) < 1e-3 and abs(ndc[1]) < 1e-3
    assert 0.0 < ndc[2] < 1.0


def test_srgb_roundtrip():
    x = np.linspace(0, 1, 64, dtype=np.float32)
    np.testing.assert_allclose(m.srgb_to_linear(m.linear_to_srgb(x)), x, atol=1e-5)
