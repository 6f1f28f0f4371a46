"""Scene layer: config INI, scene JSON, glTF loading, procedural meshes,
scene build against the reference's own assets."""

import numpy as np
import pytest

from unclerenderer_tpu.core.config import RendererConfig, load_config
from unclerenderer_tpu.scene.build import build_scene
from unclerenderer_tpu.scene.camera import Camera
from unclerenderer_tpu.scene.gltf import load_gltf
from unclerenderer_tpu.scene.mesh import (
    compute_mesh_bounds,
    create_cube,
    create_sphere,
    generate_normals_if_missing,
    generate_tangents_if_missing,
)
from unclerenderer_tpu.scene.scene_json import load_scene_json


def test_config_defaults(tmp_path):
    cfg = load_config(tmp_path / "missing.ini")
    assert cfg.renderer_type == "deferred"
    assert cfg.frames_in_flight == 3
    assert cfg.tonemap_gamma == pytest.approx(2.2)


def test_config_parses_reference_ini(reference_assets):
    cfg = load_config(reference_assets.parent / "bin" / "RendererConfig.ini")
    assert cfg.renderer_type == "deferred"
    assert cfg.scene_file.endswith("sponza.json")
    assert cfg.frames_in_flight == 3
    assert cfg.enable_frame_overlap is False
    assert cfg.enable_gpu_timing is True
    assert cfg.enable_indirect_draw is True
    assert cfg.enable_auto_exposure is False
    assert cfg.use_depth_prepass is True  # last DepthPrepass=true wins


def test_config_aliases(tmp_path):
    ini = tmp_path / "c.ini"
    ini.write_text("Renderer=Forward\nTAA=0\nresolution=1920x1080\ncas=false\n")
    cfg = load_config(ini)
    assert cfg.renderer_type == "forward"
    assert cfg.enable_taa is False
    assert cfg.window_width == 1920 and cfg.window_height == 1080
    assert cfg.enable_cas is False


def test_scene_json_box(reference_assets):
    models, light, camera = load_scene_json(reference_assets / "Scenes" / "BoxTextured.json")
    assert len(models) == 1
    assert models[0].mesh_path == "BoxTextured/BoxTextured.gltf"
    assert light is not None
    np.testing.assert_allclose(light.direction, [-0.5, -1.0, -0.3], atol=1e-6)
    assert light.intensity == pytest.approx(3.0)
    assert camera is not None
    assert camera.look_at is not None
    assert camera.fov_y_degrees == pytest.approx(60.0)


def test_scene_json_sponza_rotation_light(reference_assets):
    models, light, camera = load_scene_json(reference_assets / "Scenes" / "sponza.json")
    assert len(models) == 1
    np.testing.assert_allclose(models[0].scale, [0.01, 0.01, 0.01], atol=1e-8)
    # Light from rotation euler [-75, 0, 0]: (cosP sinY, sinP, cosP cosY).
    assert light.direction[1] == pytest.approx(np.sin(np.radians(-75.0)), abs=1e-5)
    assert camera.rotation_euler is not None
    assert camera.look_at is None


def test_gltf_box(reference_assets):
    scene = load_gltf(reference_assets / "BoxTextured" / "BoxTextured.gltf")
    assert scene is not None
    assert len(scene.meshes) == 1
    mesh = scene.meshes[0]
    assert mesh.position.shape == (24, 3)
    assert mesh.indices.size == 36
    assert mesh.uv.shape == (24, 2)
    # Unit cube centered at origin (z negated is symmetric).
    center, radius, bmin, bmax = compute_mesh_bounds(mesh)
    np.testing.assert_allclose(bmax - bmin, [1, 1, 1], atol=1e-5)
    assert len(scene.nodes) == 1
    assert scene.nodes[0].world.shape == (4, 4)
    # Material has a base color texture.
    mat = mesh.primitives[0].material
    assert mat.base_color_texture.endswith("CesiumLogoFlat.png")


def test_gltf_duck_node_transform(reference_assets):
    scene = load_gltf(reference_assets / "Duck" / "Duck.gltf")
    assert scene is not None
    mesh = scene.meshes[0]
    assert mesh.position.shape[0] > 1000
    assert len(scene.nodes) == 1
    world = scene.nodes[0].world
    # Duck.gltf root node has a matrix with 0.01 scale.
    assert abs(np.linalg.norm(world[0, :3]) - 0.01) < 1e-6


def test_gltf_normals_z_negated(reference_assets):
    scene = load_gltf(reference_assets / "BoxTextured" / "BoxTextured.gltf")
    mesh = scene.meshes[0]
    # The cube has +-x/y/z face normals; z components must have been mirrored,
    # set still contains both signs and unit length.
    lens = np.linalg.norm(mesh.normal, axis=1)
    np.testing.assert_allclose(lens, 1.0, atol=1e-5)


def test_gltf_pica_pica_multi_mesh(reference_assets):
    # Note: sponza/untitled.bin and metal_rough_ball's .bin are absent from
    # the mounted reference checkout; pica_pica is the largest complete scene.
    scene = load_gltf(reference_assets / "pica_pica" / "scene.gltf")
    assert scene is not None
    assert len(scene.meshes) == 170
    total_tris = sum(mesh.indices.size // 3 for mesh in scene.meshes)
    assert total_tris > 70_000
    assert len(scene.nodes) >= 170


def test_gltf_missing_buffer_graceful(reference_assets):
    # sponza's untitled.bin is not shipped; the loader must not crash.
    scene = load_gltf(reference_assets / "sponza" / "untitled.gltf")
    assert scene is None or all(m.indices is not None for m in scene.meshes)


def test_procedural_cube():
    cube = create_cube(2.0)
    assert cube.position.shape == (24, 3)
    assert cube.indices.size == 36
    np.testing.assert_allclose(np.abs(cube.position).max(), 1.0)
    lens = np.linalg.norm(cube.normal, axis=1)
    np.testing.assert_allclose(lens, 1.0, atol=1e-6)


def test_procedural_sphere():
    sph = create_sphere(2.0, 16, 8)
    assert sph.position.shape == ((8 + 1) * (16 + 1), 3)
    r = np.linalg.norm(sph.position, axis=1)
    np.testing.assert_allclose(r, 2.0, atol=1e-5)
    # Normals point outward.
    dots = np.einsum("ij,ij->i", sph.normal, sph.position / 2.0)
    assert np.all(dots > 0.99)


def test_generate_normals():
    cube = create_cube(1.0)
    cube.normal = np.zeros_like(cube.normal)
    generate_normals_if_missing(cube)
    lens = np.linalg.norm(cube.normal, axis=1)
    np.testing.assert_allclose(lens, 1.0, atol=1e-5)
    # Cube faces are planar; regenerated normals match face directions.
    tris = cube.indices.reshape(-1, 3)
    p0, p1, p2 = (cube.position[tris[:, k]] for k in range(3))
    face_n = np.cross(p1 - p0, p2 - p0)
    face_n /= np.linalg.norm(face_n, axis=1, keepdims=True)
    for t in range(tris.shape[0]):
        for k in range(3):
            assert np.dot(cube.normal[tris[t, k]], face_n[t]) > 0.99


def test_generate_tangents_orthogonal():
    sph = create_sphere(1.0, 12, 6)
    sph.tangent = np.zeros_like(sph.tangent)
    generate_tangents_if_missing(sph)
    dots = np.abs(np.einsum("ij,ij->i", sph.tangent[:, :3], sph.normal))
    assert np.percentile(dots, 95) < 1e-3
    assert set(np.unique(sph.tangent[:, 3])) <= {-1.0, 1.0}


def test_build_scene_box(reference_assets):
    data = build_scene(reference_assets / "Scenes" / "BoxTextured.json")
    assert data is not None
    assert data.num_models == 1
    assert data.num_triangles == 12
    assert data.object_ids[0] == 1
    assert data.scene_radius >= 1.0
    assert data.tri_model.max() == 0
    # World-space AABB approximates the unit cube.
    ext = data.bounds_max_arr[0] - data.bounds_min_arr[0]
    np.testing.assert_allclose(ext, [1, 1, 1], atol=1e-4)
    assert data.texture_paths[0][0].endswith("CesiumLogoFlat.png")


def test_build_scene_pica_pica(reference_assets):
    data = build_scene(reference_assets / "Scenes" / "pica_pica.json")
    assert data is not None
    assert data.num_models >= 170
    assert data.num_triangles > 70_000
    assert np.all(data.tri_model < data.num_models)
    assert data.tri_indices.max() < data.position.shape[0]
    # object ids are sequential from 1.
    assert data.object_ids[0] == 1
    assert data.object_ids[-1] == data.num_models


def test_camera_sponza_setup(reference_assets):
    _models, _light, cam_desc = load_scene_json(reference_assets / "Scenes" / "sponza.json")
    cam = Camera()
    cam.position = cam_desc.position
    cam.set_rotation_euler_degrees(cam_desc.rotation_euler)
    # rotation [-12.6, 261.8, 0] looks mostly toward -X.
    assert cam.forward[0] < -0.9
    assert cam.forward[1] == pytest.approx(np.sin(np.radians(12.6)), abs=1e-4)
    v = cam.view_matrix()
    p = np.append(cam.position, 1.0) @ v
    np.testing.assert_allclose(p[:3], 0.0, atol=1e-5)
