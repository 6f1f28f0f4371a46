from .camera import Camera
from .scene_json import SceneModelDesc, SceneLightDesc, SceneCameraDesc, load_scene_json
from .gltf import GltfScene, load_gltf
from .build import SceneModel, SceneData, build_scene
