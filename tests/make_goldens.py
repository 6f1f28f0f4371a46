"""Regenerate the golden images in tests/goldens/ (run manually after an
INTENDED rendering change; CI compares against these pixel-for-pixel with a
small tolerance).

    JAX_PLATFORMS=cpu PYTHONPATH=. python tests/make_goldens.py
"""

import os
import sys
from pathlib import Path

# force CPU before any jax import (the environment pre-pins an "axon" TPU
# platform via sitecustomize; goldens are defined on the deterministic CPU
# backend, same as tests/conftest.py)
os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

GOLDENS = Path(__file__).parent / "goldens"
ASSETS = Path("/root/reference/Assets")

# (name, scene, renderer_type, extra settings) -- the reference's own
# graduated scene ladder incl. its two channel-correctness Compare scenes.
# pica (76k tris) runs at 128^2: the exhaustive XLA raster on the 1-core CI
# host costs ~2.5 min at 256^2, which would dominate the whole suite; the
# smaller golden still gates structural regressions (256^2 imagery lives in
# screenshots/, refreshed on TPU).
CASES = [
    ("box_deferred", "BoxTextured.json", "deferred", {}),
    ("box_forward", "BoxTextured.json", "forward", {}),
    ("duck_deferred", "Duck.json", "deferred", {}),
    ("compare_basecolor_forward", "CompareBaseColor.json", "forward", {}),
    ("compare_normal_forward", "CompareNormal.json", "forward", {}),
    ("pica_pica_deferred", "pica_pica.json", "deferred",
     {"width": 128, "height": 128, "shadow_map_size": 128}),
]

SIZE = 256


def golden_settings(renderer_type, **overrides):
    from unclerenderer_tpu.render.params import RenderSettings

    kw = dict(
        width=SIZE,
        height=SIZE,
        renderer_type=renderer_type,
        shadow_map_size=256,
        tile_h=16,
        tile_w=64,
        chunk=64,
        shadow_chunk=64,
        raster_backend="xla",  # deterministic on the CPU CI host
    )
    kw.update(overrides)
    return RenderSettings(**kw)


def render_case(name, scene, renderer_type, overrides):
    from unclerenderer_tpu.render.renderer import Renderer

    r = Renderer(ASSETS / "Scenes" / scene, settings=golden_settings(renderer_type, **overrides))
    img = r.render_to_u8()  # frame 1: no TAA jitter yet (deterministic)
    return img


def main():
    from PIL import Image

    GOLDENS.mkdir(exist_ok=True)
    for name, scene, rt, overrides in CASES:
        img = render_case(name, scene, rt, overrides)
        Image.fromarray(img, "RGB").save(GOLDENS / f"{name}.png")
        print(f"wrote {name}.png")


if __name__ == "__main__":
    main()
