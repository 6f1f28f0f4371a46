"""Sampler-parity visual delta: anisotropic (the reference's actual
material sampler, D3D12_FILTER_ANISOTROPIC MaxAnisotropy=4 --
ForwardRenderer.cpp:956-961) vs the shipped trilinear default.

Renders the same frame under both filters on pica_pica and the Compare
scenes and reports max/mean abs pixel delta -- the number ARCHITECTURE
deviation #1 must cite next to the measured cost row (VERDICT r5 #3).

    python tools/aniso_delta.py [--small]
"""

from __future__ import annotations

import dataclasses
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

from unclerenderer_tpu.core.jaxcache import (
    enable_persistent_cache,
    pin_platform_from_env,
)

pin_platform_from_env()
enable_persistent_cache()

from unclerenderer_tpu.render.params import RenderSettings
from unclerenderer_tpu.render.renderer import Renderer

SMALL = "--small" in sys.argv
W, H = (512, 288) if SMALL else (1920, 1080)
SHADOW = 512 if SMALL else 4096


def main():
    scenes = [
        "/root/reference/Assets/Scenes/pica_pica.json",
        "/root/reference/Assets/Scenes/CompareBaseColor.json",
        "/root/reference/Assets/Scenes/CompareNormal.json",
    ]
    for sp in scenes:
        if not Path(sp).is_file():
            print(f"{Path(sp).name}: missing, skipped", flush=True)
            continue
        base = RenderSettings(
            width=W, height=H, renderer_type="deferred",
            shadow_map_size=SHADOW,
        )
        imgs = {}
        for filt in ("trilinear", "anisotropic"):
            r = Renderer(
                Path(sp),
                settings=dataclasses.replace(base, texture_filter=filt),
            )
            imgs[filt] = np.asarray(r.render_frame()["color"])
        d = np.abs(imgs["anisotropic"] - imgs["trilinear"])
        # in 8-bit backbuffer units, like a golden-image gate would see it
        d8 = d * 255.0
        frac = float((d8.max(axis=-1) > 1.0).mean())
        print(
            f"{Path(sp).name}: max {d8.max():.1f}/255, mean {d8.mean():.3f}"
            f"/255, >1LSB pixels {frac * 100:.2f}%",
            flush=True,
        )


if __name__ == "__main__":
    main()
