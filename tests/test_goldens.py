"""Golden-image regression gates (SURVEY.md section 4 plan items (a)/(d)):
each milestone scene renders on the CPU backend and must match the checked-in
256x256 golden pixel-for-pixel within a small tolerance -- shading/raster
regressions fail loudly instead of slipping past statistical checks.

Regenerate after INTENDED changes: PYTHONPATH=. python tests/make_goldens.py
"""

from pathlib import Path

import numpy as np
import pytest

from make_goldens import CASES, GOLDENS, render_case

# The heavy cases dominate single-process CI wall time (pica 117 s, the two
# Compare scenes ~23 s each of 500 s total); they run in the full lane
# (`pytest -m "slow or not slow"`).  The fast default lane keeps box/duck
# goldens plus test_render.py::test_compare_scenes_render for the Compare
# scenes' structural coverage.
_SLOW = {
    "pica_pica_deferred",
    "duck_deferred",
    "compare_basecolor_forward",
    "compare_normal_forward",
}
_PARAMS = [
    pytest.param(*c, marks=pytest.mark.slow) if c[0] in _SLOW else c for c in CASES
]


@pytest.mark.parametrize("name,scene,rt,overrides", _PARAMS, ids=[c[0] for c in CASES])
def test_golden(name, scene, rt, overrides, reference_assets):
    path = GOLDENS / f"{name}.png"
    if not path.is_file():
        pytest.skip(f"golden {name}.png not generated")
    from PIL import Image

    want = np.asarray(Image.open(path).convert("RGB"))
    got = render_case(name, scene, rt, overrides)
    diff = np.abs(got.astype(np.int32) - want.astype(np.int32)).max(axis=-1)
    # tolerate 8-bit rounding jitter; fail on anything structural
    frac_off = float((diff > 2).mean())
    assert frac_off < 0.001, (
        f"{name}: {frac_off * 100:.3f}% of pixels differ by >2/255 "
        f"(max diff {diff.max()}); if intended, regenerate goldens"
    )
    assert int(diff.max()) <= 32, f"{name}: max pixel diff {diff.max()}"
