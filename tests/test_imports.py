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


def test_package_import_initializes_no_backend():
    """Importing the whole package (CLI entry chain) must not create a JAX
    backend: a module-level device array triggers backend init at import
    time, which blocks forever when the TPU relay platform is registered but
    unreachable (the CLI would hang before parsing arguments).  Regression:
    ops/post.py LUM_WEIGHTS used to be a module-level jnp.array."""
    code = (
        "import unclerenderer_tpu.app, unclerenderer_tpu.viewer, "
        "unclerenderer_tpu.parallel.multichip\n"
        "from jax._src import xla_bridge as xb\n"
        "assert not xb._backends, f'backends initialized: {list(xb._backends)}'\n"
        "print('no-backend-ok')\n"
    )
    proc = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        env={"PATH": "/usr/bin:/bin", "JAX_PLATFORMS": "cpu", "HOME": "/root"},
        timeout=120,
    )
    assert proc.returncode == 0, proc.stderr
    assert "no-backend-ok" in proc.stdout
