"""Pass-name markers: the PIX GPU-marker analog (``GpuDebugMarkers.h:5-61``).

Leaf module (imports nothing from the package) so every ``ops`` module can
use it without touching the ``render`` layer -- this is what keeps
``import unclerenderer_tpu.ops.<x>`` cold-importable.
"""

from __future__ import annotations

import functools


def named_pass(name: str):
    """Wraps a pass function in a ``jax.named_scope`` so its ops carry the
    pass name in HLO metadata and ``jax.profiler`` traces group by render
    pass.  Free at runtime."""
    import jax

    def deco(fn):
        @functools.wraps(fn)
        def wrapper(*args, **kwargs):
            with jax.named_scope(name):
                return fn(*args, **kwargs)

        return wrapper

    return deco
