"""Persistent XLA compilation cache.

The reference cold-starts in seconds because PSOs compile from small HLSL
(``Application.cpp:148-330``); here the analog of a PSO build is an XLA
compile of the whole frame, which costs 60-300 s through the TPU relay.
Enabling JAX's persistent cache makes every warm start skip it entirely --
the cache key covers the HLO, compile options and backend, so settings
retraces land their own entries.
"""

from __future__ import annotations

import os

_enabled = False


def pin_platform_from_env() -> None:
    """Honor ``JAX_PLATFORMS`` at the config level too.

    With only the env var, a pre-registered experimental platform (the axon
    TPU relay) can still attempt backend init -- and *block forever* when the
    relay is unreachable; ``jax.config.update("jax_platforms", ...)`` pins the
    requested platform reliably.  No-op when the env var is unset."""
    plats = os.environ.get("JAX_PLATFORMS", "")
    if plats:
        import jax

        jax.config.update("jax_platforms", plats)


def enable_persistent_cache(cache_dir: str | None = None) -> str:
    """Idempotently point JAX at an on-disk compilation cache."""
    global _enabled
    import jax

    path = (
        cache_dir
        or os.environ.get("UNCLERENDERER_JAX_CACHE")
        or os.path.expanduser("~/.cache/unclerenderer_jax")
    )
    if not _enabled:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # Cache everything, however fast it compiled (default thresholds skip
        # sub-second compiles -- but through the relay nothing is sub-second).
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        _enabled = True
    return path
