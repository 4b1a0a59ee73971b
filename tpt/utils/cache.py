"""Persistent XLA compilation cache.

The Mosaic compiles of the fused progressive renderer and especially the
in-kernel backward sweep cost tens of seconds; caching them on disk makes
every process after the first start in milliseconds.  The reference app
pays an analogous cost in GLSL compilation each launch and does not cache
(src/Render/Objects/ShaderProgram.cs:22-27) — here the cache is free to
keep, keyed by program hash, so enable it on every entry point.
"""

from __future__ import annotations

import os


def enable_persistent_cache(path: str | None = None) -> str:
    """Point jax at an on-disk compilation cache and return its path."""
    import jax

    path = path or os.environ.get(
        "TPT_CACHE_DIR", os.path.expanduser("~/.cache/tpt-jax-cache"))
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    return path
