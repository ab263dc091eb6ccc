"""Persistent XLA compilation cache.

Remote TPU compiles through the axon tunnel take 2-5 minutes and are
serialized server-side; the persistent cache cuts warm re-runs of the same
executable to ~30 s. Call :func:`enable_compile_cache` before the first jit
in every entry point (bench.py, tools/train.py, tools/test.py,
__graft_entry__.py all do).
"""
from __future__ import annotations

import os
from typing import Optional


def enable_compile_cache(path: Optional[str] = None) -> None:
    """Point jax at a persistent on-disk compilation cache.

    Defaults to ``<repo>/.jax_cache`` (next to the installed package's
    parent) or ``$FSF_COMPILE_CACHE`` when set. Safe to call multiple
    times; silently no-ops on jax versions without the knobs.
    """
    import jax

    if path is None:
        path = os.environ.get("FSF_COMPILE_CACHE")
    if path is None:
        pkg = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        path = os.path.join(os.path.dirname(pkg), ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
    except Exception:
        pass
