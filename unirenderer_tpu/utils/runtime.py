"""CLI runtime setup shared by the tools/ entry points.

Two environment realities this wraps (PERF.md 'measurement methodology' /
CLAUDE.md gotchas):
  * `JAX_PLATFORMS=cpu` can be overridden by site customisation before the
    CLI runs; `UNIRENDER_PLATFORM` is our own knob, applied via
    jax.config AFTER jax imports (which always wins).
  * first TPU compiles through the relay cost minutes; the persistent
    compilation cache makes every rerun of the same program instant.
"""

from __future__ import annotations

import os


def setup_runtime(cache_subdir: str = ".jax_cache") -> None:
    """Apply platform override + persistent compile cache.  Call right
    after `import jax` in every CLI main()."""
    import jax

    plat = os.environ.get("UNIRENDER_PLATFORM")
    if plat:
        jax.config.update("jax_platforms", plat)
    cache = os.environ.get("UNIRENDER_COMPILE_CACHE") or os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))), cache_subdir)
    try:
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        # cache everything, however small — relay round trips dwarf any
        # local cache overhead
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:
        pass                      # cache is an optimisation, never fatal
