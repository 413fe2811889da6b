"""Persistent XLA compilation cache.

The axon TPU backend compiles remotely over HTTP; a big BPTT graph takes
2-5 minutes on first compile (CLAUDE.md). Enabling JAX's persistent
compilation cache makes that a once-per-container cost: subsequent runs of
bench.py / the trainer deserialize the executable in seconds.

Call ``enable_compilation_cache()`` before building any jitted graph. Safe to
call multiple times; no-op if the config is already set or unsupported.
"""

import os

import jax

_DEFAULT_DIR = os.environ.get(
    "UNIDOM_JAX_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(__file__))), ".jax_cache"),
)


def enable_compilation_cache(cache_dir: str = None) -> str:
    """Point JAX at a persistent on-disk compilation cache; returns the dir."""
    cache_dir = cache_dir or _DEFAULT_DIR
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # Cache everything, even fast compiles: the cost is disk, the win is
        # never re-paying a remote compile.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # unsupported flag names on an older jax: degrade quietly
        pass
    return cache_dir
