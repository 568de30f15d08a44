"""Persistent XLA compilation cache setup for the CLI entry points.

The flagship graphs compile in minutes (the multi-class train step is
~5 min on a fresh process); every CLI and relaunch chunk should hit the
on-disk cache instead. Mirrors what the reference gets for free from
torch's eager kernels — under XLA the compile is a real cost and caching
it is part of the runtime design (preemptible/relaunch training leans on
cheap process restarts).
"""
import os


def default_cache_dir() -> str:
    """Per-user cache location (XDG_CACHE_HOME or ~/.cache), /tmp fallback.

    A world-shared /tmp path breaks on multi-user hosts (the second user
    hits permission failures on the first user's directory) and /tmp
    eviction silently defeats relaunch-chunk cache hits.
    """
    base = os.environ.get("XDG_CACHE_HOME") or os.path.expanduser("~/.cache")
    try:
        os.makedirs(base, exist_ok=True)
        if os.access(base, os.W_OK):
            return os.path.join(base, "sassd_jax")
    except OSError:
        pass
    return f"/tmp/sassd_jax_cache_{os.getuid()}"


def enable_compilation_cache(cache_dir: str = None) -> None:
    """Point JAX at a persistent compilation cache (idempotent).

    Call BEFORE the first jit compilation. SASSD_JAX_CACHE overrides the
    location; SASSD_JAX_CACHE=0 disables.
    """
    env = os.environ.get("SASSD_JAX_CACHE")
    if env == "0":
        return
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      cache_dir or env or default_cache_dir())
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
