"""Persistent XLA compilation cache (the compile-time story).

The reference is an AOT-compiled C binary — its "warmup" is `make`. Here
every jitted Newton/assembly program compiles on first trace (20-100 s on a
remote-dispatch TPU), so we persist compiled executables across processes:
the second run of any bench/deck config warms up from disk in seconds.

Call :func:`enable_compile_cache` once, before the first jit dispatch, from
every entry point (CLI ``__main__``, ``bench.py``, ``run_deck`` callers).
"""

from __future__ import annotations

import os

_DEFAULT = os.environ.get("GOMA_TPU_COMPILE_CACHE", "")


def default_cache_dir() -> str:
    """Repo-local cache when running from a checkout, else ~/.cache."""
    if _DEFAULT:
        return _DEFAULT
    here = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    if os.path.isdir(os.path.join(here, ".git")) or os.path.isdir(
            os.path.join(here, ".jax_cache")):
        return os.path.join(here, ".jax_cache")
    return os.path.expanduser("~/.cache/goma_tpu/jax")


def enable_compile_cache(path: str | None = None,
                         min_compile_secs: float = 2.0) -> str:
    """Point JAX's persistent compilation cache at ``path`` (created if
    missing) and return the directory used. Safe to call repeatedly."""
    import jax

    d = path or default_cache_dir()
    os.makedirs(d, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", d)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      float(min_compile_secs))
    # cache even when the compile-time is dominated by non-XLA work
    # (remote-tunnel dispatch): entry-point processes always want hits
    try:
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # older jax without the knob
        pass
    return d
