"""Persistent XLA compilation cache setup.

The flagship programs (scanned multi-stream steps, the 4K HUD loop) take
tens of seconds to compile, and on a relay-attached dev TPU every compile
round-trips the tunnel — re-paying that per process is the single largest
source of benchmark wall-clock and of relay load.  Enabling JAX's
persistent compilation cache makes every program compile once per machine
instead of once per process.

Call :func:`enable` before building any jitted program (safe to call after
backend init; the cache config is read at compile time).
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.environ.get("GVT_COMPILE_CACHE",
                              "/tmp/gvt_jax_compile_cache")


def enable(cache_dir: str = _DEFAULT_DIR) -> str:
    """Turn on the persistent compilation cache; returns the cache dir.

    No-op on the CPU backend: XLA:CPU caches AOT code keyed to compile-time
    machine features, and reloading on a host with a different detected
    feature set risks SIGILL — while CPU compiles are cheap anyway.  The
    accelerator backends cache serialized executables safely.
    """
    import jax

    if jax.default_backend() == "cpu":
        return ""
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # Cache everything, however quick to compile: the relay round trip
    # dominates even small programs here.
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return cache_dir
