"""JAX runtime setup helpers."""

import os


def enable_compilation_cache(path: str = "/root/.cache/nerfnav_jax_cache"):
    """Persistent compilation cache — the remote-compile relay in this
    environment costs minutes per large program; cached executables make
    repeat runs (benchmarks, resumed training) start in seconds."""
    import jax

    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax without these flags
