"""Process-level JAX setup shared by the CLIs: persistent compilation cache
(first compile of the unrolled refinement graph is expensive; repeat runs hit
the cache) and optional profiler hooks."""
from __future__ import annotations

import os


def setup(cache_dir: str | None = None) -> None:
    os.environ.setdefault(
        "JAX_COMPILATION_CACHE_DIR", cache_dir or "/tmp/jax_cache"
    )
    try:
        import jax

        jax.config.update("jax_compilation_cache_dir",
                          os.environ["JAX_COMPILATION_CACHE_DIR"])
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


def start_profiler(logdir: str) -> None:
    import jax

    jax.profiler.start_trace(logdir)


def stop_profiler() -> None:
    import jax

    jax.profiler.stop_trace()
