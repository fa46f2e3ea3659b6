"""Shared persistent-compile-cache setup for benches, tools, and drivers.

CPU processes MUST use a different cache dir than TPU processes: the axon
TPU platform remote-compiles on a different host CPU, and its XLA:CPU AOT
cache entries can SIGILL a local CPU run that loads them (observed on this
image).  Every tool that flips to the CPU platform (BENCH_SMOKE, forced
JAX_PLATFORMS=cpu) therefore gets a ``_cpu``-suffixed cache automatically.
"""
import os


def enable_compile_cache(jax) -> None:
    """Point jax at the persistent compile cache (call AFTER any
    ``jax.config.update("jax_platforms", ...)``)."""
    base = os.environ.get("JAX_CACHE_DIR", "/tmp/jaxcache")
    try:
        plat = (os.environ.get("JAX_PLATFORMS", "")
                + str(jax.config.jax_platforms or ""))
    except Exception:
        plat = ""
    if "cpu" in plat and not base.endswith("_cpu"):
        base += "_cpu"
    jax.config.update("jax_compilation_cache_dir", base)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
