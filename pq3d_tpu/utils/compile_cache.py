"""Shared persistent-compile-cache setup for benches, tools, and drivers.

CPU processes MUST use a different cache dir than TPU processes: the axon
TPU platform remote-compiles on a different host CPU, and its XLA:CPU AOT
cache entries can SIGILL a local CPU run that loads them (observed on this
image).  Every tool that flips to the CPU platform (BENCH_SMOKE, forced
JAX_PLATFORMS=cpu) therefore gets a ``_cpu``-suffixed cache automatically.
"""
import os


def _platform_hint(jax) -> str:
    """Best-effort platform detection WITHOUT initializing the backend
    (jax.default_backend() would hang this process when the axon tunnel is
    down — the exact failure the subprocess probes exist to avoid).

    Order: an already-initialized backend is authoritative (catches silent
    CPU fallback when no platform was requested); otherwise the requested
    env/config platform."""
    try:
        from jax._src import xla_bridge
        backends = getattr(xla_bridge, "_backends", None)
        if backends:
            # a TPU process keeps a host CPU backend too — only an
            # exclusively-CPU backend set means a CPU run
            non_cpu = set(backends) - {"interpreter", "cpu"}
            return ",".join(non_cpu) if non_cpu else "cpu"
    except Exception:
        pass
    try:
        return (os.environ.get("JAX_PLATFORMS", "")
                + str(jax.config.jax_platforms or ""))
    except Exception:
        return ""


def _host_fingerprint() -> str:
    """Short hash of this host's CPU flags.  XLA:CPU AOT cache entries are
    machine-feature-specific: entries written by a DIFFERENT host (the axon
    platform remote-compiles on one, and VMs migrate) load with
    'machine feature mismatch ... could lead to SIGILL' errors — observed
    live on this image with +prefer-no-scatter entries in the _cpu cache."""
    import hashlib
    try:
        picked = []
        with open("/proc/cpuinfo") as f:
            for line in f:
                # flags alone are NOT enough: XLA also bakes in
                # model-derived scheduling preferences (+prefer-no-scatter,
                # +prefer-no-gather) that differ between hosts with
                # identical ISA flags — observed live (mismatch errors from
                # a fingerprinted _cpu cache).  Include the model identity.
                if line.startswith(("flags", "model name", "model\t",
                                    "cpu family", "stepping")):
                    picked.append(line)
                    if len(picked) >= 5:
                        break
        if picked:
            return hashlib.md5("".join(picked).encode()).hexdigest()[:8]
    except OSError:
        pass
    import platform
    return platform.machine()


def enable_compile_cache(jax) -> None:
    """Point jax at the persistent compile cache (call AFTER any
    ``jax.config.update("jax_platforms", ...)``).

    ``PQ3D_NO_COMPILE_CACHE=1`` disables it entirely — the escape hatch for
    contended virtual-mesh subprocesses (dryrun_multichip, mesh-train
    tests) where a poisoned cross-host CPU AOT entry means SIGILL."""
    if os.environ.get("PQ3D_NO_COMPILE_CACHE", "0") not in ("", "0"):
        return
    base = os.environ.get("JAX_CACHE_DIR", "/tmp/jaxcache")
    if "cpu" in _platform_hint(jax) and "_cpu" not in base:
        base += f"_cpu_{_host_fingerprint()}"
    jax.config.update("jax_compilation_cache_dir", base)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
