"""XLA flag sweep over an instseg forward variant (PERF.md lever 5).

Runs ``tools/bench_instseg_fwd.py <variant>`` in a child process per flag
set (XLA flags are process-global, so each point needs a fresh runtime) and
parses the reported ms/step.  Each flag set gets its own compilation-cache
dir — not every flag participates in the cache key, and a stale kernel from
another flag set would silently poison the measurement.

Usage: python tools/bench_xla_flags.py [variant] [more "--xla_..." sets]
  variant: any bench_instseg_fwd variant (default: base)
Prints one line per flag set; the baseline (no extra flags) runs first.
"""
import os
import re
import subprocess
import sys

VARIANT = sys.argv[1] if len(sys.argv) > 1 else "base"

# Candidate sets for the gather-bound sparse convs: scoped-vmem headroom
# changes what XLA will fuse around the gathers; the rest are fusion-cost
# toggles that have moved conv-adjacent benchmarks on v5e before.
FLAG_SETS = [
    "",
    "--xla_tpu_scoped_vmem_limit_kib=32768",
    "--xla_tpu_scoped_vmem_limit_kib=65536",
    "--xla_tpu_scoped_vmem_limit_kib=98304",
    "--xla_tpu_enable_experimental_fusion_cost_model=true",
    "--xla_tpu_licm_size_inflation_ratio=2",
] + sys.argv[2:]

MS_RE = re.compile(r"([\w+]+)\s*:\s*([0-9.]+)\s*ms")


def run_one(flags: str, tag: str) -> str:
    env = dict(os.environ)
    base = env.get("XLA_FLAGS", "")
    env["XLA_FLAGS"] = f"{base} {flags}".strip()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = ":".join(
        p for p in (repo, env.get("PYTHONPATH", "")) if p)
    env["JAX_CACHE_DIR"] = f"/tmp/jaxcache_sweep_{tag}"
    try:
        p = subprocess.run(
            [sys.executable, os.path.join(os.path.dirname(__file__),
                                          "bench_instseg_fwd.py"), VARIANT],
            capture_output=True, text=True, timeout=5400, env=env)
    except subprocess.TimeoutExpired:
        # a pathological flag point can hang compilation — report it like
        # any other per-set failure instead of aborting the sweep
        return "FAILED: timeout after 5400s"
    hits = MS_RE.findall(p.stdout)
    if not hits:
        tail = (p.stdout + p.stderr).strip().splitlines()[-3:]
        return f"FAILED rc={p.returncode}: {' | '.join(tail)}"
    return "  ".join(f"{name}={ms}ms" for name, ms in hits)


def main():
    for i, flags in enumerate(FLAG_SETS):
        label = flags if flags else "(baseline)"
        print(f"[{i}] {label}\n    {run_one(flags, str(i))}", flush=True)


if __name__ == "__main__":
    main()
