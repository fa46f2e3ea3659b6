"""Profiling / tracing hooks.

Replaces the reference's torch.profiler integration (reference:
trainer/multitask_trainer.py:30-44: wait/warmup/active schedule + TensorBoard
trace) with jax.profiler: XLA-level traces viewable in TensorBoard/Perfetto.
"""
from __future__ import annotations

import contextlib
import os
import time
from typing import Iterator, Optional


class StepProfiler:
    """Schedule-driven tracer: skip `wait` steps, then capture `active`
    steps into exp_dir/trace (enable via cfg.profile like the reference)."""

    def __init__(self, trace_dir: str, wait: int = 10, active: int = 10,
                 enabled: bool = False):
        self.trace_dir = trace_dir
        self.wait = wait
        self.active = active
        self.enabled = enabled
        self._step = 0
        self._tracing = False

    def step(self) -> None:
        if not self.enabled:
            return
        import jax
        if self._step == self.wait and not self._tracing:
            os.makedirs(self.trace_dir, exist_ok=True)
            jax.profiler.start_trace(self.trace_dir)
            self._tracing = True
        if self._step == self.wait + self.active and self._tracing:
            jax.profiler.stop_trace()
            self._tracing = False
            print(f"[profiler] trace written to {self.trace_dir}")
        self._step += 1

    def close(self) -> None:
        if self._tracing:
            import jax
            jax.profiler.stop_trace()
            self._tracing = False


@contextlib.contextmanager
def timed(name: str, sink: Optional[dict] = None) -> Iterator[None]:
    t0 = time.time()
    yield
    dt = time.time() - t0
    if sink is not None:
        sink[name] = dt
    else:
        print(f"[timed] {name}: {dt:.3f}s")
