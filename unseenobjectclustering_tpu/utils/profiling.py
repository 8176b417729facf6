"""Profiling and timing: jax.profiler traces + stage timers.

The reference's only observability is wall-clock AverageMeters
(lib/fcn/train.py:15-34); here traces can be captured for TensorBoard/XProf
(SURVEY.md §5 flags this as a required auxiliary subsystem for the
fps/chip target).
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional


class AverageMeter:
    """Running average (parity with lib/fcn/train.py:15-34)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.avg = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val: float, n: int = 1):
        self.val = val
        self.sum += val * n
        self.count += n
        self.avg = self.sum / max(self.count, 1)


class StageTimer:
    """Named stage wall-clock accumulator for pipeline breakdowns."""

    def __init__(self):
        self.meters: dict[str, AverageMeter] = {}

    @contextlib.contextmanager
    def time(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.meters.setdefault(name, AverageMeter()).update(
                time.perf_counter() - t0)

    def summary(self) -> str:
        return " | ".join(f"{k}: {m.avg * 1000:.2f}ms"
                          for k, m in self.meters.items())


def enable_persistent_compile_cache(cache_dir: Optional[str] = None) -> None:
    """Point XLA's persistent compilation cache at the repo-local dir.

    bench.py/bench_stages.py have carried this since round 5 (VERDICT r4
    #1); the training/eval CLIs need it just as much — the fused
    device-resident train step costs ~17 min to compile cold (CLAUDE.md),
    and a container reset wipes everything outside the repo, so the cache
    must live inside it.  Never fatal: the cache is an optimization.
    """
    import os

    import jax

    if cache_dir is None:
        cache_dir = os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))), ".xla_cache")
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass


@contextlib.contextmanager
def trace(log_dir: str, create_perfetto_link: bool = False):
    """Capture a jax.profiler trace around a block (view with TensorBoard's
    profile plugin or Perfetto)."""
    import jax

    jax.profiler.start_trace(log_dir,
                             create_perfetto_link=create_perfetto_link)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str):
    """Named region that shows up inside device traces."""
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield
