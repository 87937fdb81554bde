"""Runtime configuration helpers: persistent compilation cache + profiling.

The reference has no instrumentation beyond prints (SURVEY.md §5.1); here the
pipeline drivers opt into JAX's persistent compilation cache (first compiles of the
big fused movie programs take minutes on the tunneled TPU) and expose
``jax.profiler`` traces as a first-class tool.
"""

from __future__ import annotations

import contextlib
import os
import time

__all__ = ["enable_compilation_cache", "trace", "Timer", "StageMetrics"]


def enable_compilation_cache(path: str = None) -> None:
    """Persist compiled executables across processes (no-op if unsupported)."""
    import jax

    path = path or os.path.join(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))), ".jax_cache")
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # cache EVERY executable: the default 1 s floor skips the pipeline's
        # many small sub-programs, so each new process recompiled them (~30 s
        # of sub-threshold compiles per cli run); storage cost is trivial
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/tip_trace"):
    """jax.profiler trace context (view with tensorboard / xprof)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


class Timer:
    """Wall-clock stage timer with a synchronizing host read."""

    def __init__(self):
        self.stages = {}

    @contextlib.contextmanager
    def stage(self, name: str, result=None):
        t0 = time.time()
        yield
        if result is not None:
            import numpy as np
            np.asarray(result).ravel()[:1]
        self.stages[name] = self.stages.get(name, 0.0) + time.time() - t0

    def report(self) -> str:
        return ", ".join(f"{k}={v * 1000:.0f}ms" for k, v in self.stages.items())


class StageMetrics:
    """Structured per-stage metrics for pipeline drivers (SURVEY §5.5: the
    reference only has prints; here every driver stage emits one JSON line —
    ``{"event": ..., "stage": ..., "seconds": ..., **fields}`` — to a stream
    and keeps an in-memory record, so batch runs are machine-parseable).
    """

    def __init__(self, stream=None, run: str = ""):
        import sys

        self.stream = stream if stream is not None else sys.stderr
        self.run = run
        self.records = []

    def emit(self, event: str, **fields):
        import json

        rec = {"event": event, **({"run": self.run} if self.run else {}),
               **fields}
        self.records.append(rec)
        if self.stream:
            print(json.dumps(rec), file=self.stream, flush=True)

    @contextlib.contextmanager
    def stage(self, name: str, **fields):
        t0 = time.time()
        try:
            yield
        except Exception as e:
            self.emit("stage_error", stage=name,
                      seconds=round(time.time() - t0, 4),
                      error=f"{type(e).__name__}: {e}", **fields)
            raise
        self.emit("stage", stage=name, seconds=round(time.time() - t0, 4),
                  **fields)

    def summary(self) -> dict:
        out = {}
        for r in self.records:
            if r.get("event") == "stage":
                out[r["stage"]] = out.get(r["stage"], 0.0) + r["seconds"]
        return out
