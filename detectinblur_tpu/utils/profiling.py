"""Profiling / tracing (SURVEY.md §5 gap — the reference only has
wall-clock meters, utils.py:641-693; here we add real device traces).

Usage:
    with trace("/tmp/tb_trace"):      # XProf trace viewable in TensorBoard
        step(...)

    with step_timer() as t:           # MetricLogger-compatible timing with
        out = step(...)               # explicit device sync
    print(t.seconds)
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(logdir: str):
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class _Timer:
    seconds: float = 0.0


@contextlib.contextmanager
def step_timer(sync_tree=None):
    """Times a block including device completion (the reference's explicit
    torch.cuda.synchronize() pattern, engine.py:281-282)."""
    t = _Timer()
    t0 = time.perf_counter()
    try:
        yield t
    finally:
        if sync_tree is not None:
            jax.block_until_ready(sync_tree)
        t.seconds = time.perf_counter() - t0


def device_memory_stats() -> dict:
    """max-memory telemetry (torch.cuda.max_memory_allocated equivalent)."""
    dev = jax.devices()[0]
    stats = getattr(dev, "memory_stats", lambda: None)()
    if not stats:
        return {}
    return {
        "bytes_in_use": stats.get("bytes_in_use", 0),
        "peak_bytes_in_use": stats.get("peak_bytes_in_use", 0),
        "bytes_limit": stats.get("bytes_limit", 0),
    }
