"""Profiling and timing harness (SURVEY.md section 5: the reference has no
tracing; here: jax.profiler traces + block-until-ready wall timing)."""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Optional

import jax


@contextlib.contextmanager
def timed(label: str = "", sink: Optional[list] = None):
    """Wall-clock a block, blocking on async dispatch at exit."""
    t0 = time.perf_counter()
    yield
    # ensure all queued work is done before reading the clock:
    # effects_barrier only waits on effectful tokens, so also block on a
    # trivial EXECUTION enqueued AFTER the block on EVERY local device —
    # each device runs its compute queue in enqueue order, so this orders
    # behind any program already dispatched to a mesh. (A device_put is a
    # transfer, not an execution: it lands on a separate path and would NOT
    # wait for in-flight programs.)
    jax.effects_barrier()
    noop = jax.jit(lambda x: x + 0)
    jax.block_until_ready(
        [noop(jax.device_put(0, d)) for d in jax.local_devices()]
    )
    dt = time.perf_counter() - t0
    if sink is not None:
        sink.append((label, dt))
    else:
        print(f"[timed] {label}: {dt * 1e3:.2f} ms")


@contextlib.contextmanager
def device_trace(logdir: str):
    """Capture a TensorBoard-viewable device trace around a block."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def benchmark(fn: Callable, *args, repeats: int = 3, warmup: int = 1) -> float:
    """Best-of-N wall time of fn(*args), blocking until results are ready."""
    for _ in range(warmup):
        out = fn(*args)
        jax.block_until_ready(out)
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best
