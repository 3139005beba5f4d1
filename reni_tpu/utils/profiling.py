"""Profiling and timing utilities (SURVEY §5 tracing parity).

The reference ships torch-tb-profiler as a dependency but never invokes it;
here tracing is first-class: `trace()` wraps jax.profiler (view in
TensorBoard or Perfetto), and `benchmark_fn` is the dependent-chain timing
harness used for the samples/sec/chip protocol — it feeds each call's output
back into the next call's input so asynchronous dispatch, pipelining, or
result caching cannot inflate throughput (see PERF.md).
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable

import jax


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/reni_tpu_trace"):
    """Capture a device trace: `with trace('dir'): step(...)` then open the
    dir in TensorBoard's profile plugin or Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def benchmark_fn(
    f: Callable, state0, n: int = 20, warmup: int = 1
) -> tuple[float, object]:
    """Time ``state = f(state)`` over a dependent chain.

    Returns (seconds per call, final state). ``f`` must map its output back
    to its input structure (e.g. a train step carrying TrainState)."""
    state = state0
    for _ in range(warmup):
        state = f(state)
    jax.block_until_ready(state)
    t0 = time.perf_counter()
    for _ in range(n):
        state = f(state)
    jax.block_until_ready(state)
    return (time.perf_counter() - t0) / n, state


def samples_per_sec(f: Callable, state0, samples_per_call: int, n: int = 20) -> float:
    dt, _ = benchmark_fn(f, state0, n=n)
    return samples_per_call / dt
