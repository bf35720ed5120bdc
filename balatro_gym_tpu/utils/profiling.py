"""Profiling / metrics utilities.

The reference's observability is wall-clock steps/s (hpc_train.py:136-138)
plus SB3/tensorboard scalars. Here: jax.profiler trace capture around any
callable, a throughput timer that separates compile from steady-state, and a
device-side metrics accumulator (fetch every N steps — no host callbacks in
the hot loop).
"""
from __future__ import annotations

import contextlib
import time
from typing import Callable

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(logdir: str = "/tmp/jax-trace"):
    """Capture a jax.profiler trace viewable in XProf/TensorBoard."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def time_compiled(fn: Callable, *args, iters: int = 3):
    """Run fn once (compile+warm) then `iters` timed runs.

    Returns (mean_seconds, compile_seconds).
    """
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters, compile_s


def cost_analysis(fn: Callable, *args) -> dict:
    """FLOPs / bytes-accessed estimates of the compiled program."""
    c = jax.jit(fn).lower(*args).compile().cost_analysis() or {}
    return {k: float(v) for k, v in c.items()
            if k in ("flops", "bytes accessed")}


class MetricsAccumulator:
    """Accumulate scalar metrics on device; fetch to host every N calls."""

    def __init__(self, flush_every: int = 50):
        self.flush_every = flush_every
        self._sums: dict[str, jnp.ndarray] = {}
        self._count = 0
        self.history: list[dict] = []

    def add(self, metrics: dict) -> dict | None:
        for k, v in metrics.items():
            self._sums[k] = self._sums.get(k, 0.0) + v
        self._count += 1
        if self._count >= self.flush_every:
            out = {k: float(v) / self._count for k, v in self._sums.items()}
            self.history.append(out)
            self._sums = {}
            self._count = 0
            return out
        return None
