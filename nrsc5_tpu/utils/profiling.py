"""Profiling / roofline helpers.

The reference's only observability is its event stream (SURVEY.md §5); for
a TPU framework, per-kernel timing and roofline context are first-class.
``trace`` wraps the JAX profiler; ``measure`` times a jitted callable and
reports achieved throughput against supplied FLOP/byte counts.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """JAX profiler trace (view with TensorBoard / xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@dataclass
class Measurement:
    wall_s: float
    reps: int
    flops: float | None = None
    bytes_accessed: float | None = None

    @property
    def per_call_s(self) -> float:
        return self.wall_s / self.reps

    @property
    def tflops(self) -> float | None:
        if self.flops is None:
            return None
        return self.flops / self.per_call_s / 1e12

    @property
    def gbps(self) -> float | None:
        if self.bytes_accessed is None:
            return None
        return self.bytes_accessed / self.per_call_s / 1e9

    def report(self, name: str) -> str:
        parts = [f"{name}: {self.per_call_s * 1e3:.3f} ms/call"]
        if self.tflops is not None:
            parts.append(f"{self.tflops:.3f} TFLOP/s")
        if self.gbps is not None:
            parts.append(f"{self.gbps:.1f} GB/s")
        return "  ".join(parts)


def measure(fn, *args, reps: int = 10, warmup: int = 1,
            flops: float | None = None,
            bytes_accessed: float | None = None,
            sync=None) -> Measurement:
    """Time ``fn(*args)`` with device synchronization.

    ``sync(out)`` overrides the default ``jax.block_until_ready`` — pass a
    fetching sync on backends where block_until_ready does not actually
    wait (axon)."""
    sync = sync or jax.block_until_ready
    for _ in range(warmup):
        sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        sync(fn(*args))
    return Measurement(wall_s=time.perf_counter() - t0, reps=reps,
                       flops=flops, bytes_accessed=bytes_accessed)
