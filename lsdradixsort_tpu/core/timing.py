"""Device timing harness.

TPU-native equivalent of the reference's timer pair utilities: wall-clock
timestamps (Utils.cpp:24-60, QueryPerformanceCounter) and CUDA event pairs
bracketing only device work (CudaUtils.cpp:24-29, e.g. LSDRadixSort.cu:998-1009).

On TPU the dispatch path is asynchronous and — under tunneled runtimes —
has tens of milliseconds of host round-trip latency, so a naive
block_until_ready-per-iteration loop measures the tunnel, not the kernel.
We instead enqueue `iters` dispatches back-to-back and force completion once
with a 1-element host fetch, amortizing both dispatch and fetch latency.
"""
from __future__ import annotations

import time
from dataclasses import dataclass

import jax
import numpy as np


def _force(result) -> None:
    """Force full completion of `result` by fetching one element to host."""
    leaf = jax.tree.leaves(result)[0]
    np.asarray(leaf.ravel()[:1])


@dataclass
class Timing:
    seconds: float          # best-effort per-call device time
    iters: int
    calls_per_iter: int = 1

    @property
    def ms(self) -> float:
        return self.seconds * 1e3

    def gelems_per_s(self, n: int) -> float:
        return n / self.seconds / 1e9

    def gbytes_per_s(self, nbytes: int) -> float:
        return nbytes / self.seconds / 1e9


def time_fn(fn, *args, iters: int = 10, warmup: int = 1) -> Timing:
    """Time a jitted function on device, amortizing dispatch latency.

    The function is compiled+run `warmup` times first (reference pattern:
    kernels timed after the H2D copy, LSDRadixSort.cu:1001-1006), then run
    `iters` times with completion forced only once at the end.
    """
    for _ in range(max(warmup, 1)):
        r = fn(*args)
    _force(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    _force(r)
    total = time.perf_counter() - t0
    return Timing(seconds=total / iters, iters=iters)


def time_host(fn, *args, iters: int = 3) -> Timing:
    """Time a host (numpy / native) function — the CPU-golden baseline
    (reference pattern: LSDRadixSort.cu:984-990)."""
    fn(*args)  # warm caches
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        fn(*args)
        best = min(best, time.perf_counter() - t0)
    return Timing(seconds=best, iters=iters)
