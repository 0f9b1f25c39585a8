"""Profiling helpers: flips/sec counters and JAX profiler traces — the
tracing layer the reference disables outright (`# cython: profile=False`,
sa.pyx:2; SURVEY.md §5)."""

from __future__ import annotations

import contextlib
import time

import numpy as np
import jax


class FlipCounter:
    """Wall-clock spin-flip-attempt throughput for a timed region.

    Through the remote-TPU tunnel `block_until_ready` can return before
    execution completes, so `stop` takes the result array and fetches it
    to the host — the fetch is the reliable completion barrier.
    """

    def __init__(self):
        self.attempts = 0
        self._t0 = None
        self.elapsed = None

    def start(self):
        self._t0 = time.time()
        return self

    def add_sweeps(self, n_sweeps, nspins, chains=1):
        self.attempts += int(n_sweeps) * int(nspins) * int(chains)

    def stop(self, result=None):
        if result is not None:
            np.asarray(result)
        self.elapsed = time.time() - self._t0
        return self

    @property
    def rate(self):
        return self.attempts / self.elapsed if self.elapsed else float("nan")


@contextlib.contextmanager
def trace(logdir="/tmp/mcs_tpu_trace"):
    """JAX profiler trace context — open in XProf/TensorBoard."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def timed(label="region", fetch=None, verbose=True):
    t0 = time.time()
    box = {}
    try:
        yield box
    finally:
        if fetch is not None:
            np.asarray(fetch)
        box["elapsed"] = time.time() - t0
        if verbose:
            print(f"{label}: {box['elapsed']:.3f}s")
