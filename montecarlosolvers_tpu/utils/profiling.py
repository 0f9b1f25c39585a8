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


def suggest_chains(nspins, slices=1, vmem_budget_bytes=12 << 20,
                   dtype_bytes=4, round_to=8):
    """Largest chain batch whose state stays VMEM-resident.

    Throughput collapses ~3-4x once the chain-batched state spills from
    VMEM to HBM (measured on v5e: SA 512 chains x 80x80 f32 ~ 13MB is the
    sweet spot; 1024 drops ~3x — see ARCHITECTURE.md §4). Budget defaults
    to 12MB of the ~16MB VMEM, leaving room for coupling planes and
    temporaries. Measured exception: 640 chains x 80x80 f32 (16.4MB,
    batch = 5*128 sublane-perfect tiles) outruns every smaller batch
    (3.8e10 att/s) — when tuning, sweep around the boundary rather than
    trusting the estimate alone.
    """
    per_chain = nspins * slices * dtype_bytes
    n = max(1, int(vmem_budget_bytes // per_chain))
    if n > round_to:
        n = (n // round_to) * round_to
    return n


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
