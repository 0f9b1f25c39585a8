"""Checkpoint / resume for long anneals.

The reference's resumability is driver-level .npy result files
(examples/santoro80.py:254-265) plus an optional neighbor-table cache
(tools.pyx:94-95). Here, in addition to the result checkpoints in
bench/mst.py, long anneals themselves are resumable: the schedule is run
in segments and (state, key, segment index) is snapshotted after each —
the (key, state, schedule index) snapshot design from SURVEY.md §5.

npz is the storage format (single-host, no sharded arrays to restore);
orbax is intentionally not required for states this small.
"""

from __future__ import annotations

import os

import numpy as np
import jax
import jax.numpy as jnp


def save_neighbor_table(path, nbs):
    """Cache a compiled neighbor table (tools.pyx:94-95 analog)."""
    np.save(path, np.asarray(nbs))


def load_neighbor_table(path):
    return np.load(path)


def validate_state(state, domain="ising"):
    """Failure detection for long runs: raise if a state left its domain
    (NaNs from a bad schedule, corrupted restore, ...). domain: "ising"
    (+/-1) or "angles" ([0, pi])."""
    arr = np.asarray(state)
    if not np.isfinite(arr).all():
        raise FloatingPointError("state contains non-finite values")
    if domain == "ising":
        if not np.isin(arr, (-1.0, 1.0)).all():
            raise ValueError("ising state left the +/-1 domain")
    elif domain == "angles":
        if arr.min() < -1e-6 or arr.max() > np.pi + 1e-6:
            raise ValueError("angle state left [0, pi]")
    return state


class CheckpointedAnneal:
    """Run any schedule-scanned solver in resumable segments.

    >>> ck = CheckpointedAnneal("run.npz", segment=50_000)
    >>> out = ck.run(lambda seg, s, k: sa.anneal(problem, seg, s, k),
    ...              sched, s0, jax.random.key(0))

    After a crash, re-running the same call resumes from the last completed
    segment. The key advances deterministically per segment (fold_in), so a
    resumed run is bit-identical to an uninterrupted one. With
    validate="ising"/"angles", each segment is domain-checked before the
    snapshot is written (a corrupt segment never overwrites a good one).
    """

    def __init__(self, path, segment=100_000, validate=None):
        self.path = path
        self.segment = int(segment)
        self.validate = validate

    def _load(self):
        if not os.path.exists(self.path):
            return None
        d = np.load(self.path, allow_pickle=False)
        return int(d["seg_idx"]), d["state"]

    def _save(self, seg_idx, state):
        tmp = self.path + ".tmp.npz"
        with open(tmp, "wb") as f:
            np.savez(f, seg_idx=seg_idx, state=np.asarray(state))
        os.replace(tmp, self.path)  # atomic: crash never corrupts

    def run(self, solver_fn, sched, state, key, verbose=False):
        """solver_fn(sched_segment, state, segment_key) -> new state."""
        sched = np.asarray(sched)
        n_seg = max(1, -(-sched.shape[0] // self.segment))
        start = 0
        loaded = self._load()
        if loaded is not None:
            start, state_np = loaded
            state = jnp.asarray(state_np)
            if verbose:
                print(f"resuming from segment {start}/{n_seg}")
        for i in range(start, n_seg):
            seg = sched[i * self.segment:(i + 1) * self.segment]
            seg_key = jax.random.fold_in(key, i)
            state = solver_fn(jnp.asarray(seg), state, seg_key)
            if self.validate is not None:
                validate_state(state, self.validate)
            self._save(i + 1, state)
            if verbose:
                print(f"segment {i + 1}/{n_seg} checkpointed")
        return state

    def clear(self):
        if os.path.exists(self.path):
            os.remove(self.path)
