"""Compile-shape bucketing via NaN no-op schedule pads (VERDICT r3 #8).

schedules.pad_schedule front-pads a schedule with NaN steps so every
device dispatch shape (after the solvers' segmentation) falls in a small
bucket set — an MST matrix rerun compiles <=3 programs per arm instead of
one per tau point. The trick is only sound if a NaN schedule step is an
EXACT no-op in every XLA engine: NaN poisons either the step's dE or both
Metropolis branches (ops/metropolis.metropolis_accept compares the
downhill branch against 0.0*temp), so state passes through bitwise
unchanged. Pinned here for every engine the MST harness can route to.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from montecarlosolvers_tpu import schedules
from montecarlosolvers_tpu.bench.mst import DEFAULT_TAUS
from montecarlosolvers_tpu.models.instances import random_2d_lattice
from montecarlosolvers_tpu.solvers import sa, qmc, svmc


@pytest.fixture(scope="module")
def lat():
    problem, _ = random_2d_lattice(6, rng=0, lattice=True)
    return problem


class TestPadSchedule:
    def test_no_pad_when_already_bucketed(self):
        s = np.linspace(3.0, 0.0, 25_000, dtype=np.float32)
        out = np.asarray(schedules.pad_schedule(s, 25_000))
        assert np.array_equal(out, s)

    def test_pads_to_smallest_bucket(self):
        s = np.linspace(3.0, 0.0, 60, dtype=np.float32)
        out = np.asarray(schedules.pad_schedule(s, 25_000))
        assert len(out) == 25_000 // 32
        assert np.isnan(out[: len(out) - 60]).all()
        assert np.array_equal(out[-60:], s)  # real schedule at the END

    def test_tail_of_long_schedule_bucketed(self):
        n = 2 * 25_000 + 5253
        s = np.linspace(3.0, 0.0, n, dtype=np.float32)
        out = np.asarray(schedules.pad_schedule(s, 25_000))
        assert len(out) % 25_000 == 25_000 // 4  # tail bucket
        assert np.array_equal(out[-n:], s)

    def test_mst_matrix_compiles_at_most_three_shapes_per_arm(self):
        for segment in (25_000, 200_000):
            shapes = set()
            for tau in DEFAULT_TAUS:
                s = np.zeros(int(tau), dtype=np.float32)
                padded = schedules.pad_schedule(s, segment)
                for lo, hi in schedules.segments(len(padded), segment):
                    shapes.add(hi - lo)
            assert len(shapes) <= 3, (segment, sorted(shapes))

    def test_segment_none_passthrough(self):
        s = np.linspace(1.0, 0.0, 77, dtype=np.float32)
        assert np.array_equal(np.asarray(schedules.pad_schedule(s, None)), s)


class TestNaNStepIsExactNoOp:
    """A 5-step all-NaN schedule must return the input state bitwise."""

    def _check(self, out, ref):
        assert np.array_equal(np.asarray(out), np.asarray(ref))

    def test_sa_engines(self, lat):
        gen = lat.to_generic()
        key = jax.random.key(0)
        nan5 = jnp.full((5,), jnp.nan)
        s0 = sa.random_state(key, lat.nspins, batch=(3,))
        self._check(sa.anneal(lat, nan5, s0, key), s0)          # split
        self._check(sa.anneal(lat, nan5, s0, key, engine="masked"), s0)
        self._check(sa.anneal(gen, nan5, s0, key), s0)          # packed

    def test_qmc_engines(self, lat):
        key = jax.random.key(1)
        nan5 = jnp.full((5,), jnp.nan)
        s0 = sa.random_state(key, lat.nspins, batch=(2,))
        confs = qmc.replicate(s0, 4)   # even P: split engine
        self._check(
            qmc.anneal(lat, nan5, nan5, 0.25, confs, key, global_moves=True),
            confs,
        )
        confs5 = qmc.replicate(s0, 5)  # odd P: generic engine
        self._check(
            qmc.anneal(lat, nan5, nan5, 0.25, confs5, key, global_moves=True),
            confs5,
        )
        lut = schedules.bath_lookuptable(4, 1e-2)
        self._check(
            qmc.anneal(lat, nan5, nan5, 0.25, confs, key, lookuptable=lut),
            confs,
        )
        lut5 = schedules.bath_lookuptable(5, 1e-2)
        self._check(
            qmc.anneal(lat, nan5, nan5, 0.25, confs5, key, lookuptable=lut5),
            confs5,
        )

    def test_svmc_engines(self, lat):
        gen = lat.to_generic()
        key = jax.random.key(2)
        nan5 = jnp.full((5,), jnp.nan)
        th = svmc.random_state(key, lat.nspins, batch=(3,))
        for tf in (False, True):
            self._check(svmc.anneal(lat, nan5, nan5, 0.05, th, key, tf=tf), th)
        self._check(svmc.anneal(gen, nan5, nan5, 0.05, th, key, tf=True), th)

    def test_padded_anneal_matches_sane_quality(self, lat):
        """End-to-end: a padded schedule anneals to the same quality as
        unpadded (pads are pure no-ops; trajectories differ only through
        the per-step key stream)."""
        key = jax.random.key(3)
        s0 = sa.random_state(key, lat.nspins, batch=(64,))
        sched = np.linspace(3.0, 0.0, 300, dtype=np.float32)
        padded = schedules.pad_schedule(sched, 512)  # pads 300 -> 512
        assert len(padded) == 512
        e_plain = float(np.mean(np.asarray(
            lat.energy(sa.anneal(lat, jnp.asarray(sched), s0, key)))))
        e_pad = float(np.mean(np.asarray(
            lat.energy(sa.anneal(lat, padded, s0, key)))))
        # same protocol, independent streams: means agree within a few
        # percent of the energy scale at 64 chains
        assert abs(e_plain - e_pad) / abs(e_plain) < 0.05
