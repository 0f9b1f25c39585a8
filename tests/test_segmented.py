"""Solver-internal schedule segmentation (VERDICT r3 #9).

Very long schedules must run as several bounded device dispatches WITHOUT
callers hand-slicing: sa/qmc/svmc `anneal` slice the expanded schedule via
`schedules.segments` and fold the key per segment. Contracts pinned here:

  * one-segment schedules are bitwise-identical to the pre-segmentation
    behavior (the key is used unfolded);
  * a segmented run equals the explicit hand-sliced loop with
    `fold_in(key, segment_start)` — the scheme bench/mst.py used before
    the logic moved into the solvers;
  * collect_energy concatenates per-segment outputs to the full length.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from montecarlosolvers_tpu import schedules
from montecarlosolvers_tpu.models.instances import random_2d_lattice
from montecarlosolvers_tpu.solvers import sa, qmc, svmc


@pytest.fixture(scope="module")
def lat():
    problem, _ = random_2d_lattice(6, rng=0, lattice=True)
    return problem


class TestSegmentsHelper:
    def test_single_segment(self):
        assert schedules.segments(100, 200) == [(0, 100)]
        assert schedules.segments(100, 100) == [(0, 100)]
        assert schedules.segments(100, None) == [(0, 100)]

    def test_multi_segment_covers_exactly(self):
        segs = schedules.segments(250, 100)
        assert segs == [(0, 100), (100, 200), (200, 250)]

    def test_at_most_two_distinct_lengths(self):
        segs = schedules.segments(6_000_000, 25_000)
        lengths = {hi - lo for lo, hi in segs}
        assert len(lengths) <= 2
        assert sum(hi - lo for lo, hi in segs) == 6_000_000


class TestSASegmented:
    def test_single_segment_bitwise_matches_unsegmented(self, lat):
        key = jax.random.key(0)
        s0 = sa.random_state(key, lat.nspins, batch=(4,))
        sched = schedules.linear(3.0, 0.0, 50)
        a = sa.anneal(lat, sched, s0, key, segment=None)
        b = sa.anneal(lat, sched, s0, key)  # default segment >> 50
        assert np.array_equal(np.asarray(a), np.asarray(b))

    def test_segmented_equals_hand_sliced_fold_loop(self, lat):
        key = jax.random.key(1)
        s0 = sa.random_state(key, lat.nspins, batch=(4,))
        sched = np.asarray(schedules.linear(3.0, 0.1, 25))
        got = sa.anneal(lat, jnp.asarray(sched), s0, key, segment=10)
        out = s0
        for lo in range(0, 25, 10):
            out = sa.anneal(
                lat, jnp.asarray(sched[lo:lo + 10]), out,
                jax.random.fold_in(key, lo),
            )
        assert np.array_equal(np.asarray(got), np.asarray(out))

    def test_collect_energy_concatenates_full_length(self, lat):
        key = jax.random.key(2)
        s0 = sa.random_state(key, lat.nspins, batch=(3,))
        sched = schedules.linear(2.0, 0.1, 25)
        out, es = sa.anneal(lat, sched, s0, key, segment=10,
                            collect_energy=True)
        assert es.shape == (25, 3)
        assert np.all(np.isfinite(np.asarray(es)))


class TestQMCSegmented:
    def test_single_segment_bitwise_matches_unsegmented(self, lat):
        key = jax.random.key(3)
        s0 = sa.random_state(key, lat.nspins, batch=(2,))
        confs = qmc.replicate(s0, 4)
        a = schedules.transverse_field(3.0, 1e-8, 40)
        x = qmc.anneal(lat, a, jnp.ones_like(a), 0.25, confs, key,
                       segment=None, global_moves=True)
        y = qmc.anneal(lat, a, jnp.ones_like(a), 0.25, confs, key,
                       global_moves=True)
        assert np.array_equal(np.asarray(x), np.asarray(y))

    def test_segmented_equals_hand_sliced_fold_loop(self, lat):
        key = jax.random.key(4)
        s0 = sa.random_state(key, lat.nspins, batch=(2,))
        confs0 = qmc.replicate(s0, 4)
        a = np.asarray(schedules.transverse_field(3.0, 1e-8, 25))
        got = qmc.anneal(lat, jnp.asarray(a), jnp.ones(25), 0.25, confs0,
                         key, segment=10, global_moves=True)
        confs = confs0
        for lo in range(0, 25, 10):
            aa = jnp.asarray(a[lo:lo + 10])
            confs = qmc.anneal(lat, aa, jnp.ones_like(aa), 0.25, confs,
                               jax.random.fold_in(key, lo),
                               global_moves=True)
        assert np.array_equal(np.asarray(got), np.asarray(confs))

    def test_collect_energy_concatenates_full_length(self, lat):
        key = jax.random.key(5)
        confs = qmc.replicate(sa.random_state(key, lat.nspins, batch=(2,)), 4)
        a = schedules.transverse_field(3.0, 1e-8, 25)
        out, es = qmc.anneal(lat, a, jnp.ones_like(a), 0.25, confs, key,
                             segment=10, collect_energy=True)
        assert es.shape == (25, 2)
        assert np.all(np.isfinite(np.asarray(es)))

    def test_dissipative_path_segments(self, lat):
        key = jax.random.key(6)
        P = 4
        lut = schedules.bath_lookuptable(P, 1e-2)
        confs = qmc.replicate(sa.random_state(key, lat.nspins, batch=(2,)), P)
        a = schedules.transverse_field(3.0, 1e-8, 25)
        out = qmc.anneal(lat, a, jnp.ones_like(a), 0.25, confs, key,
                         lookuptable=lut, segment=10)
        assert np.isfinite(np.asarray(lat.energy(out))).all()


class TestSVMCSegmented:
    def test_single_segment_bitwise_matches_unsegmented(self, lat):
        key = jax.random.key(7)
        theta = svmc.random_state(key, lat.nspins, batch=(4,))
        a = schedules.transverse_field(3.0, 1e-8, 40)
        x = svmc.anneal(lat, a, jnp.ones_like(a), 0.05, theta, key,
                        tf=True, segment=None)
        y = svmc.anneal(lat, a, jnp.ones_like(a), 0.05, theta, key, tf=True)
        assert np.array_equal(np.asarray(x), np.asarray(y))

    def test_segmented_equals_hand_sliced_fold_loop(self, lat):
        key = jax.random.key(8)
        theta0 = svmc.random_state(key, lat.nspins, batch=(4,))
        a = np.asarray(schedules.transverse_field(3.0, 1e-8, 25))
        got = svmc.anneal(lat, jnp.asarray(a), jnp.ones(25), 0.05, theta0,
                          key, segment=10)
        theta = theta0
        for lo in range(0, 25, 10):
            aa = jnp.asarray(a[lo:lo + 10])
            theta = svmc.anneal(lat, aa, jnp.ones_like(aa), 0.05, theta,
                                jax.random.fold_in(key, lo))
        assert np.array_equal(np.asarray(got), np.asarray(theta))
