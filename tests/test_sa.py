"""SA solver tests: determinism, exact small-instance ground states, and a
detailed-balance check of the colored sweep against the exact Gibbs
distribution (the statistical-equivalence strategy of SURVEY.md §4)."""

import numpy as np
import jax
import jax.numpy as jnp

from montecarlosolvers_tpu.models.ising import IsingProblem
from montecarlosolvers_tpu.models import instances
from montecarlosolvers_tpu.solvers import sa
from montecarlosolvers_tpu.ops.metropolis import colored_metropolis_sweep
from montecarlosolvers_tpu import schedules


def brute_force_ground(prob):
    n = prob.nspins
    assert n <= 20
    states = (((np.arange(2 ** n)[:, None] >> np.arange(n)) & 1) * 2 - 1).astype(
        np.float32
    )
    es = np.asarray(prob.energy(jnp.asarray(states)))
    k = int(np.argmin(es))
    return float(es[k]), states[k]


class TestAnneal:
    def test_deterministic_given_key(self, rng):
        prob, _ = instances.random_2d_lattice(5, rng=rng)
        key = jax.random.key(3)
        s0 = sa.random_state(key, prob.nspins, batch=(3,))
        sched = schedules.linear(3.0, 0.0, 50)
        a = sa.anneal(prob, sched, s0, key)
        b = sa.anneal(prob, sched, s0, key)
        assert np.array_equal(np.asarray(a), np.asarray(b))
        c = sa.anneal(prob, sched, s0, jax.random.key(4))
        assert not np.array_equal(np.asarray(a), np.asarray(c))

    def test_finds_exact_ground_state_4x4(self, rng):
        prob, _ = instances.random_2d_lattice(4, rng=rng)
        e_gs, _ = brute_force_ground(prob)
        key = jax.random.key(0)
        s0 = sa.random_state(key, prob.nspins, batch=(16,))
        sched = schedules.linear(3.0, 0.0, 300)
        s1 = sa.anneal(prob, sched, s0, key)
        es = np.asarray(prob.energy(s1))
        assert np.isclose(es.min(), e_gs, atol=1e-3), (es.min(), e_gs)

    def test_spins_stay_pm1(self, rng):
        prob, _ = instances.random_graph(12, 20, rng=rng, with_fields=True)
        key = jax.random.key(1)
        s0 = sa.random_state(key, prob.nspins)
        s1 = sa.anneal(prob, schedules.linear(2.0, 0.1, 40), s0, key)
        assert set(np.unique(np.asarray(s1))) <= {-1.0, 1.0}

    def test_mcsteps_equivalent_to_repeated_schedule(self, rng):
        prob, _ = instances.random_2d_lattice(3, rng=rng)
        key = jax.random.key(5)
        s0 = sa.random_state(key, prob.nspins)
        sched = schedules.linear(2.0, 0.5, 10)
        a = sa.anneal(prob, sched, s0, key, mcsteps=3)
        b = sa.anneal(prob, jnp.repeat(sched, 3), s0, key, mcsteps=1)
        assert np.array_equal(np.asarray(a), np.asarray(b))

    def test_collect_energy(self, rng):
        prob, _ = instances.random_2d_lattice(3, rng=rng)
        key = jax.random.key(2)
        s0 = sa.random_state(key, prob.nspins, batch=(2,))
        s1, es = sa.anneal(
            prob, schedules.linear(2.0, 0.0, 20), s0, key, collect_energy=True
        )
        assert es.shape == (20, 2)
        assert np.allclose(np.asarray(es[-1]), np.asarray(prob.energy(s1)))


class TestDetailedBalance:
    def test_colored_sweep_samples_gibbs(self, rng):
        """Empirical state distribution of the colored sweep at fixed T must
        match the exact Boltzmann weights (3-spin frustrated triangle +
        fields — exercises multi-color phases and field terms)."""
        rows = np.array([0, 1, 0, 0, 1, 2])
        cols = np.array([1, 2, 2, 0, 1, 2])
        vals = np.array([1.0, -0.7, 0.5, 0.3, -0.2, 0.4])
        prob = IsingProblem.from_edges(3, rows, cols, vals, maxnb=4)
        temp = 1.5

        states = (((np.arange(8)[:, None] >> np.arange(3)) & 1) * 2 - 1).astype(
            np.float32
        )
        es = np.asarray(prob.energy(jnp.asarray(states)))
        w = np.exp(-es / temp)
        p_exact = w / w.sum()

        nchains, nsweeps, burn = 64, 1500, 100
        key = jax.random.key(7)
        s0 = sa.random_state(key, 3, batch=(nchains,))

        @jax.jit
        def run(s0, key):
            keys = jax.random.split(key, nsweeps)

            def body(s, k):
                s = colored_metropolis_sweep(prob, s, k, temp)
                bits = (s > 0).astype(jnp.int32)  # matches states[] encoding
                idx = bits[..., 0] + 2 * bits[..., 1] + 4 * bits[..., 2]
                return s, idx

            _, idxs = jax.lax.scan(body, s0, keys)
            return idxs

        idxs = np.asarray(run(s0, key))[burn:]
        counts = np.bincount(idxs.ravel(), minlength=8)
        p_emp = counts / counts.sum()
        assert np.max(np.abs(p_emp - p_exact)) < 0.01, (p_emp, p_exact)


class TestNoisyAnneal:
    def test_constant_schedule_runs_and_valid(self, rng):
        prob, (rows, cols, vals) = instances.random_2d_lattice(4, rng=rng)
        steps = 30
        nbr_J_sched = jnp.broadcast_to(
            prob.nbr_J, (steps,) + prob.nbr_J.shape
        )
        h_sched = jnp.broadcast_to(prob.h, (steps,) + prob.h.shape)
        key = jax.random.key(0)
        s0 = sa.random_state(key, prob.nspins, batch=(2,))
        sched = schedules.linear(2.0, 0.1, steps)
        out = sa.anneal_noisy(prob, sched, nbr_J_sched, h_sched, s0, key)
        assert out.shape == s0.shape
        assert set(np.unique(np.asarray(out))) <= {-1.0, 1.0}

    def test_noise_changes_trajectory(self, rng):
        prob, _ = instances.random_2d_lattice(4, rng=rng)
        steps = 30
        key = jax.random.key(0)
        base_J = jnp.broadcast_to(prob.nbr_J, (steps,) + prob.nbr_J.shape)
        noise = 0.5 * jax.random.normal(jax.random.key(9), base_J.shape)
        # keep zero slots zero so padding stays inert
        noisy_J = jnp.where(base_J != 0, base_J + noise, 0.0)
        h_sched = jnp.broadcast_to(prob.h, (steps,) + prob.h.shape)
        s0 = sa.random_state(key, prob.nspins, batch=(2,))
        sched = schedules.linear(2.0, 0.1, steps)
        a = sa.anneal_noisy(prob, sched, base_J, h_sched, s0, key)
        b = sa.anneal_noisy(prob, sched, noisy_J, h_sched, s0, key)
        assert not np.array_equal(np.asarray(a), np.asarray(b))


class TestSweepScan:
    def test_b_coeffs_branch(self, rng):
        """sweep_scan's per-step b_coeffs path (PIQMC-style longitudinal
        scaling through the shared engine)."""
        from montecarlosolvers_tpu.ops.metropolis import sweep_scan

        prob, _ = instances.random_2d_lattice(3, rng=rng)
        key = jax.random.key(0)
        s0 = sa.random_state(key, 9, batch=(2,))
        temps = jnp.full((10,), 1.0)
        # b = -2 everywhere == the classical default: results must agree
        a, _ = sweep_scan(prob, s0, key, temps)
        b, _ = sweep_scan(prob, s0, key, temps, b_coeffs=jnp.full((10,), -2.0))
        assert np.array_equal(np.asarray(a), np.asarray(b))
        c, es = sweep_scan(prob, s0, key, temps,
                           b_coeffs=jnp.full((10,), -1.0), collect_energy=True)
        assert es.shape == (10, 2)
