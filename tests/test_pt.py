"""Parallel tempering: each rung must sample its own exact Gibbs measure
(swap moves preserve the product distribution), swaps must actually occur."""

import numpy as np
import jax
import jax.numpy as jnp

from montecarlosolvers_tpu.models.ising import IsingProblem
from montecarlosolvers_tpu.models import instances
from montecarlosolvers_tpu.solvers import pt, sa
from tests.test_sa import brute_force_ground


def _exact_mean_energy(prob, temp):
    n = prob.nspins
    states = (((np.arange(2 ** n)[:, None] >> np.arange(n)) & 1) * 2 - 1).astype(
        np.float32
    )
    es = np.asarray(prob.energy(jnp.asarray(states)))
    w = np.exp(-es / temp)
    return float((w * es).sum() / w.sum())


class TestParallelTempering:
    def test_marginals_match_gibbs(self, rng):
        rows = np.array([0, 1, 0, 0, 2])
        cols = np.array([1, 2, 2, 0, 2])
        vals = np.array([1.0, -0.8, 0.6, 0.4, -0.3])
        prob = IsingProblem.from_edges(3, rows, cols, vals, maxnb=4)
        temps = jnp.asarray([0.7, 1.4, 3.0])
        key = jax.random.key(0)
        states = sa.random_state(key, 3, batch=(3,))
        nsweeps, burn = 25000, 3000
        out, rate, es = pt.sample(
            prob, temps, states, key, nsweeps, swap_every=2,
            collect_energy=True,
        )
        es = np.asarray(es)[burn:]
        assert float(rate) > 0.05, "no replica exchange happening"
        for k, t in enumerate(np.asarray(temps)):
            exact = _exact_mean_energy(prob, t)
            emp = es[:, k].mean()
            assert abs(emp - exact) < 0.05, (k, t, emp, exact)

    def test_pt_finds_ground_state(self, rng):
        prob, _ = instances.random_2d_lattice(4, rng=rng)
        e_gs, _ = brute_force_ground(prob)
        temps = pt.geometric_ladder(0.1, 3.0, 8)
        key = jax.random.key(1)
        states = sa.random_state(key, 16, batch=(8,))
        out, rate, es = pt.sample(prob, temps, states, key, 800,
                                  collect_energy=True)
        best = float(np.asarray(es).min())
        assert np.isclose(best, e_gs, atol=1e-3), (best, e_gs)
        assert float(rate) > 0.01

    def test_batched_ladders(self, rng):
        """PT over several independent ladders via vmap."""
        prob, _ = instances.random_2d_lattice(3, rng=rng)
        temps = pt.geometric_ladder(0.2, 2.0, 4)
        key = jax.random.key(2)
        states = sa.random_state(key, 9, batch=(5, 4))
        keys = jax.random.split(key, 5)
        outs, rates = jax.vmap(
            lambda s, k: pt.sample(prob, temps, s, k, 50)
        )(states, keys)
        assert outs.shape == (5, 4, 9)
        assert set(np.unique(np.asarray(outs))) <= {-1.0, 1.0}
