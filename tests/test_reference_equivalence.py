"""Statistical equivalence vs the reference's sequential-shuffled sampler.

The reference kernel visits spins one at a time in a Fisher-Yates-shuffled
order with immediately-visible updates (sa.pyx:71-99). Our colored sweep is
a different — parallel — sampler for the same Gibbs measure. This module
implements the sequential algorithm directly from its defining equations
(as a NumPy oracle) and checks that annealed residual-energy distributions
agree within statistical error at equal sweep counts — the validation
criterion of SURVEY.md §4 / BASELINE.md.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from montecarlosolvers_tpu.models import instances
from montecarlosolvers_tpu.solvers import sa
from montecarlosolvers_tpu import schedules


def sequential_anneal(rng, s, nbr_idx, nbr_J, h, sched):
    """Reference-semantics thermal anneal: per temperature, one sweep of
    single-spin Metropolis in a fresh random permutation, updates applied
    immediately (the defining behavior of sa.Anneal)."""
    n = s.shape[0]
    for temp in sched:
        order = rng.permutation(n)
        for i in order:
            field = float(nbr_J[i] @ s[nbr_idx[i]]) + h[i]
            de = -2.0 * s[i] * field
            if de <= 0.0 or (temp > 0 and rng.random() < np.exp(-de / temp)):
                s[i] = -s[i]
    return s


@pytest.fixture(scope="module")
def problem():
    prob, _ = instances.random_2d_lattice(8, rng=np.random.default_rng(42))
    return prob


class TestSequentialVsColored:
    def test_residual_energy_distributions_match(self, problem):
        """Equal-sweep anneals: mean final energies of the sequential
        oracle and the colored sweep must agree within combined stderr."""
        n = problem.nspins
        tau, reps = 150, 120
        sched = np.linspace(2.5, 0.0, tau)

        # sequential oracle
        rng = np.random.default_rng(7)
        nbr_idx = np.asarray(problem.nbr_idx)
        nbr_J = np.asarray(problem.nbr_J)
        h = np.asarray(problem.h)
        e_seq = np.empty(reps)
        for r in range(reps):
            s = rng.choice([-1.0, 1.0], size=n)
            s = sequential_anneal(rng, s, nbr_idx, nbr_J, h, sched)
            e_seq[r] = float(problem.energy(jnp.asarray(s, jnp.float32)))

        # colored parallel sweep (ours)
        key = jax.random.key(3)
        s0 = sa.random_state(key, n, batch=(reps,))
        out = sa.anneal(problem, jnp.asarray(sched, jnp.float32), s0, key)
        e_col = np.asarray(problem.energy(out))

        m1, m2 = e_seq.mean(), e_col.mean()
        se = np.sqrt(e_seq.var() / reps + e_col.var() / reps)
        assert abs(m1 - m2) < 4.0 * se, (m1, m2, se)
        # spread should be comparable too (variance ratio sanity)
        assert 0.4 < e_seq.std() / max(e_col.std(), 1e-9) < 2.5

    def test_equilibrium_distributions_match(self, problem):
        """Fixed-temperature equilibrium: mean energy of both samplers at
        T = 1.2 agrees (both must sample the same Gibbs measure)."""
        n = problem.nspins
        temp, nsweeps, burn, reps = 1.2, 120, 40, 48

        rng = np.random.default_rng(11)
        nbr_idx = np.asarray(problem.nbr_idx)
        nbr_J = np.asarray(problem.nbr_J)
        h = np.asarray(problem.h)
        samples_seq = []
        for r in range(reps // 4):
            s = rng.choice([-1.0, 1.0], size=n)
            sched = np.full(nsweeps, temp)
            # collect the tail energies of a fixed-T run
            for t in range(nsweeps):
                s = sequential_anneal(rng, s, nbr_idx, nbr_J, h, [temp])
                if t >= burn:
                    samples_seq.append(
                        float(problem.energy(jnp.asarray(s, jnp.float32)))
                    )
        e_seq = np.asarray(samples_seq)

        key = jax.random.key(5)
        s0 = sa.random_state(key, n, batch=(reps,))
        out, es = sa.anneal(
            problem, jnp.full((nsweeps,), temp), s0, key, collect_energy=True
        )
        e_col = np.asarray(es)[burn:].ravel()

        m1, m2 = e_seq.mean(), e_col.mean()
        se = np.sqrt(
            e_seq.var() / (len(e_seq) / 8) + e_col.var() / (len(e_col) / 8)
        )  # /8: crude autocorrelation discount
        assert abs(m1 - m2) < 4.0 * se, (m1, m2, se)
