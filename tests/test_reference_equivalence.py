"""Statistical equivalence vs the reference's sequential-shuffled sampler.

The reference kernel visits spins one at a time in a Fisher-Yates-shuffled
order with immediately-visible updates (sa.pyx:71-99). Our colored sweep is
a different — parallel — sampler for the same Gibbs measure. This module
implements the sequential algorithm directly from its defining equations
(as a NumPy oracle) and checks that annealed residual-energy distributions
agree within statistical error at equal sweep counts — the validation
criterion of SURVEY.md §4 / BASELINE.md.

A direct head-to-head against the compiled Cython reference is not
possible in this environment: Cython is not installed and the sandbox has
no package egress (`pip install cython` is unavailable), and the shipped
binaries are win-amd64/py36 (solvers/*.cp36-win_amd64.pyd). These oracles
are the substitute: they implement the reference kernels' defining update
rules (sa.pyx:71-99; qmc.pyx:97-143,405-438) in NumPy with sequential
semantics and compare distributions, which validates the same property a
binary head-to-head would.
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


def sequential_piqmc_anneal(rng, confs, nbr_idx, nbr_J, h, a_sched, b_sched,
                            temp):
    """Reference-semantics PIQMC local+global anneal (qmc.pyx:97-143,
    405-438): per schedule step, per slice in order, single-spin Metropolis
    in a fresh random permutation with immediately-visible updates
    (intra-slice + periodic Trotter-ring dE at T_eff = P*T), then
    sequential whole-line flips whose dE sums intra-slice terms only
    (J_perp cancels). confs: (P, N), modified in place."""
    P, n = confs.shape
    teff = temp * P
    for gamma, B in zip(a_sched, b_sched):
        jp = -(teff / 2.0) * np.log(np.tanh(gamma / teff))
        for k in range(P):
            up, dn = (k - 1) % P, (k + 1) % P
            for i in rng.permutation(n):
                field = float(nbr_J[i] @ confs[k, nbr_idx[i]]) + h[i]
                tr = confs[up, i] + confs[dn, i]
                de = -2.0 * B * confs[k, i] * field + 2.0 * jp * confs[k, i] * tr
                if de <= 0.0 or rng.random() < np.exp(-de / teff):
                    confs[k, i] = -confs[k, i]
        for i in rng.permutation(n):
            fields = confs[:, nbr_idx[i]] @ nbr_J[i] + h[i]  # (P,)
            de = -2.0 * B * float(confs[:, i] @ fields)
            if de <= 0.0 or rng.random() < np.exp(-de / teff):
                confs[:, i] = -confs[:, i]
    return confs


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


class TestSequentialPIQMCOracle:
    def test_piqmc_residual_energy_distributions_match(self):
        """Equal-sweeps MST-style anneals: the sequential reference-semantics
        PIQMC oracle (local+global, qmc.pyx:97-143,405-438), our generic
        space-time-colored engine, and the split-checkerboard engine must
        all land the same best-slice final-energy distribution within
        combined stderr (the flagship-kernel analog of the SA oracle)."""
        from montecarlosolvers_tpu.solvers import qmc

        L, P, pt, tau, reps = 6, 4, 1.0, 120, 64
        temp = pt / P
        gprob, (rows, cols, vals) = instances.random_2d_lattice(
            L, rng=np.random.default_rng(19)
        )
        from montecarlosolvers_tpu.models.lattice import LatticeProblem

        lprob = LatticeProblem.from_edges(L, rows, cols, vals)
        n = gprob.nspins
        a_np = np.linspace(2.5, 1e-8, tau)
        b_np = np.ones(tau)

        # sequential oracle
        rng = np.random.default_rng(23)
        nbr_idx = np.asarray(gprob.nbr_idx)
        nbr_J = np.asarray(gprob.nbr_J)
        h = np.asarray(gprob.h)
        e_seq = np.empty(reps)
        for r in range(reps):
            confs = np.tile(rng.choice([-1.0, 1.0], size=n), (P, 1))
            confs = sequential_piqmc_anneal(
                rng, confs, nbr_idx, nbr_J, h, a_np, b_np, temp
            )
            e_seq[r] = float(
                qmc.best_slice_energy(gprob, jnp.asarray(confs, jnp.float32))
            )

        # our engines at the same sweep budget (generic colored + split)
        a = jnp.asarray(a_np, jnp.float32)
        b = jnp.asarray(b_np, jnp.float32)
        key = jax.random.key(29)
        s0 = sa.random_state(key, n, batch=(reps,))
        confs0 = qmc.replicate(s0, P)
        outs = {}
        for name, prob in (("generic", gprob), ("split", lprob)):
            out = qmc.anneal(
                prob, a, b, temp, confs0, jax.random.key(31),
                global_moves=True,
            )
            outs[name] = np.asarray(qmc.best_slice_energy(gprob, out))

        for name, e_ours in outs.items():
            m1, m2 = e_seq.mean(), e_ours.mean()
            se = np.sqrt(e_seq.var() / reps + e_ours.var() / reps)
            assert abs(m1 - m2) < 4.0 * se, (name, m1, m2, se)
            assert 0.4 < e_seq.std() / max(e_ours.std(), 1e-9) < 2.5, name
