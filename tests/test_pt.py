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


class TestQuantumPT:
    def test_gamma_ladder_marginals_match_extended_gibbs(self, rng):
        """Each Gamma rung must sample its own exact extended-Gibbs measure
        (the kinetic-term exchange rule preserves the product measure)."""
        from tests.test_qmc import extended_energy

        prob = IsingProblem.from_edges(2, [0], [1], [0.9], maxnb=1)
        slices, temp, b = 2, 0.8, 1.0
        teff = temp * slices
        gammas = jnp.asarray([0.4, 0.9, 1.8])
        M = gammas.shape[0]

        states = []
        for bits in range(16):
            s = np.array([(bits >> i) & 1 for i in range(4)]) * 2 - 1
            states.append(s.reshape(2, 2).astype(np.float32))
        states = jnp.asarray(np.stack(states))
        exact_mean = []
        for g in np.asarray(gammas):
            es = np.asarray(extended_energy(prob, states, temp, float(g), b=b))
            w = np.exp(-es / teff)
            exact_mean.append(float((w * es).sum() / w.sum()))

        key = jax.random.key(3)
        confs = jnp.where(
            jax.random.bernoulli(key, 0.5, (M, slices, 2)), 1.0, -1.0
        )
        # run in chunks, measuring the extended energy per rung at chunk
        # ends (samples 12 sweeps apart are still autocorrelated on this
        # tiny system — tolerance reflects the effective sample size)
        samples = [[] for _ in range(M)]
        nchunks, chunk = 500, 12
        for c in range(nchunks):
            key, kr = jax.random.split(key)
            confs, rate = pt.sample_piqmc(
                prob, gammas, temp, confs, kr, chunk, b=b, swap_every=2
            )
            if c >= nchunks // 10:
                for m, g in enumerate(np.asarray(gammas)):
                    samples[m].append(
                        float(extended_energy(prob, confs[m], temp, float(g), b=b))
                    )
        assert float(rate) > 0.05, "no gamma exchange happening"
        for m in range(M):
            emp = np.mean(samples[m])
            se = np.std(samples[m]) / np.sqrt(len(samples[m]) / 4.0)
            assert abs(emp - exact_mean[m]) < 4.0 * se, (
                m, emp, exact_mean[m], se,
            )

    def test_tune_ladder_equalizes_pair_rates(self, rng):
        prob, _ = instances.random_2d_lattice(4, rng=rng)
        temps0 = pt.geometric_ladder(0.15, 3.0, 10)
        key = jax.random.key(5)
        # baseline pair rates on the untuned ladder
        states = sa.random_state(key, 16, batch=(10,))
        _, _, pr0 = pt.sample(prob, temps0, states, key, 400,
                              per_pair_rates=True)
        temps, pr = pt.tune_ladder(prob, temps0, key, rounds=4,
                                   sweeps_per_round=400)
        pr0, pr = np.asarray(pr0), np.asarray(pr)
        # endpoints pinned, ladder monotone
        assert np.isclose(float(temps[0]), float(temps0[0]), rtol=1e-5)
        assert np.isclose(float(temps[-1]), float(temps0[-1]), rtol=1e-5)
        assert np.all(np.diff(np.asarray(temps)) > 0)
        # tuning must tighten the spread of per-pair acceptance
        assert pr.std() < pr0.std(), (pr0, pr)
        assert pr.min() > pr0.min() - 0.02

    def test_tune_ladder_piqmc_equalizes_pair_rates(self, rng):
        prob, _ = instances.random_2d_lattice(3, rng=rng)
        g0 = pt.geometric_ladder(0.2, 4.0, 8)
        key = jax.random.key(9)
        slices = 4
        confs0 = jnp.where(
            jax.random.bernoulli(key, 0.5, (8, slices, prob.nspins)),
            1.0, -1.0,
        )
        _, _, pr0 = pt.sample_piqmc(prob, g0, 0.5, confs0, key, 400,
                                    per_pair_rates=True)
        gammas, pr = pt.tune_ladder_piqmc(prob, g0, 0.5, key, rounds=4,
                                          sweeps_per_round=400,
                                          slices=slices)
        pr0, pr = np.asarray(pr0), np.asarray(pr)
        assert np.isclose(float(gammas[0]), float(g0[0]), rtol=1e-5)
        assert np.isclose(float(gammas[-1]), float(g0[-1]), rtol=1e-5)
        assert np.all(np.diff(np.asarray(gammas)) > 0)
        assert pr.std() <= pr0.std() + 0.02, (pr0, pr)


class TestSamplePiqmcSplitEngine:
    """sample_piqmc routes even-L LatticeProblems with even P through the
    split-checkerboard engine (per-rung J_perp vector); both paths must
    agree."""

    def _problem(self, rng, L=4):
        prob, triplets = instances.random_2d_lattice(L, rng=rng,
                                                     lattice=True)
        return prob

    def test_split_kinetic_matches_generic(self, rng):
        from montecarlosolvers_tpu.ops import split as split_ops

        prob = self._problem(rng)
        assert split_ops.supports_split(prob, 4)
        sl = split_ops.build_split(prob)
        key = jax.random.key(0)
        confs = jnp.where(
            jax.random.bernoulli(key, 0.5, (3, 4, prob.nspins)), 1.0, -1.0
        )
        k_generic = jnp.sum(confs * jnp.roll(confs, -1, axis=-2),
                            axis=(-1, -2))
        k_split = split_ops.qmc_split_kinetic(sl, *split_ops.pack_qmc(sl, confs))
        assert np.array_equal(np.asarray(k_generic), np.asarray(k_split))

    def test_split_path_matches_generic_statistics(self, rng):
        """Equal ladders on the same physics: per-rung mean slice energy
        and kinetic term agree between the split engine (LatticeProblem)
        and the generic engine (same couplings via to_generic)."""
        prob = self._problem(rng)
        generic = prob.to_generic()
        gammas = jnp.asarray([1.5, 0.9, 0.5], jnp.float32)
        M, P, temp = 3, 4, 0.6
        key = jax.random.key(3)
        confs0 = jnp.where(
            jax.random.bernoulli(key, 0.5, (M, P, prob.nspins)), 1.0, -1.0
        )

        def run(problem, key):
            es, ks = [], []
            confs = confs0
            for c in range(60):
                key, kr = jax.random.split(key)
                confs, rate = pt.sample_piqmc(
                    problem, gammas, temp, confs, kr, 10, swap_every=2,
                    global_moves=True,
                )
                if c >= 10:
                    from montecarlosolvers_tpu.solvers import qmc
                    es.append(np.asarray(
                        qmc.slice_energies(problem, confs)).mean(axis=(1,)))
                    ks.append(np.asarray(jnp.sum(
                        confs * jnp.roll(confs, -1, axis=-2), axis=(-1, -2))))
            return np.array(es), np.array(ks), float(rate)

        es_s, ks_s, rate_s = run(prob, jax.random.key(11))
        es_g, ks_g, rate_g = run(generic, jax.random.key(22))
        # per-rung equilibrium agreement within combined standard errors
        for m in range(M):
            for a, b_ in ((es_s[:, m], es_g[:, m]), (ks_s[:, m], ks_g[:, m])):
                se = np.sqrt(a.var() / (len(a) / 4) + b_.var() / (len(b_) / 4))
                assert abs(a.mean() - b_.mean()) < 5.0 * max(se, 1e-6), (
                    m, a.mean(), b_.mean(), se,
                )
        assert rate_s > 0.02 and rate_g > 0.02

    def test_split_engine_marginals_match_gibbs(self, rng):
        """Even-L LatticeProblems route pt.sample through the split
        engine; every rung must still sample its exact Gibbs measure."""
        from montecarlosolvers_tpu.ops import split as split_ops

        prob, _ = instances.random_2d_lattice(4, rng=rng, lattice=True)
        assert split_ops.supports_split(prob)
        temps = jnp.asarray([0.8, 1.6, 3.2])
        key = jax.random.key(4)
        states = sa.random_state(key, prob.nspins, batch=(3,))
        nsweeps, burn = 12000, 2000
        out, rate, es = pt.sample(
            prob, temps, states, key, nsweeps, swap_every=2,
            collect_energy=True,
        )
        assert out.shape == (3, prob.nspins)
        assert set(np.unique(np.asarray(out))) <= {-1.0, 1.0}
        es = np.asarray(es)[burn:]
        assert float(rate) > 0.05, "no replica exchange happening"
        for k, t in enumerate(np.asarray(temps)):
            exact = _exact_mean_energy(prob, t)
            emp = es[:, k].mean()
            se = es[:, k].std() / np.sqrt(len(es) / 20.0)
            assert abs(emp - exact) < max(5.0 * se, 0.1), (k, t, emp, exact)


class TestICM:
    """Isoenergetic cluster moves (Houdayer) + PT."""

    def test_houdayer_preserves_pair_energy_and_overlap(self, rng):
        from montecarlosolvers_tpu.ops.cluster import houdayer_sweep

        prob, _ = instances.random_2d_lattice(5, rng=rng,
                                              with_fields=True)
        key = jax.random.key(0)
        for seed in range(6):
            k1, k2, k3 = jax.random.split(jax.random.fold_in(key, seed), 3)
            s1 = sa.random_state(k1, prob.nspins)
            s2 = sa.random_state(k2, prob.nspins)
            o1, o2, flip = houdayer_sweep(prob, s1, s2, k3)
            e_before = float(prob.energy(s1) + prob.energy(s2))
            e_after = float(prob.energy(o1) + prob.energy(o2))
            # rejection-free isoenergy: dE1 = -dE2 exactly
            np.testing.assert_allclose(e_after, e_before, rtol=1e-5)
            # q invariant (flips act on both replicas)
            assert np.array_equal(
                np.asarray(s1 * s2), np.asarray(o1 * o2)
            )
            # flips confined to the q = -1 domain
            assert not np.any(np.asarray(flip) & (np.asarray(s1 * s2) > 0))

    def test_icm_marginals_match_gibbs(self, rng):
        """Both ladders of sample_icm must still sample each rung's exact
        Gibbs measure — Houdayer moves must not bias the product
        ensemble."""
        rows = np.array([0, 1, 0, 0, 2])
        cols = np.array([1, 2, 2, 0, 2])
        vals = np.array([1.0, -0.8, 0.6, 0.4, -0.3])
        prob = IsingProblem.from_edges(3, rows, cols, vals, maxnb=4)
        temps = jnp.asarray([0.7, 1.4, 3.0])
        key = jax.random.key(0)
        states = sa.random_state(key, 3, batch=(2, 3))
        nsweeps, burn = 25000, 3000
        out, rate, hfrac, es = pt.sample_icm(
            prob, temps, states, key, nsweeps, swap_every=2,
            houdayer_every=2, collect_energy=True,
        )
        es = np.asarray(es)[burn:]  # (T, 2, M)
        assert float(rate) > 0.05, "no replica exchange happening"
        assert 0.0 < float(hfrac) < 1.0, "no Houdayer flips happening"
        for ladder in range(2):
            for k, t in enumerate(np.asarray(temps)):
                exact = _exact_mean_energy(prob, t)
                emp = es[:, ladder, k].mean()
                assert abs(emp - exact) < 0.05, (ladder, k, t, emp, exact)

    def test_icm_split_engine_finds_ground_state(self, rng):
        prob, _ = instances.random_2d_lattice(4, rng=rng, lattice=True)
        e_gs, _ = brute_force_ground(prob.to_generic())
        temps = pt.geometric_ladder(0.1, 3.0, 8)
        key = jax.random.key(1)
        states = sa.random_state(key, 16, batch=(2, 8))
        out, rate, hfrac = pt.sample_icm(prob, temps, states, key, 800,
                                         houdayer_every=4)
        assert out.shape == (2, 8, 16)
        assert set(np.unique(np.asarray(out))) <= {-1.0, 1.0}
        best = float(np.asarray(prob.energy(out)).min())
        assert np.isclose(best, e_gs, atol=1e-3), (best, e_gs)

    def test_icm_rung_sharded_bitwise(self, rng):
        if len(jax.devices()) < 8:
            import pytest as _pytest
            _pytest.skip("needs 8 virtual devices")
        from montecarlosolvers_tpu.parallel import make_mesh
        from jax.sharding import NamedSharding, PartitionSpec as P

        prob, _ = instances.random_2d_lattice(4, rng=rng, lattice=True)
        temps = pt.geometric_ladder(0.5, 3.0, 8)
        key = jax.random.key(2)
        states = sa.random_state(key, 16, batch=(2, 8))
        ref, rate_ref, h_ref = pt.sample_icm(prob, temps, states, key, 40,
                                             houdayer_every=2)
        mesh = make_mesh(chains=8)
        sharded = jax.device_put(
            states, NamedSharding(mesh, P(None, "chains", None))
        )
        out, rate, h = pt.sample_icm(prob, temps, sharded, key, 40,
                                     houdayer_every=2)
        assert np.array_equal(np.asarray(ref), np.asarray(out))
        assert float(rate_ref) == float(rate)
        assert float(h_ref) == float(h)
