"""Population annealing: the resampled ensemble must track the exact
Gibbs distribution along the whole schedule, and the weight normalizers
must accumulate to the exact free-energy difference ln[Z(b_end)/Z(b_0)]
(the estimator PA gets for free — Machta 2010)."""

import numpy as np
import jax
import jax.numpy as jnp

from montecarlosolvers_tpu.models.ising import IsingProblem
from montecarlosolvers_tpu.models import instances
from montecarlosolvers_tpu.solvers import pa, sa
from tests.test_sa import brute_force_ground


def _small_problem():
    rows = np.array([0, 1, 2, 3, 0, 1, 0, 4, 5])
    cols = np.array([1, 2, 3, 0, 2, 3, 3, 5, 0])
    vals = np.array([1.0, -0.8, 0.6, 0.4, -0.3, 0.9, -0.5, 0.7, -0.6])
    return IsingProblem.from_edges(6, rows, cols, vals, maxnb=6)


def _exact_log_z(prob, beta):
    n = prob.nspins
    states = (((np.arange(2 ** n)[:, None] >> np.arange(n)) & 1) * 2 - 1
              ).astype(np.float32)
    es = np.asarray(prob.energy(jnp.asarray(states))).astype(np.float64)
    m = (-beta * es).max()
    return float(m + np.log(np.exp(-beta * es - m).sum()))


def _exact_mean_energy(prob, temp):
    n = prob.nspins
    states = (((np.arange(2 ** n)[:, None] >> np.arange(n)) & 1) * 2 - 1
              ).astype(np.float32)
    es = np.asarray(prob.energy(jnp.asarray(states))).astype(np.float64)
    w = np.exp(-(es - es.min()) / temp)
    return float((w * es).sum() / w.sum())


class TestResampling:
    def test_systematic_equal_weights_is_identity(self):
        w = jnp.full((16,), 1.0 / 16)
        idx = pa._systematic_indices(jax.random.key(0), w)
        np.testing.assert_array_equal(np.asarray(idx), np.arange(16))

    def test_systematic_counts_match_weights(self):
        w = jnp.asarray([0.5, 0.25, 0.125, 0.125])
        counts = np.zeros(4)
        for s in range(200):
            i = np.asarray(pa._systematic_indices(jax.random.key(s), w))
            counts += np.bincount(i, minlength=4)
        freq = counts / counts.sum()
        np.testing.assert_allclose(freq, np.asarray(w), atol=0.02)


class TestFreeEnergy:
    def test_log_z_matches_exact_enumeration(self):
        prob = _small_problem()
        beta_end = 1.5
        temps = pa.beta_linear(beta_end, 60, beta_start=0.0)
        r = 4096
        states = sa.random_state(jax.random.key(0), prob.nspins, batch=(r,))
        out, log_z = pa.sample(prob, temps, states, jax.random.key(1),
                               mcsteps=2, beta0=0.0)
        est = float(log_z) + pa.uniform_log_z(prob.nspins)
        exact = _exact_log_z(prob, beta_end)
        assert abs(est - exact) < 0.05, (est, exact)

    def test_log_z_relative_default_beta0(self):
        """Default beta0 = 1/temps[0]: log_z estimates the RATIO
        ln Z(b_end)/Z(b_0), after equilibrating the init at temps[0]."""
        prob = _small_problem()
        b0, b1 = 0.4, 1.2
        temps = pa.beta_linear(b1, 50, beta_start=b0)
        r = 4096
        states = sa.random_state(jax.random.key(2), prob.nspins, batch=(r,))
        # equilibrate at 1/b0 first (default beta0 assumes this)
        states = sa.anneal(prob, jnp.full((300,), 1.0 / b0), states,
                           jax.random.key(3))
        out, log_z = pa.sample(prob, temps, states, jax.random.key(4),
                               mcsteps=2)
        exact = _exact_log_z(prob, b1) - _exact_log_z(prob, b0)
        assert abs(float(log_z) - exact) < 0.05, (float(log_z), exact)

    def test_ess_threshold_accumulation_still_unbiased(self):
        prob = _small_problem()
        beta_end = 2.0
        # a COARSE beta grid (dbeta ~ 0.13): the weight random-walk decays
        # ESS fast early and plateaus near 0.57 once sweeps decorrelate
        # it, so a 0.7 threshold guarantees both resampled and
        # accumulated steps
        temps = pa.beta_linear(beta_end, 16, beta_start=0.0)
        r = 4096
        states = sa.random_state(jax.random.key(5), prob.nspins, batch=(r,))
        out, log_z, stats = pa.sample(
            prob, temps, states, jax.random.key(6), mcsteps=2, beta0=0.0,
            ess_threshold=0.7, collect_stats=True,
        )
        # conditional resampling actually skipped some steps...
        rs = np.asarray(stats["resampled"])
        assert 0 < rs.sum() < rs.size
        # ...without biasing the free-energy accumulator (coarse grid =
        # larger estimator variance, hence the looser band)
        est = float(log_z) + pa.uniform_log_z(prob.nspins)
        exact = _exact_log_z(prob, beta_end)
        assert abs(est - exact) < 0.15, (est, exact)


class TestEnsemble:
    def test_population_tracks_gibbs_mean_energy(self):
        prob = _small_problem()
        beta_end = 1.25
        temps = pa.beta_linear(beta_end, 60, beta_start=0.0)
        r = 4096
        states = sa.random_state(jax.random.key(7), prob.nspins, batch=(r,))
        out, log_z, stats = pa.sample(
            prob, temps, states, jax.random.key(8), mcsteps=2, beta0=0.0,
            collect_stats=True,
        )
        es = np.asarray(prob.energy(out))
        exact = _exact_mean_energy(prob, 1.0 / beta_end)
        # 4-sigma band on the population mean (replicas are correlated by
        # resampling, so inflate the naive stderr by 4x)
        tol = max(4.0 * 4.0 * es.std() / np.sqrt(r), 0.03)
        assert abs(es.mean() - exact) < tol, (es.mean(), exact, tol)
        assert np.asarray(stats["ess"]).min() > 0.2 * r

    def test_split_engine_lattice_reaches_ground_state(self, rng):
        prob, _ = instances.random_2d_lattice(4, rng=rng, lattice=True)
        e_gs, _ = brute_force_ground(prob)
        temps = pa.beta_linear(4.0, 120, beta_start=0.0)
        states = sa.random_state(jax.random.key(9), prob.nspins, batch=(512,))
        out, log_z = pa.sample(prob, temps, states, jax.random.key(10),
                               mcsteps=2, beta0=0.0)
        es = np.asarray(prob.energy(out))
        assert np.isclose(es.min(), e_gs, atol=1e-3), (es.min(), e_gs)
        # ground-state occupancy must match the EXACT Gibbs value at
        # beta=4 (enumerated), not just be "large": the first excited
        # state sits only ~0.13 above, so equilibrium occupancy is ~0.3
        n = prob.nspins
        all_states = (((np.arange(2 ** n)[:, None] >> np.arange(n)) & 1)
                      * 2 - 1).astype(np.float32)
        all_es = np.asarray(prob.energy(jnp.asarray(all_states))
                            ).astype(np.float64)
        w = np.exp(-4.0 * (all_es - all_es.min()))
        p_gs_exact = w[np.isclose(all_es, e_gs, atol=1e-3)].sum() / w.sum()
        p_gs_emp = (np.isclose(es, e_gs, atol=1e-3)).mean()
        # 4-sigma binomial band, resampling correlation inflated 2x
        tol = max(8.0 * np.sqrt(p_gs_exact * (1 - p_gs_exact) / es.size), 0.05)
        assert abs(p_gs_emp - p_gs_exact) < tol, (p_gs_emp, p_gs_exact, tol)

    def test_deterministic_given_key(self):
        prob = _small_problem()
        temps = pa.beta_linear(1.0, 20, beta_start=0.0)
        states = sa.random_state(jax.random.key(11), prob.nspins, batch=(64,))
        a1, z1 = pa.sample(prob, temps, states, jax.random.key(12), beta0=0.0)
        a2, z2 = pa.sample(prob, temps, states, jax.random.key(12), beta0=0.0)
        np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))
        assert float(z1) == float(z2)

    def test_segmented_matches_single_dispatch(self):
        """Segment boundaries fold the key, so segmented vs unsegmented
        differ in streams — but both must be valid runs with consistent
        shapes and finite log_z; the per-segment carry (logw, log_z,
        beta_prev) must chain without loss."""
        prob = _small_problem()
        temps = pa.beta_linear(1.0, 40, beta_start=0.0)
        states = sa.random_state(jax.random.key(13), prob.nspins, batch=(256,))
        out, log_z, stats = pa.sample(
            prob, temps, states, jax.random.key(14), beta0=0.0,
            collect_stats=True, segment=16,
        )
        assert out.shape == states.shape
        assert np.isfinite(float(log_z))
        assert np.asarray(stats["ess"]).shape == (40,)
        est = float(log_z) + pa.uniform_log_z(prob.nspins)
        exact = _exact_log_z(prob, 1.0)
        assert abs(est - exact) < 0.15, (est, exact)

    def test_multinomial_resampling(self):
        prob = _small_problem()
        temps = pa.beta_linear(1.0, 40, beta_start=0.0)
        states = sa.random_state(jax.random.key(15), prob.nspins, batch=(2048,))
        out, log_z = pa.sample(prob, temps, states, jax.random.key(16),
                               beta0=0.0, resample="multinomial")
        est = float(log_z) + pa.uniform_log_z(prob.nspins)
        exact = _exact_log_z(prob, 1.0)
        assert abs(est - exact) < 0.1, (est, exact)

    def test_family_count_diagnostic(self):
        """Ancestor tracking: families start at R, shrink monotonically
        under resampling, and never exceed R or hit 0; a hard quench
        (huge dbeta) collapses lineages to a few families."""
        prob = _small_problem()
        states = sa.random_state(jax.random.key(17), prob.nspins, batch=(128,))
        # gentle schedule: many families survive
        temps = pa.beta_linear(0.5, 30, beta_start=0.0)
        _, _, stats = pa.sample(prob, temps, states, jax.random.key(18),
                                beta0=0.0, collect_stats=True)
        assert 1 <= stats["families"] <= 128
        gentle = stats["families"]
        # brutal two-step quench to beta=8: heavy lineage collapse
        temps_hard = pa.beta_linear(8.0, 2, beta_start=0.0)
        _, _, stats_h = pa.sample(prob, temps_hard, states,
                                  jax.random.key(19), beta0=0.0,
                                  collect_stats=True)
        assert stats_h["families"] < gentle


class TestAdaptive:
    """sample_adaptive (VERDICT r4 #3a): the on-device dbeta solve must
    hold the incremental ESS on target, traverse exactly [beta0,
    beta_end], and keep the ln Z estimator exact-enumeration unbiased."""

    def test_log_z_matches_exact_enumeration(self):
        prob = _small_problem()
        beta_end = 1.5
        r = 4096
        states = sa.random_state(jax.random.key(20), prob.nspins, batch=(r,))
        out, log_z, stats = pa.sample_adaptive(
            prob, beta_end, states, jax.random.key(21), target_frac=0.9,
            mcsteps=2,
        )
        assert stats["reached"]
        est = float(log_z) + pa.uniform_log_z(prob.nspins)
        exact = _exact_log_z(prob, beta_end)
        assert abs(est - exact) < 0.05, (est, exact)

    def test_ess_stays_on_target_and_betas_monotone(self):
        prob = _small_problem()
        r = 2048
        target = 0.9
        states = sa.random_state(jax.random.key(22), prob.nspins, batch=(r,))
        _, _, stats = pa.sample_adaptive(
            prob, 2.0, states, jax.random.key(23), target_frac=target,
        )
        betas = stats["betas"]
        assert stats["reached"] and stats["n_steps"] >= 3
        assert np.all(np.diff(betas) > 0)
        assert np.isclose(betas[-1], 2.0, atol=1e-4)
        # every step but the last lands ON the target (the last is capped
        # by beta_end); bisection tolerance gives a tiny undershoot
        assert np.all(stats["ess"][:-1] >= target * r * 0.97), stats["ess"]

    def test_adaptive_beats_fixed_grid_at_equal_steps(self):
        """The point of adaptivity: at the same number of resample steps,
        the adaptive grid's ln Z error is no worse than the fixed
        beta-linear grid's (it equalizes ESS damage per step)."""
        prob = _small_problem()
        r = 1024
        beta_end = 3.0
        states = sa.random_state(jax.random.key(24), prob.nspins, batch=(r,))
        _, lz_a, stats = pa.sample_adaptive(
            prob, beta_end, states, jax.random.key(25), target_frac=0.85,
            mcsteps=1,
        )
        n = stats["n_steps"]
        temps = pa.beta_linear(beta_end, n, beta_start=0.0)
        _, lz_f = pa.sample(prob, temps, states, jax.random.key(25),
                            mcsteps=1, beta0=0.0)
        exact = _exact_log_z(prob, beta_end) - pa.uniform_log_z(prob.nspins)
        err_a = abs(float(lz_a) - exact)
        err_f = abs(float(lz_f) - exact)
        assert err_a <= err_f + 0.05, (err_a, err_f, n)


class TestCombine:
    def test_combined_log_z_is_mean_in_z_space(self):
        lzs = [1.0, 2.0, 0.5]
        out = pa.combine_runs(lzs)
        expect = np.log(np.exp(lzs).mean())
        assert np.isclose(out["log_z"], expect)
        assert np.isclose(out["weights"].sum(), 1.0)
        # dominant run -> run_ess toward 1; equal runs -> K
        eq = pa.combine_runs([1.0, 1.0, 1.0, 1.0])
        assert np.isclose(eq["run_ess"], 4.0)
        dom = pa.combine_runs([0.0, 20.0])
        assert dom["run_ess"] < 1.01

    def test_weighted_observable(self):
        out = pa.combine_runs([0.0, 0.0], observables=[1.0, 3.0])
        assert np.isclose(out["observable"], 2.0)

    def test_combining_tightens_collapsed_runs(self):
        """K independent small-R runs (heavy family collapse) combined
        with Z-weights must estimate ln Z at least as well as the median
        single run, and family diversity adds across runs."""
        prob = _small_problem()
        beta_end = 2.5
        temps = pa.beta_linear(beta_end, 40, beta_start=0.0)
        K, r = 8, 256
        lzs, fams, states_list = [], [], []
        for k in range(K):
            states = sa.random_state(jax.random.key(100 + k), prob.nspins,
                                     batch=(r,))
            out, lz, stats = pa.sample(
                prob, temps, states, jax.random.key(200 + k), mcsteps=1,
                beta0=0.0, collect_stats=True,
            )
            lzs.append(float(lz))
            fams.append(stats["families"])
            states_list.append(out)
        exact = _exact_log_z(prob, beta_end) - pa.uniform_log_z(prob.nspins)
        comb = pa.combine_runs(lzs)
        err_comb = abs(comb["log_z"] - exact)
        err_med = np.median([abs(l - exact) for l in lzs])
        assert err_comb <= err_med + 0.02, (err_comb, err_med)
        merged, run_of = pa.merge_populations(
            states_list, lzs, jax.random.key(300)
        )
        assert merged.shape == (r, prob.nspins)
        # the merged population draws from multiple runs whenever no
        # single run dominates the Z-weights
        if comb["run_ess"] > 1.5:
            assert np.unique(np.asarray(run_of)).size > 1


class TestQuantumPA:
    """pa.sample_piqmc (VERDICT r4 #3c): the kinetic reweighting must
    track the EXACT extended-ensemble free energy along a transverse-
    field schedule (enumeration over all 2^(N*P) path configurations)."""

    def _tiny(self):
        rows = np.array([0, 1, 2])
        cols = np.array([1, 2, 0])
        vals = np.array([1.0, -0.7, 0.5])
        return IsingProblem.from_edges(3, rows, cols, vals, maxnb=2)

    def _exact_ext_log_z(self, prob, gamma, temp, slices):
        from montecarlosolvers_tpu import schedules

        n = prob.nspins
        tot = n * slices
        teff = temp * slices
        jp = float(schedules.jperp(jnp.float32(gamma), teff))
        states = (((np.arange(2 ** tot)[:, None] >> np.arange(tot)) & 1)
                  * 2 - 1).astype(np.float32).reshape(-1, slices, n)
        sts = jnp.asarray(states)
        e = np.asarray(jnp.sum(prob.energy(sts), axis=-1), dtype=np.float64)
        kin = np.asarray(
            jnp.sum(sts * jnp.roll(sts, -1, axis=-2), axis=(-1, -2)),
            dtype=np.float64,
        )
        e_ext = e - jp * kin
        m = (-e_ext / teff).max()
        return float(m + np.log(np.exp(-e_ext / teff - m).sum()))

    def test_log_z_matches_exact_extended_enumeration(self):
        from montecarlosolvers_tpu.solvers import qmc

        prob = self._tiny()
        P, temp = 3, 0.6
        g_hi, g_lo = 2.0, 0.6
        r = 4096
        key = jax.random.key(30)
        confs = jnp.where(
            jax.random.bernoulli(key, 0.5, (r, P, prob.nspins)), 1.0, -1.0
        )
        # equilibrate the population at Gamma_hi first (gamma0 default)
        a_burn = jnp.full((60,), g_hi, jnp.float32)
        confs = qmc.anneal(prob, a_burn, jnp.ones_like(a_burn), temp,
                           confs, jax.random.key(31))
        gammas = jnp.linspace(g_hi, g_lo, 50)
        out, log_z = pa.sample_piqmc(
            prob, gammas, temp, confs, jax.random.key(32), mcsteps=2,
        )
        exact = (self._exact_ext_log_z(prob, g_lo, temp, P)
                 - self._exact_ext_log_z(prob, g_hi, temp, P))
        assert abs(float(log_z) - exact) < 0.05, (float(log_z), exact)

    def test_split_engine_and_stats(self, rng):
        """Lattice problems route through the split PIQMC engine; the
        anneal must reach the (brute-force) ground state and report
        sane diagnostics."""
        prob, _ = instances.random_2d_lattice(4, rng=rng)
        e_gs, _ = brute_force_ground(prob)
        P, temp = 4, 0.25
        r = 64
        key = jax.random.key(33)
        confs = jnp.where(
            jax.random.bernoulli(key, 0.5, (r, P, prob.nspins)), 1.0, -1.0
        )
        gammas = jnp.linspace(2.5, 1e-4, 120)
        out, log_z, stats = pa.sample_piqmc(
            prob, gammas, temp, confs, jax.random.key(34), mcsteps=1,
            global_moves=True, collect_stats=True,
        )
        assert out.shape == (r, P, prob.nspins)
        from montecarlosolvers_tpu.solvers import qmc

        e_min = float(np.asarray(qmc.best_slice_energy(prob, out)).min())
        assert np.isclose(e_min, e_gs, atol=1e-3), (e_min, e_gs)
        assert 1 <= stats["families"] <= r
        assert stats["ess"].shape == (120,)

    def test_adaptive_quantum_log_z_matches_exact(self):
        """sample_piqmc_adaptive: the ESS-targeted Gamma grid must
        traverse [G_hi, G_lo] exactly and keep the extended-ensemble
        ln Z estimator enumeration-unbiased."""
        from montecarlosolvers_tpu.solvers import qmc

        prob = self._tiny()
        P, temp = 3, 0.6
        g_hi, g_lo = 2.0, 0.6
        r = 4096
        key = jax.random.key(40)
        confs = jnp.where(
            jax.random.bernoulli(key, 0.5, (r, P, prob.nspins)), 1.0, -1.0
        )
        a_burn = jnp.full((60,), g_hi, jnp.float32)
        confs = qmc.anneal(prob, a_burn, jnp.ones_like(a_burn), temp,
                           confs, jax.random.key(41))
        out, log_z, stats = pa.sample_piqmc_adaptive(
            prob, g_hi, g_lo, temp, confs, jax.random.key(42),
            target_frac=0.9, mcsteps=2, max_steps=200,
        )
        assert stats["reached"]
        assert np.all(np.diff(stats["jps"]) >= 0)
        assert np.all(stats["ess"][:-1] >= 0.9 * r * 0.97)
        exact = (self._exact_ext_log_z(prob, g_lo, temp, P)
                 - self._exact_ext_log_z(prob, g_hi, temp, P))
        assert abs(float(log_z) - exact) < 0.05, (float(log_z), exact)

    def test_adaptive_quantum_rejects_wrong_direction(self):
        prob = self._tiny()
        confs = jnp.ones((8, 3, prob.nspins))
        with np.testing.assert_raises(ValueError):
            pa.sample_piqmc_adaptive(prob, 0.5, 2.0, 0.6, confs,
                                     jax.random.key(0))
