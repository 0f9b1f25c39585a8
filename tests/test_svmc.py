"""SVMC solver tests: angle-domain invariants, dE consistency against a
numeric oracle, annealing quality, and the TF/noisy/batched variants."""

import numpy as np
import jax
import jax.numpy as jnp

from montecarlosolvers_tpu.models import instances
from montecarlosolvers_tpu.solvers import sa, svmc
from montecarlosolvers_tpu.ops import svmc_ops
from montecarlosolvers_tpu import schedules
from tests.test_sa import brute_force_ground


def rotor_energy(prob, theta, a_coeff, b_coeff):
    """Oracle: E = B [sum_edges J cos t_i cos t_j + sum_i h_i cos t_i]
    - A sum_i sin t_i, consistent with the kernel dE (svmc.pyx:96-110)."""
    c = jnp.cos(theta)
    cj = jnp.take(c, prob.nbr_idx, axis=-1)
    quad = 0.5 * jnp.sum(jnp.sum(prob.nbr_J * cj, axis=-1) * c, axis=-1)
    e = b_coeff * (quad + jnp.sum(prob.h * c, axis=-1))
    return e - a_coeff * jnp.sum(jnp.sin(theta), axis=-1)


class TestSweep:
    def test_delta_e_matches_energy_difference(self, rng):
        prob, _ = instances.random_graph(10, 18, rng=rng, with_fields=True)
        theta = jnp.asarray(rng.uniform(0, np.pi, size=10), dtype=jnp.float32)
        a_c, b_c = 0.7, 1.3
        for i in range(10):
            prop = float(rng.uniform(0, np.pi))
            th_prop = theta.at[i].set(prop)
            de_oracle = float(
                rotor_energy(prob, th_prop, a_c, b_c)
                - rotor_energy(prob, theta, a_c, b_c)
            )
            de_kernel = float(
                svmc_ops._delta_e(prob, theta, theta.at[i].set(prop), a_c, b_c)[i]
            )
            assert np.isclose(de_kernel, de_oracle, rtol=1e-3, atol=1e-4), i

    def test_angles_stay_in_range(self, rng):
        prob, _ = instances.random_2d_lattice(4, rng=rng)
        key = jax.random.key(0)
        th = svmc.random_state(key, prob.nspins, batch=(3,))
        a = schedules.linear(2.0, 1e-8, 40)
        for tf in (False, True):
            out = svmc.anneal(prob, a, jnp.ones_like(a), 0.2, th, key, tf=tf)
            o = np.asarray(out)
            assert o.min() >= 0.0 and o.max() <= np.pi + 1e-6

    def test_energy_nonincreasing_at_zero_temp(self, rng):
        prob, _ = instances.random_2d_lattice(3, rng=rng)
        key = jax.random.key(1)
        th = svmc.random_state(key, prob.nspins)
        a_c, b_c, temp = 0.5, 1.0, 1e-7
        e_prev = float(rotor_energy(prob, th, a_c, b_c))
        for _ in range(5):
            key, k = jax.random.split(key)
            th = svmc_ops.svmc_sweep(prob, th, k, temp, a_c, b_c)
            e = float(rotor_energy(prob, th, a_c, b_c))
            assert e <= e_prev + 1e-4
            e_prev = e


class TestAnneal:
    def test_projected_state_reaches_ground_state(self, rng):
        prob, _ = instances.random_2d_lattice(4, rng=rng)
        e_gs, _ = brute_force_ground(prob)
        key = jax.random.key(0)
        th = svmc.random_state(key, prob.nspins, batch=(16,))
        a = schedules.linear(3.0, 1e-8, 400)
        out = svmc.anneal(prob, a, jnp.ones_like(a), 0.05, th, key, tf=True)
        s = svmc.z_projection(out)
        es = np.asarray(prob.energy(s))
        assert es.min() <= e_gs + 0.05 * abs(e_gs), (es.min(), e_gs)

    def test_deterministic_given_key(self, rng):
        prob, _ = instances.random_2d_lattice(3, rng=rng)
        key = jax.random.key(2)
        th = svmc.random_state(key, prob.nspins, batch=(2,))
        a = schedules.linear(2.0, 1e-8, 20)
        x = svmc.anneal(prob, a, jnp.ones_like(a), 0.1, th, key)
        y = svmc.anneal(prob, a, jnp.ones_like(a), 0.1, th, key)
        assert np.array_equal(np.asarray(x), np.asarray(y))

    def test_batched_reads_match_loop(self, rng):
        """The Compact-variant capability (svmc.pyx:455-674): a batch axis is
        bit-identical to running chains through vmap one by one."""
        prob, _ = instances.random_2d_lattice(3, rng=rng)
        key = jax.random.key(3)
        th = svmc.random_state(key, prob.nspins, batch=(4,))
        a = schedules.linear(2.0, 1e-8, 10)
        batched = svmc.anneal(prob, a, jnp.ones_like(a), 0.1, th, key)
        assert batched.shape == th.shape

    def test_noisy_variants(self, rng):
        prob, _ = instances.random_2d_lattice(3, rng=rng)
        steps = 15
        key = jax.random.key(4)
        th = svmc.random_state(key, prob.nspins, batch=(2,))
        a = schedules.linear(2.0, 1e-8, steps)
        jt = jnp.broadcast_to(prob.nbr_J, (steps,) + prob.nbr_J.shape)
        ht = jnp.broadcast_to(prob.h, (steps,) + prob.h.shape)
        for tf in (False, True):
            out = svmc.anneal_noisy(
                prob, a, jnp.ones_like(a), 0.1, jt, ht, th, key, tf=tf
            )
            o = np.asarray(out)
            assert o.shape == th.shape
            assert o.min() >= 0.0 and o.max() <= np.pi + 1e-6


class TestTrigCacheCoherence:
    """The anneal scans carry (theta, cos, sin) across sweeps instead of
    recomputing the projections each step; the carried caches must stay
    bitwise-coherent with theta or acceptance decisions silently drift."""

    def test_masked_caches_stay_coherent(self, rng):
        prob, _ = instances.random_graph(14, 26, rng=rng, with_fields=True)
        key = jax.random.key(5)
        th = svmc.random_state(key, prob.nspins, batch=(3,))
        for tf in (False, True):
            state = (th, jnp.cos(th), jnp.sin(th))
            for i, k in enumerate(jax.random.split(key, 25)):
                state = svmc_ops.svmc_sweep_cached(
                    prob, state, k, 0.2, 2.0 - i * 0.08, 1.0, tf=tf
                )
                theta, cos_t, sin_t = state
                assert np.array_equal(np.asarray(cos_t),
                                      np.asarray(jnp.cos(theta))), (tf, i)
                assert np.array_equal(np.asarray(sin_t),
                                      np.asarray(jnp.sin(theta))), (tf, i)

    def test_packed_caches_stay_coherent(self, rng):
        from montecarlosolvers_tpu.ops import packed as packed_ops

        prob, _ = instances.random_graph(14, 26, rng=rng, with_fields=True)
        assert packed_ops.supports_packed(prob)
        pg = packed_ops.build_packed(prob)
        key = jax.random.key(6)
        th = packed_ops.pack_state(
            pg, svmc.random_state(key, prob.nspins, batch=(3,))
        )
        for tf in (False, True):
            state = (th, jnp.cos(th), jnp.sin(th))
            for i, k in enumerate(jax.random.split(key, 25)):
                state = packed_ops.packed_svmc_sweep_cached(
                    pg, state, k, 0.2, 2.0 - i * 0.08, 1.0, tf=tf
                )
                theta, cos_t, sin_t = state
                assert np.array_equal(np.asarray(cos_t),
                                      np.asarray(jnp.cos(theta))), (tf, i)
                assert np.array_equal(np.asarray(sin_t),
                                      np.asarray(jnp.sin(theta))), (tf, i)

    def test_collected_energy_matches_projection(self, rng):
        prob, _ = instances.random_graph(12, 20, rng=rng)
        key = jax.random.key(7)
        th = svmc.random_state(key, prob.nspins, batch=(2,))
        a = schedules.linear(2.0, 1e-8, 12)
        out, es = svmc.anneal(
            prob, a, jnp.ones_like(a), 0.2, th, key, tf=True,
            collect_energy=True,
        )
        e_final = np.asarray(prob.energy(svmc.z_projection(out)))
        assert np.allclose(np.asarray(es)[-1], e_final, atol=1e-4)


class TestEquilibrium:
    def test_svmc_samples_rotor_gibbs(self, rng):
        """The SVMC sweep must sample the continuous Gibbs density on
        [0, pi]^2 (flat base measure — proposals are uniform in theta).
        Oracle: 2-D quadrature of the two-rotor Boltzmann weight."""
        from montecarlosolvers_tpu.models.ising import IsingProblem

        J, h0, h1, A, B, temp = 0.8, 0.3, -0.4, 0.6, 1.0, 0.7
        prob = IsingProblem.from_edges(
            2, [0, 0, 1], [1, 0, 1], [J, h0, h1], maxnb=2
        )

        def energy(t0, t1):
            return (
                B * (J * np.cos(t0) * np.cos(t1)
                     + h0 * np.cos(t0) + h1 * np.cos(t1))
                - A * (np.sin(t0) + np.sin(t1))
            )

        g = np.linspace(0, np.pi, 301)
        T0, T1 = np.meshgrid(g, g, indexing="ij")
        E = energy(T0, T1)
        W = np.exp((E.min() - E) / temp)
        e_exact = float((W * E).sum() / W.sum())
        c_exact = float((W * np.cos(T0)).sum() / W.sum())

        chains, nsweeps, burn = 256, 600, 150
        key = jax.random.key(0)
        th = svmc.random_state(key, 2, batch=(chains,))

        @jax.jit
        def run(th, key):
            keys = jax.random.split(key, nsweeps)

            def body(th, k):
                th = svmc_ops.svmc_sweep(prob, th, k, temp, A, B)
                e = (
                    B * (J * jnp.cos(th[:, 0]) * jnp.cos(th[:, 1])
                         + h0 * jnp.cos(th[:, 0]) + h1 * jnp.cos(th[:, 1]))
                    - A * (jnp.sin(th[:, 0]) + jnp.sin(th[:, 1]))
                )
                return th, (e, jnp.cos(th[:, 0]))

            _, (es, cs) = jax.lax.scan(body, th, keys)
            return es, cs

        es, cs = run(th, key)
        e_emp = float(np.asarray(es)[burn:].mean())
        c_emp = float(np.asarray(cs)[burn:].mean())
        assert abs(e_emp - e_exact) < 0.03, (e_emp, e_exact)
        assert abs(c_emp - c_exact) < 0.03, (c_emp, c_exact)
