"""Color-packed maskless engine tests (ops/packed.py): layout roundtrips,
energy identity, exact-Gibbs sampling, and solver dispatch on arbitrary
graphs."""

import numpy as np
import jax
import jax.numpy as jnp

from montecarlosolvers_tpu.models import instances
from montecarlosolvers_tpu.models.ising import IsingProblem
from montecarlosolvers_tpu.ops import packed as pk
from montecarlosolvers_tpu.solvers import sa
from montecarlosolvers_tpu import schedules
from tests.test_sa import brute_force_ground


def _graph(rng, n=10, m=18):
    prob, _ = instances.random_graph(n, m, rng=rng, with_fields=True)
    return prob


class TestLayout:
    def test_supports(self, rng):
        assert pk.supports_packed(_graph(rng))
        lat, _ = instances.random_2d_lattice(4, rng=rng, lattice=True)
        assert not pk.supports_packed(lat)  # lattice has its own engine

    def test_blocks_are_independent_sets(self, rng):
        prob = _graph(rng)
        pg = pk.build_packed(prob)
        nbr = np.asarray(pg.nbr_idx)
        for k in range(len(pg.starts) - 1):
            lo, hi = pg.starts[k], pg.starts[k + 1]
            # no neighbor of a block row lands inside the same block
            # (except the self-padding slots)
            for i in range(lo, hi):
                for j, tgt in enumerate(nbr[i]):
                    if tgt == i:
                        continue  # padding
                    assert not (lo <= tgt < hi), (k, i, tgt)

    def test_pack_unpack_roundtrip(self, rng):
        prob = _graph(rng)
        pg = pk.build_packed(prob)
        s = sa.random_state(jax.random.key(0), prob.nspins, batch=(3,))
        out = pk.unpack_state(pg, pk.pack_state(pg, s))
        assert np.array_equal(np.asarray(out), np.asarray(s))

    def test_packed_energy_matches(self, rng):
        prob = _graph(rng)
        pg = pk.build_packed(prob)
        s = sa.random_state(jax.random.key(1), prob.nspins, batch=(4,))
        e = pk.packed_energy(pg, pk.pack_state(pg, s))
        assert np.allclose(np.asarray(e), np.asarray(prob.energy(s)), atol=1e-4)


class TestPhysics:
    def test_sweep_energy_nonincreasing_at_zero_temp(self, rng):
        prob = _graph(rng)
        pg = pk.build_packed(prob)
        s = pk.pack_state(pg, sa.random_state(jax.random.key(2), prob.nspins))
        key = jax.random.key(3)
        e_prev = float(pk.packed_energy(pg, s))
        for _ in range(5):
            key, k = jax.random.split(key)
            s = pk.packed_sweep(pg, s, k, 1e-9)
            e = float(pk.packed_energy(pg, s))
            assert e <= e_prev + 1e-4
            e_prev = e

    def test_sweep_samples_gibbs(self):
        """Packed block phases must sample the exact Boltzmann measure of
        an irregular 4-spin graph (16 states; needs >2 colors to exercise
        multi-block updates)."""
        rows = [0, 0, 0, 1, 2, 0, 2]
        cols = [1, 2, 3, 2, 3, 0, 2]
        vals = [0.8, -0.5, 0.3, 0.7, -0.9, 0.2, -0.4]
        prob = IsingProblem.from_edges(4, rows, cols, vals, maxnb=4)
        assert prob.num_colors >= 3
        pg = pk.build_packed(prob)
        temp = 1.1

        states = []
        for bits in range(16):
            states.append(
                np.array([(bits >> i) & 1 for i in range(4)]) * 2.0 - 1.0
            )
        states = jnp.asarray(np.stack(states, dtype=np.float32))
        es = np.asarray(prob.energy(states))
        w = np.exp(-es / temp)
        p_exact = w / w.sum()

        chains, nsweeps, burn = 64, 1500, 200
        s0 = pk.pack_state(
            pg, sa.random_state(jax.random.key(4), 4, batch=(chains,))
        )
        inv = jnp.asarray(np.argsort(np.asarray(pg.perm)))
        weights = jnp.asarray([1, 2, 4, 8])

        @jax.jit
        def run(s, key):
            keys = jax.random.split(key, nsweeps)

            def body(s, k):
                s = pk.packed_sweep(pg, s, k, temp)
                orig = jnp.take(s, inv, axis=-1)
                return s, (orig > 0).astype(jnp.int32) @ weights

            _, idxs = jax.lax.scan(body, s, keys)
            return idxs

        idxs = np.asarray(run(s0, jax.random.key(5)))[burn:]
        counts = np.bincount(idxs.ravel(), minlength=16)
        p_emp = counts / counts.sum()
        assert np.max(np.abs(p_emp - p_exact)) < 0.01, (p_emp, p_exact)


class TestDispatch:
    def test_sa_anneal_ground_state_on_chimera(self, rng):
        prob, _ = instances.chimera_graph(2, 2, t=2, rng=1)
        e_gs, _ = brute_force_ground(prob)
        key = jax.random.key(6)
        s0 = sa.random_state(key, prob.nspins, batch=(16,))
        out = sa.anneal(prob, schedules.linear(3.0, 0.0, 400), s0, key)
        es = np.asarray(prob.energy(out))
        assert np.isclose(es.min(), e_gs, atol=1e-3), (es.min(), e_gs)
        assert set(np.unique(np.asarray(out))) <= {-1.0, 1.0}

    def test_sa_anneal_collect_energy(self, rng):
        prob = _graph(rng)
        key = jax.random.key(7)
        s0 = sa.random_state(key, prob.nspins, batch=(2,))
        out, es = sa.anneal(
            prob, schedules.linear(2.0, 0.1, 30), s0, key, collect_energy=True
        )
        assert es.shape == (30, 2)
        assert np.allclose(
            np.asarray(es[-1]), np.asarray(prob.energy(out)), atol=1e-4
        )

    def test_deterministic_given_key(self, rng):
        prob = _graph(rng)
        key = jax.random.key(8)
        s0 = sa.random_state(key, prob.nspins, batch=(2,))
        sched = schedules.linear(2.0, 0.1, 25)
        assert np.array_equal(
            np.asarray(sa.anneal(prob, sched, s0, key)),
            np.asarray(sa.anneal(prob, sched, s0, key)),
        )


class TestPackedSVMC:
    def test_svmc_rotor_gibbs_two_spins(self):
        """Packed SVMC phases must sample the continuous rotor Gibbs
        density (quadrature oracle, same setup as test_svmc's)."""
        from montecarlosolvers_tpu.ops import svmc_ops

        J, h0, h1, A, B, temp = 0.8, 0.3, -0.4, 0.6, 1.0, 0.7
        prob = IsingProblem.from_edges(
            2, [0, 0, 1], [1, 0, 1], [J, h0, h1], maxnb=2
        )
        pg = pk.build_packed(prob)

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

        chains, nsweeps, burn = 256, 600, 150
        from montecarlosolvers_tpu.solvers import svmc

        th0 = pk.pack_state(
            pg, svmc.random_state(jax.random.key(0), 2, batch=(chains,))
        )
        inv = jnp.asarray(np.argsort(np.asarray(pg.perm)))

        @jax.jit
        def run(th, key):
            keys = jax.random.split(key, nsweeps)

            def body(th, k):
                th = pk.packed_svmc_sweep(pg, th, k, temp, A, B)
                o = jnp.take(th, inv, axis=-1)
                e = (
                    B * (J * jnp.cos(o[:, 0]) * jnp.cos(o[:, 1])
                         + h0 * jnp.cos(o[:, 0]) + h1 * jnp.cos(o[:, 1]))
                    - A * (jnp.sin(o[:, 0]) + jnp.sin(o[:, 1]))
                )
                return th, e

            _, es = jax.lax.scan(body, th, keys)
            return es

        es = np.asarray(run(th0, jax.random.key(1)))[burn:]
        assert abs(es.mean() - e_exact) < 0.03, (es.mean(), e_exact)

    def test_svmc_solver_dispatch_ground_state(self, rng):
        from montecarlosolvers_tpu.solvers import svmc

        prob = _graph(rng, n=12, m=20)
        e_gs, _ = brute_force_ground(prob)
        key = jax.random.key(9)
        th = svmc.random_state(key, prob.nspins, batch=(32,))
        a = schedules.linear(2.5, 1e-8, 600)
        out = svmc.anneal(prob, a, jnp.ones_like(a), 0.05, th, key, tf=True)
        es = np.asarray(prob.energy(svmc.z_projection(out)))
        assert np.isclose(es.min(), e_gs, atol=1e-3), (es.min(), e_gs)

    def test_noisy_packed_finds_ground_state(self, rng):
        """anneal_noisy dispatches to the packed engine; with constant
        tables it must behave like a plain anneal."""
        prob = _graph(rng, n=12, m=20)
        e_gs, _ = brute_force_ground(prob)
        steps = 400
        jt = jnp.broadcast_to(prob.nbr_J, (steps,) + prob.nbr_J.shape)
        ht = jnp.broadcast_to(prob.h, (steps,) + prob.h.shape)
        key = jax.random.key(10)
        s0 = sa.random_state(key, prob.nspins, batch=(16,))
        out = sa.anneal_noisy(
            prob, schedules.linear(3.0, 0.0, steps), jt, ht, s0, key
        )
        es = np.asarray(prob.energy(out))
        assert np.isclose(es.min(), e_gs, atol=1e-3), (es.min(), e_gs)


class TestDispatchEngaged:
    """The engines consume RNG differently, so bitwise equality with the
    packed scan holds ONLY when the packed path really ran — these would
    have caught the dead-dispatch regression (packed unreachable inside a
    jitted solver entry point)."""

    def test_sa_dispatch_bitwise_matches_packed_engine(self, rng):
        prob = _graph(rng)
        key = jax.random.key(11)
        s0 = sa.random_state(key, prob.nspins, batch=(2,))
        sched = schedules.linear(2.0, 0.1, 20)
        via_solver = sa.anneal(prob, sched, s0, key)
        direct, _ = pk.packed_sweep_scan(prob, s0, key, sched)
        assert np.array_equal(np.asarray(via_solver), np.asarray(direct))

    def test_svmc_dispatch_bitwise_matches_packed_engine(self, rng):
        from montecarlosolvers_tpu.solvers import svmc

        prob = _graph(rng)
        key = jax.random.key(12)
        th = svmc.random_state(key, prob.nspins, batch=(2,))
        a = schedules.linear(2.0, 1e-8, 20)
        via_solver = svmc.anneal(prob, a, jnp.ones_like(a), 0.1, th, key)
        direct, _ = pk.packed_svmc_scan(
            prob, a, jnp.ones_like(a), 0.1, th, key
        )
        assert np.array_equal(np.asarray(via_solver), np.asarray(direct))

    def test_noisy_dispatch_bitwise_matches_packed_engine(self, rng):
        prob = _graph(rng)
        steps = 15
        jt = jnp.broadcast_to(prob.nbr_J, (steps,) + prob.nbr_J.shape)
        ht = jnp.broadcast_to(prob.h, (steps,) + prob.h.shape)
        key = jax.random.key(13)
        s0 = sa.random_state(key, prob.nspins, batch=(2,))
        sched = schedules.linear(2.0, 0.1, steps)
        via_solver = sa.anneal_noisy(prob, sched, jt, ht, s0, key)
        direct = pk.packed_noisy_scan(prob, sched, jt, ht, s0, key)
        assert np.array_equal(np.asarray(via_solver), np.asarray(direct))

    def test_many_color_graphs_fall_back(self):
        """Complete-ish graphs exceed MAX_PACKED_COLORS and must take the
        masked fori engine (program size stays O(1) in colors)."""
        n = 12
        rows, cols = np.triu_indices(n, k=1)
        vals = np.random.default_rng(0).normal(size=rows.shape)
        prob = IsingProblem.from_edges(n, rows, cols, vals, maxnb=n - 1)
        assert prob.num_colors > pk.MAX_PACKED_COLORS
        assert not pk.supports_packed(prob)
        # and the solver still works through the fallback
        key = jax.random.key(14)
        s0 = sa.random_state(key, n, batch=(4,))
        out = sa.anneal(prob, schedules.linear(2.0, 0.1, 50), s0, key)
        assert set(np.unique(np.asarray(out))) <= {-1.0, 1.0}

    def test_wolff_on_lattice_problem(self, rng):
        """anneal_wolff must accept LatticeProblem via to_ising conversion
        (README lists piqmc_wolff next to a lattice=True quickstart)."""
        from montecarlosolvers_tpu.solvers import qmc
        from montecarlosolvers_tpu.solvers.api import solve

        lat, _ = instances.random_2d_lattice(4, rng=rng, lattice=True)
        e_gs, _ = brute_force_ground(lat)
        res = solve(lat, method="piqmc_wolff", num_reads=8, sweeps=300,
                    seed=2, slices=6)
        assert res.best_energy <= e_gs + 0.1 * abs(e_gs)
