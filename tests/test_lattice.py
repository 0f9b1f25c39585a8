"""LatticeProblem fast path: must be numerically identical to the generic
padded-gather IsingProblem and a drop-in for every solver."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from montecarlosolvers_tpu.models import instances
from montecarlosolvers_tpu.models.lattice import LatticeProblem, checkerboard_masks
from montecarlosolvers_tpu.solvers import sa, qmc, svmc
from montecarlosolvers_tpu import schedules
from tests.test_sa import brute_force_ground


@pytest.fixture
def both_problems(rng):
    gen, (rows, cols, vals) = instances.random_2d_lattice(
        6, rng=rng, with_fields=True
    )
    lat = LatticeProblem.from_edges(6, rows, cols, vals)
    return gen, lat


class TestEquivalence:
    def test_local_fields_match_generic(self, both_problems, rng):
        gen, lat = both_problems
        s = jnp.asarray(rng.choice([-1.0, 1.0], size=(3, 36)), dtype=jnp.float32)
        np.testing.assert_allclose(
            np.asarray(lat.local_fields(s)),
            np.asarray(gen.local_fields(s)),
            rtol=1e-5, atol=1e-5,
        )

    def test_energy_and_delta_e_match_generic(self, both_problems, rng):
        gen, lat = both_problems
        s = jnp.asarray(rng.choice([-1.0, 1.0], size=(4, 36)), dtype=jnp.float32)
        np.testing.assert_allclose(
            np.asarray(lat.energy(s)), np.asarray(gen.energy(s)), rtol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(lat.delta_e(s)), np.asarray(gen.delta_e(s)),
            rtol=1e-5, atol=1e-5,
        )

    def test_periodic_wrap_bonds(self, rng):
        L = 4
        # ring in row 0: bond (0,3) wraps
        lat = LatticeProblem.from_edges(
            L, [0, 1, 2, 0], [1, 2, 3, 3], [1.0, 1.0, 1.0, 1.0]
        )
        s = jnp.ones(16, dtype=jnp.float32)
        # E = 4 bonds * 1.0
        assert np.isclose(float(lat.energy(s)), 4.0)

    def test_to_generic_roundtrip(self, both_problems, rng):
        gen, lat = both_problems
        gen2 = lat.to_generic()
        s = jnp.asarray(rng.choice([-1.0, 1.0], size=36), dtype=jnp.float32)
        assert np.isclose(float(gen2.energy(s)), float(lat.energy(s)), rtol=1e-5)

    def test_rejects_non_lattice_edge(self):
        with pytest.raises(ValueError):
            LatticeProblem.from_edges(4, [0], [5], [1.0])  # diagonal bond

    def test_checkerboard(self):
        m = checkerboard_masks(4)
        assert m.shape == (2, 16)
        assert m.sum() == 16
        assert not (m[0] & m[1]).any()


class TestSolversOnLattice:
    def test_sa_finds_ground_state(self, rng):
        lat, _ = instances.random_2d_lattice(4, rng=rng, lattice=True)
        gen = lat.to_generic()
        e_gs, _ = brute_force_ground(gen)
        key = jax.random.key(0)
        s0 = sa.random_state(key, 16, batch=(16,))
        out = sa.anneal(lat, schedules.linear(3.0, 0.0, 300), s0, key)
        es = np.asarray(lat.energy(out))
        assert np.isclose(es.min(), e_gs, atol=1e-3)

    def test_qmc_runs_with_global_moves(self, rng):
        lat, _ = instances.random_2d_lattice(4, rng=rng, lattice=True)
        key = jax.random.key(1)
        confs = qmc.replicate(sa.random_state(key, 16, batch=(2,)), 6)
        a = schedules.transverse_field(2.0, 1e-8, 25)
        out = qmc.anneal(lat, a, jnp.ones_like(a), 1.0 / 6, confs, key,
                         global_moves=True)
        assert set(np.unique(np.asarray(out))) <= {-1.0, 1.0}

    def test_qmc_dissipative_on_lattice(self, rng):
        lat, _ = instances.random_2d_lattice(3, rng=rng, lattice=True)
        key = jax.random.key(2)
        confs = qmc.replicate(sa.random_state(key, 9), 4)
        lut = schedules.bath_lookuptable(4, 1e-2)
        a = schedules.transverse_field(2.0, 1e-8, 10)
        out = qmc.anneal(lat, a, jnp.ones_like(a), 0.25, confs, key,
                         lookuptable=lut)
        assert set(np.unique(np.asarray(out))) <= {-1.0, 1.0}

    def test_svmc_on_lattice(self, rng):
        lat, _ = instances.random_2d_lattice(4, rng=rng, lattice=True)
        key = jax.random.key(3)
        th = svmc.random_state(key, 16, batch=(2,))
        a = schedules.linear(2.0, 1e-8, 30)
        out = svmc.anneal(lat, a, jnp.ones_like(a), 0.1, th, key, tf=True)
        o = np.asarray(out)
        assert o.min() >= 0.0 and o.max() <= np.pi + 1e-6

    def test_trotter_sharded_on_lattice(self, rng):
        if len(jax.devices()) < 8:
            pytest.skip("needs 8 virtual devices")
        from montecarlosolvers_tpu.parallel import make_mesh, trotter

        lat, _ = instances.random_2d_lattice(4, rng=rng, lattice=True)
        mesh = make_mesh(replica=8)
        key = jax.random.key(4)
        confs = qmc.replicate(sa.random_state(key, 16), 16)
        a = schedules.transverse_field(2.0, 1e-8, 10)
        out = trotter.anneal_sharded(
            lat, a, jnp.ones_like(a), 1.0 / 16, confs, key, mesh,
            global_moves=True,
        )
        assert set(np.unique(np.asarray(out))) <= {-1.0, 1.0}


class TestTracedConstruction:
    def test_from_planes_under_jit(self):
        """from_planes must stay traceable (col_wrap falls back to the
        conservative True for tracers, or can be passed explicitly)."""
        import jax

        L = 4
        jr = np.random.default_rng(0).normal(size=(L, L)).astype(np.float32)
        jd = np.random.default_rng(1).normal(size=(L, L)).astype(np.float32)

        @jax.jit
        def energy_of(jr, jd, s):
            prob = LatticeProblem.from_planes(jr, jd)
            return prob.energy(s)

        s = jnp.ones(L * L)
        e_traced = float(energy_of(jr, jd, s))
        e_eager = float(LatticeProblem.from_planes(jr, jd).energy(s))
        assert np.isclose(e_traced, e_eager, atol=1e-4)

        @jax.jit
        def energy_explicit(jr, jd, s):
            prob = LatticeProblem.from_planes(jr, jd, col_wrap=False)
            return prob.energy(s)

        assert np.isclose(float(energy_explicit(jr, jd, s)), e_eager, atol=1e-4)

    def test_to_generic_energy_equivalence(self):
        """LatticeProblem.to_generic must preserve energies (periodic +
        fields) — the conversion anneal_wolff relies on."""
        rng = np.random.default_rng(5)
        lat = LatticeProblem.from_planes(
            rng.normal(size=(4, 4)), rng.normal(size=(4, 4)),
            rng.normal(size=(4, 4)) * 0.2,
        )
        gen = lat.to_generic()
        s = jnp.asarray(rng.choice([-1.0, 1.0], size=(5, 16)).astype(np.float32))
        assert np.allclose(
            np.asarray(lat.energy(s)), np.asarray(gen.energy(s)), atol=1e-4
        )
