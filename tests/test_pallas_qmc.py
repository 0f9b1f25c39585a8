"""Fused Pallas PIQMC kernel (TPU-semantics interpreter): extended-Gibbs
exactness, MST-quality annealing vs the XLA path, determinism."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from montecarlosolvers_tpu.models import instances
from montecarlosolvers_tpu.models.lattice import LatticeProblem
from montecarlosolvers_tpu.ops.pallas_qmc import anneal_lattice_qmc
from montecarlosolvers_tpu.solvers import sa, qmc
from montecarlosolvers_tpu import schedules
from tests.test_sa import brute_force_ground
from tests.test_qmc import extended_energy


class TestKernel:
    def test_valid_and_deterministic(self, rng):
        lat, _ = instances.random_2d_lattice(4, rng=rng, lattice=True)
        key = jax.random.key(0)
        confs = qmc.replicate(sa.random_state(key, 16, batch=(2,)), 4)
        a = schedules.transverse_field(2.0, 1e-8, 30)
        b = jnp.ones_like(a)
        x = anneal_lattice_qmc(lat, a, b, 0.25, confs, seed=3, interpret=True)
        y = anneal_lattice_qmc(lat, a, b, 0.25, confs, seed=3, interpret=True)
        z = anneal_lattice_qmc(lat, a, b, 0.25, confs, seed=4, interpret=True)
        assert set(np.unique(np.asarray(x))) <= {-1.0, 1.0}
        assert np.array_equal(np.asarray(x), np.asarray(y))
        assert not np.array_equal(np.asarray(x), np.asarray(z))

    def test_finds_ground_state(self, rng):
        lat, _ = instances.random_2d_lattice(4, rng=rng, lattice=True)
        e_gs, _ = brute_force_ground(lat.to_generic())
        key = jax.random.key(1)
        s0 = sa.random_state(key, 16, batch=(8,))
        confs = qmc.replicate(s0, 8)
        a = schedules.transverse_field(3.0, 1e-8, 250)
        out = anneal_lattice_qmc(
            lat, a, jnp.ones_like(a), 1.0 / 8, confs, seed=5, interpret=True
        )
        best = np.asarray(
            jax.vmap(lambda c: lat.energy(c))(out.reshape(-1, 16))
        ).min()
        assert np.isclose(best, e_gs, atol=1e-3), (best, e_gs)

    def test_extended_gibbs(self, rng):
        """Fixed (Gamma, T): the kernel must sample the extended-Hamiltonian
        Boltzmann distribution (2x2 lattice with one bond, P=2 -> enumerable
        via energies over chains)."""
        L, P = 2, 2
        jrp = np.zeros((L, L)); jrp[0, 0] = 0.9
        jdp = np.zeros((L, L)); jdp[0, 0] = 0.5; jdp[0, 1] = -0.7
        lat = LatticeProblem.from_planes(jrp, jdp)
        gen = lat.to_generic()
        temp, gamma = 0.8, 0.7
        teff = temp * P

        states = []
        for bits in range(2 ** (L * L * P)):
            s = np.array([(bits >> q) & 1 for q in range(L * L * P)]) * 2 - 1
            states.append(s.reshape(P, L * L).astype(np.float32))
        states = jnp.asarray(np.stack(states))
        es = np.asarray(extended_energy(gen, states, temp, gamma))
        w = np.exp(-es / teff)
        p_exact = w / w.sum()

        chains, nsteps = 512, 150
        key = jax.random.key(2)
        confs = jnp.where(
            jax.random.bernoulli(key, 0.5, (chains, P, L * L)), 1.0, -1.0
        )
        a = jnp.full((nsteps,), gamma)
        b = jnp.ones_like(a)
        out = anneal_lattice_qmc(
            lat, a, b, temp, confs, seed=11, global_moves=False,
            interpret=True, chain_block=64,
        )
        bits = (np.asarray(out).reshape(chains, -1) > 0).astype(np.int64)
        idx = bits @ (1 << np.arange(L * L * P))
        counts = np.bincount(idx, minlength=2 ** (L * L * P))
        p_emp = counts / counts.sum()
        # 512 converged chains; loose 4-sigma-ish bound per bin
        assert np.max(np.abs(p_emp - p_exact)) < 0.06, (
            p_emp.round(3), p_exact.round(3))

    def test_matches_xla_path_quality(self, rng):
        """Annealing quality parity with solvers.qmc.anneal on the same
        protocol (mean best-slice energy within noise)."""
        lat, _ = instances.random_2d_lattice(4, rng=rng, lattice=True)
        key = jax.random.key(3)
        s0 = sa.random_state(key, 16, batch=(8,))
        confs = qmc.replicate(s0, 8)
        a = schedules.transverse_field(2.5, 1e-8, 120)
        b = jnp.ones_like(a)
        out_p = anneal_lattice_qmc(lat, a, b, 1.0 / 8, confs, seed=7,
                                   interpret=True)
        out_x = qmc.anneal(lat, a, b, 1.0 / 8, confs, key, global_moves=True)
        e_p = np.asarray(qmc.best_slice_energy(lat, out_p)).mean()
        e_x = np.asarray(qmc.best_slice_energy(lat, out_x)).mean()
        assert abs(e_p - e_x) < 3.0, (e_p, e_x)
