"""Compat layer: the reference's exact API surface must work as advertised
— reference-format neighbor tables, in-place mutation, (N, P) confs layout."""

import numpy as np
import jax.numpy as jnp
import pytest

from montecarlosolvers_tpu import compat
from montecarlosolvers_tpu.models import instances


@pytest.fixture
def small(rng):
    prob, (rows, cols, vals) = instances.random_2d_lattice(4, rng=rng)
    J = instances.dense_matrix(16, rows, cols, vals)
    nbs = compat.GenerateNeighbors(16, J, 4)
    return nbs, J


class TestTools:
    def test_generate_neighbors_format(self, small):
        nbs, J = small
        assert nbs.shape == (16, 4, 2)

    def test_classical_ising_energy(self, small, rng):
        nbs, J = small
        s = rng.choice([-1.0, 1.0], size=16)
        e = compat.ClassicalIsingEnergy(s, J)
        assert np.isfinite(e)

    def test_bits_spins(self):
        assert list(np.asarray(compat.bits2spins(jnp.array([0, 1])))) == [1, -1]


class TestSA:
    def test_anneal_in_place(self, small, rng):
        nbs, J = small
        svec = rng.choice([-1, 1], size=16).astype(np.float64)
        before = svec.copy()
        sched = np.linspace(3.0, 0.0, 200)
        compat.Anneal(sched, 1, svec, nbs, seed=0)
        assert not np.array_equal(svec, before)
        assert set(np.unique(svec)) <= {-1.0, 1.0}
        e_before = compat.ClassicalIsingEnergy(before, J)
        e_after = compat.ClassicalIsingEnergy(svec, J)
        assert e_after < e_before

    def test_aliases(self, small, rng):
        nbs, _ = small
        sched = np.linspace(2.0, 0.1, 30)
        for fn in (compat.AnnealMA, compat.Anneal_parallel):
            svec = rng.choice([-1, 1], size=16).astype(np.float64)
            fn(sched, 1, svec, nbs, seed=1)
            assert set(np.unique(svec)) <= {-1.0, 1.0}

    def test_noisy_anneal(self, small, rng):
        nbs, _ = small
        steps = 20
        nbs4d = np.broadcast_to(nbs, (steps,) + nbs.shape).copy()
        svec = rng.choice([-1, 1], size=16).astype(np.float64)
        compat.NoisyAnneal(np.linspace(2.0, 0.1, steps), 1, svec, nbs4d, seed=2)
        assert set(np.unique(svec)) <= {-1.0, 1.0}


class TestQMC:
    def test_quantum_anneal_layout_and_inplace(self, small, rng):
        nbs, J = small
        P = 6
        confs = np.tile(rng.choice([-1, 1], size=16), (P, 1)).T.astype(np.float64)
        assert confs.shape == (16, P)  # reference layout (qmc.pyx:69)
        A = np.linspace(2.5, 1e-8, 60)
        B = np.ones_like(A)
        compat.QuantumAnnealGlobal(A, B, 1, 1.0 / P, confs, nbs, seed=3)
        assert confs.shape == (16, P)
        assert set(np.unique(confs)) <= {-1.0, 1.0}
        # best-slice readout as the reference driver does (:290-296)
        best = min(compat.ClassicalIsingEnergy(confs[:, k], J) for k in range(P))
        assert np.isfinite(best)

    def test_all_qmc_variants_run(self, small, rng):
        nbs, _ = small
        P = 4
        A = np.linspace(2.0, 1e-8, 8)
        B = np.ones_like(A)
        lut = np.asarray(
            0.01 * (np.pi / (P * np.sin(np.pi * np.arange(1, P) / P))) ** 2
        )
        variants = [
            lambda c: compat.QuantumAnneal(A, B, 1, 0.25, c, nbs, seed=4),
            lambda c: compat.DissipativeQuantumAnneal(A, B, 1, 0.25, lut, c, nbs, seed=4),
            lambda c: compat.DissipativeQuantumAnnealGlobal(A, B, 1, 0.25, lut, c, nbs, seed=4),
            lambda c: compat.QuantumAnnealWCL(A, B, 1, 0.25, c, nbs, seed=4),
            lambda c: compat.DissaptiveQuantumAnnealWCL(A, B, 1, 0.25, lut, c, nbs, seed=4),
            lambda c: compat.QuantumAnnealWC(A, B, 1, 0.25, c, nbs, seed=4),
            lambda c: compat.DissipativeQuantumAnnealWC2(A, B, 1, 0.25, lut, c, nbs, seed=4),
            lambda c: compat.DissipativeQuantumAnnealWC3(A, B, 1, 0.25, lut, c, nbs, seed=4),
        ]
        for fn in variants:
            confs = np.tile(rng.choice([-1, 1], size=16), (P, 1)).T.astype(np.float64)
            fn(confs)
            assert set(np.unique(confs)) <= {-1.0, 1.0}, fn


class TestSVMC:
    def test_svmc_variants(self, small, rng):
        nbs, _ = small
        A = np.linspace(2.0, 1e-8, 30)
        B = np.ones_like(A)
        for fn in (compat.SpinVectorMonteCarlo, compat.SpinVectorMonteCarloTF):
            svec = rng.uniform(0, np.pi, size=16)
            fn(A, B, 1, 0.1, svec, nbs, seed=5)
            assert svec.min() >= 0 and svec.max() <= np.pi + 1e-6

    def test_compact_batched(self, small, rng):
        nbs, _ = small
        A = np.linspace(2.0, 1e-8, 20)
        B = np.ones_like(A)
        svec = rng.uniform(0, np.pi, size=(5, 16))
        compat.SpinVectorMonteCarloTFCompact(A, B, 1, 0.1, svec, nbs, seed=6)
        assert svec.shape == (5, 16)
        assert svec.min() >= 0 and svec.max() <= np.pi + 1e-6

    def test_noisy_svmc(self, small, rng):
        nbs, _ = small
        steps = 15
        nbs4d = np.broadcast_to(nbs, (steps,) + nbs.shape).copy()
        A = np.linspace(2.0, 1e-8, steps)
        svec = rng.uniform(0, np.pi, size=16)
        compat.NoisySVMCTF(A, np.ones_like(A), 1, 0.1, svec, nbs4d, seed=7)
        assert svec.min() >= 0 and svec.max() <= np.pi + 1e-6


class TestDeterminism:
    def test_same_seed_reproduces(self, small, rng):
        nbs, _ = small
        # hot fixed-T schedule: different streams cannot coincide
        sched = np.full(30, 2.5)
        base = rng.choice([-1, 1], size=16).astype(np.float64)
        a = base.copy(); compat.Anneal(sched, 1, a, nbs, seed=11)
        b = base.copy(); compat.Anneal(sched, 1, b, nbs, seed=11)
        c = base.copy(); compat.Anneal(sched, 1, c, nbs, seed=12)
        assert np.array_equal(a, b)
        assert not np.array_equal(a, c)

    def test_rng_object_accepted(self, small, rng):
        nbs, _ = small
        sched = np.linspace(2.0, 0.1, 20)
        svec = rng.choice([-1, 1], size=16).astype(np.float64)
        compat.Anneal(sched, 1, svec, nbs, seed=np.random.RandomState(3))
        compat.Anneal(sched, 1, svec, nbs, seed=np.random.default_rng(3))
        assert set(np.unique(svec)) <= {-1.0, 1.0}
