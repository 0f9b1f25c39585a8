"""Model-layer exactness tests: neighbor compiler, coloring, energies, dE.

The reference has no test suite (SURVEY.md §4); our strategy is oracle-based:
brute-force dense evaluation on small random instances."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from montecarlosolvers_tpu.models.ising import (
    IsingProblem,
    generate_neighbors,
    build_neighbor_table,
    classical_ising_energy,
    bits2spins,
    spins2bits,
)
from montecarlosolvers_tpu.models.coloring import greedy_coloring, ring_coloring
from montecarlosolvers_tpu.models import instances


def _dense_energy(J, h, s):
    return s @ J @ s / 1.0 + h @ s  # J holds each edge once


def _random_triplets(rng, n, nedges, with_fields=True):
    prob, (rows, cols, vals) = instances.random_graph(
        n, nedges, rng=rng, with_fields=with_fields
    )
    return prob, rows, cols, vals


class TestNeighborTable:
    def test_matches_reference_format(self, rng):
        # 4-cycle with a field on spin 0
        rows = np.array([0, 1, 2, 3, 0])
        cols = np.array([1, 2, 3, 0, 0])
        vals = np.array([1.0, -2.0, 3.0, 0.5, 0.7])
        nbs = build_neighbor_table(4, rows, cols, vals, maxnb=3)
        assert nbs.shape == (4, 3, 2)
        # spin 0: neighbors 1 (1.0), 3 (0.5), field 0.7 on self slot
        row0 = {(int(i), v) for i, v in nbs[0] if v != 0.0}
        assert row0 == {(1, 1.0), (3, 0.5), (0, 0.7)}

    def test_overflow_raises(self):
        rows = np.array([0, 0, 0])
        cols = np.array([1, 2, 3])
        vals = np.ones(3)
        with pytest.raises(ValueError):
            build_neighbor_table(4, rows, cols, vals, maxnb=2)

    def test_generate_neighbors_dense_input(self, rng):
        n = 8
        J = np.zeros((n, n))
        J[0, 1] = 2.0
        J[2, 2] = -1.0
        nbs = generate_neighbors(n, J, maxnb=2)
        assert nbs[1, 0, 0] == 0 and nbs[1, 0, 1] == 2.0
        assert nbs[2, 0, 0] == 2 and nbs[2, 0, 1] == -1.0

    def test_native_matches_python_fallback(self, rng):
        n, ne = 30, 60
        _, rows, cols, vals = _random_triplets(rng, n, ne)
        from montecarlosolvers_tpu.native import neighbor_table_native

        nat = neighbor_table_native(n, rows, cols, vals, 20)
        if nat is None:
            pytest.skip("native lib unavailable")
        # Python fallback (force by calling the internal path)
        import montecarlosolvers_tpu.models.ising as mod

        py = mod.build_neighbor_table.__wrapped__ if hasattr(
            mod.build_neighbor_table, "__wrapped__"
        ) else None
        # fall back: compare element sets row by row against a fresh build
        ref = build_neighbor_table(n, rows, cols, vals, 20)
        for i in range(n):
            assert {(int(a), b) for a, b in nat[i] if b != 0} == {
                (int(a), b) for a, b in ref[i] if b != 0
            }


class TestEnergy:
    def test_energy_matches_dense_oracle(self, rng):
        n, ne = 24, 50
        prob, rows, cols, vals = _random_triplets(rng, n, ne)
        J = instances.dense_matrix(n, rows, cols, vals)
        h = np.diag(J).copy()
        Joff = J - np.diag(h)
        for _ in range(5):
            s = rng.choice([-1.0, 1.0], size=n)
            e_lib = float(prob.energy(jnp.asarray(s, dtype=jnp.float32)))
            e_ref = classical_ising_energy(s, J)
            e_dense = _dense_energy(Joff, h, s)
            assert np.isclose(e_ref, e_dense, atol=1e-9)
            assert np.isclose(e_lib, e_ref, rtol=1e-5, atol=1e-4)

    def test_delta_e_matches_flip_difference(self, rng):
        n, ne = 20, 40
        prob, rows, cols, vals = _random_triplets(rng, n, ne)
        J = instances.dense_matrix(n, rows, cols, vals)
        s = rng.choice([-1.0, 1.0], size=n)
        de = np.asarray(prob.delta_e(jnp.asarray(s, dtype=jnp.float32)))
        for i in range(n):
            s2 = s.copy()
            s2[i] *= -1
            exact = classical_ising_energy(s2, J) - classical_ising_energy(s, J)
            assert np.isclose(de[i], exact, rtol=1e-4, atol=1e-4), i

    def test_batched_energy(self, rng):
        n, ne = 16, 30
        prob, *_ = _random_triplets(rng, n, ne)
        s = rng.choice([-1.0, 1.0], size=(7, n)).astype(np.float32)
        es = prob.energy(jnp.asarray(s))
        assert es.shape == (7,)
        for k in range(7):
            assert np.isclose(
                float(es[k]), float(prob.energy(jnp.asarray(s[k]))), rtol=1e-5
            )


class TestColoring:
    def test_colors_are_independent_sets(self, rng):
        n, ne = 40, 90
        prob, rows, cols, vals = _random_triplets(rng, n, ne, with_fields=False)
        colors = np.argmax(np.asarray(prob.color_masks), axis=0)
        for a, b in zip(rows, cols):
            if a != b:
                assert colors[a] != colors[b]

    def test_lattice_is_two_colorable(self, rng):
        prob, _ = instances.random_2d_lattice(8, rng=rng)
        assert prob.num_colors == 2

    def test_ring_coloring(self):
        for p in (2, 4, 5, 7, 40):
            colors, n = ring_coloring(p)
            assert n == (2 if p % 2 == 0 else 3)
            for k in range(p):
                assert colors[k] != colors[(k + 1) % p]


class TestEA3D:
    def test_edge_count_and_degree(self, rng):
        L = 4
        prob, (rows, cols, vals) = instances.random_3d_lattice(L, rng=rng)
        n = L ** 3
        assert prob.nspins == n
        assert rows.shape[0] == 3 * n  # periodic cubic: 3 bonds per site
        deg = np.zeros(n, dtype=int)
        np.add.at(deg, rows, 1)
        np.add.at(deg, cols, 1)
        assert (deg == 6).all()

    def test_even_L_periodic_is_bipartite(self, rng):
        prob, _ = instances.random_3d_lattice(4, rng=rng)
        assert prob.num_colors == 2

    def test_energy_matches_dense_oracle(self, rng):
        L = 3  # odd L periodic: odd cycles, exercises the >2-color path
        prob, (rows, cols, vals) = instances.random_3d_lattice(
            L, rng=rng, dist="gauss"
        )
        J = instances.dense_matrix(L ** 3, rows, cols, vals)
        s = rng.choice([-1.0, 1.0], size=L ** 3)
        e_lib = float(prob.energy(jnp.asarray(s, dtype=jnp.float32)))
        e_ref = classical_ising_energy(s, J)
        assert np.isclose(e_lib, e_ref, rtol=1e-5, atol=1e-4)
        colors = np.argmax(np.asarray(prob.color_masks), axis=0)
        for a, b in zip(rows, cols):
            assert colors[a] != colors[b]

    def test_open_boundaries(self, rng):
        L = 3
        prob, (rows, cols, _) = instances.random_3d_lattice(
            L, rng=rng, periodic=False
        )
        assert rows.shape[0] == 3 * L ** 2 * (L - 1)
        assert prob.num_colors == 2  # open cubic lattice is bipartite


class TestConversions:
    def test_bits_spins_roundtrip(self):
        bits = jnp.array([0, 1, 1, 0])
        spins = bits2spins(bits)
        assert list(np.asarray(spins)) == [1, -1, -1, 1]
        assert list(np.asarray(spins2bits(spins))) == [0, 1, 1, 0]


class TestNeighborCache:
    def test_savepath_roundtrip(self, rng, tmp_path):
        """tools.pyx:94-95 analog: neighbor tables cache to .npy."""
        from montecarlosolvers_tpu.models.ising import generate_neighbors
        from montecarlosolvers_tpu.utils.checkpoint import load_neighbor_table

        n = 6
        J = np.zeros((n, n))
        J[0, 1] = 1.5
        J[2, 3] = -0.5
        J[4, 4] = 0.25
        path = tmp_path / "nbs.npy"
        nbs = generate_neighbors(n, J, maxnb=2, savepath=str(path))
        cached = load_neighbor_table(str(path))
        assert np.array_equal(np.asarray(nbs), cached)
