"""Fused Pallas SVMC kernel (TPU-semantics interpreter): range invariants,
ground-state quality, TF proposals, determinism."""

import numpy as np
import jax
import jax.numpy as jnp

from montecarlosolvers_tpu.models import instances
from montecarlosolvers_tpu.ops.pallas_svmc import anneal_lattice_svmc
from montecarlosolvers_tpu.solvers import svmc
from montecarlosolvers_tpu import schedules
from tests.test_sa import brute_force_ground


class TestKernel:
    def test_range_and_determinism(self, rng):
        lat, _ = instances.random_2d_lattice(4, rng=rng, lattice=True)
        key = jax.random.key(0)
        th = svmc.random_state(key, 16, batch=(4,))
        a = schedules.linear(2.0, 1e-8, 50)
        b = jnp.ones_like(a)
        for tf in (False, True):
            x = anneal_lattice_svmc(lat, a, b, 0.1, th, seed=2, tf=tf,
                                    interpret=True)
            y = anneal_lattice_svmc(lat, a, b, 0.1, th, seed=2, tf=tf,
                                    interpret=True)
            z = anneal_lattice_svmc(lat, a, b, 0.1, th, seed=3, tf=tf,
                                    interpret=True)
            o = np.asarray(x)
            assert o.min() >= 0.0 and o.max() <= np.pi + 1e-6
            assert np.array_equal(o, np.asarray(y))
            assert not np.array_equal(o, np.asarray(z))

    def test_reaches_ground_state(self, rng):
        lat, _ = instances.random_2d_lattice(4, rng=rng, lattice=True)
        e_gs, _ = brute_force_ground(lat.to_generic())
        key = jax.random.key(1)
        th = svmc.random_state(key, 16, batch=(16,))
        a = schedules.linear(3.0, 1e-8, 300)
        out = anneal_lattice_svmc(lat, a, jnp.ones_like(a), 0.05, th, seed=5,
                                  tf=True, interpret=True)
        s = svmc.z_projection(out)
        es = np.asarray(lat.energy(s))
        assert es.min() <= e_gs + 0.05 * abs(e_gs), (es.min(), e_gs)

    def test_quality_parity_with_xla_path(self, rng):
        lat, _ = instances.random_2d_lattice(4, rng=rng, lattice=True)
        key = jax.random.key(2)
        th = svmc.random_state(key, 16, batch=(16,))
        a = schedules.linear(2.5, 1e-8, 150)
        b = jnp.ones_like(a)
        out_p = anneal_lattice_svmc(lat, a, b, 0.1, th, seed=7, interpret=True)
        out_x = svmc.anneal(lat, a, b, 0.1, th, key)
        e_p = np.asarray(lat.energy(svmc.z_projection(out_p))).mean()
        e_x = np.asarray(lat.energy(svmc.z_projection(out_x))).mean()
        assert abs(e_p - e_x) < 3.0, (e_p, e_x)
