"""Split-layout fused Pallas SA kernel tests (TPU-semantics interpreter).

The load-bearing check is a pure-JAX oracle that replays the kernel's
exact semantics — ops/split._spatial_field fields on the packed halves,
the same counter-hash uniforms, the same log-form Metropolis rule — and
must match BITWISE. That pins the in-kernel flat-roll geometry
(_flat_roll seam handling, wrap slots) to the validated XLA split
engine's stencil.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from montecarlosolvers_tpu.models import instances
from montecarlosolvers_tpu.models.lattice import LatticeProblem
from montecarlosolvers_tpu.ops import pallas_split, split
from montecarlosolvers_tpu.ops.pallas_sa import _uniform01
from montecarlosolvers_tpu.solvers import sa
from montecarlosolvers_tpu import schedules


def periodic_lattice(L, rng):
    r = np.random.default_rng(rng)
    return LatticeProblem.from_planes(
        r.normal(size=(L, L)), r.normal(size=(L, L))
    )


def oracle_anneal(lat, sched, spins, seed):
    """Replay _split_kernel's update in plain JAX on the flat halves."""
    sl = split.build_split(lat)
    a, b = split.pack_classical(sl, spins)
    chains, nh = a.shape
    K = sl.K
    flat = jnp.arange(nh, dtype=jnp.int32)[None, :]
    chain_ids = jnp.arange(chains, dtype=jnp.int32)[:, None]
    seed32 = jnp.int32(seed)

    def uniforms(t, color):
        ctr = (
            seed32 * jnp.int32(2654435761 - (1 << 32))
            + jnp.int32(t) * jnp.int32(40503)
            + jnp.int32(color) * jnp.int32(1013904223)
        )
        uid = chain_ids * jnp.int32(2 * nh) + jnp.int32(color * nh) + flat
        return _uniform01(ctr, uid)

    for t, temp in enumerate(np.asarray(sched, np.float32)):
        f = split._spatial_field(sl.w_ab[:, 0], b, K) + sl.h_ab[0]
        de = -2.0 * a * f
        u = uniforms(t, 0)
        acc = (de <= 0.0) | (-temp * jnp.log1p(-u) > de)
        a = jnp.where(acc, -a, a)
        f = split._spatial_field(sl.w_ab[:, 1], a, K) + sl.h_ab[1]
        de = -2.0 * b * f
        u = uniforms(t, 1)
        acc = (de <= 0.0) | (-temp * jnp.log1p(-u) > de)
        b = jnp.where(acc, -b, b)
    return split.unpack_classical(sl, a, b)


class TestOracle:
    @pytest.mark.parametrize(
        "lat_fn,L",
        [
            (lambda: instances.random_2d_lattice(16, rng=0, lattice=True)[0],
             16),  # open: 5 slots, R2=1 degenerate flat rolls
            (lambda: periodic_lattice(16, 1), 16),  # 7 slots, R2=1
            (lambda: instances.random_2d_lattice(32, rng=2, lattice=True)[0],
             32),  # R2=4: seam columns + sublane carry live
            (lambda: periodic_lattice(32, 3), 32),  # R2=4 + wrap slots
        ],
    )
    def test_bitwise_vs_oracle(self, lat_fn, L):
        lat = lat_fn()
        key = jax.random.key(0)
        s0 = sa.random_state(key, L * L, batch=(2,))
        sched = schedules.linear(3.0, 0.1, 24)
        out = pallas_split.anneal_lattice_split(
            lat, sched, s0, seed=11, interpret=True
        )
        ref = oracle_anneal(lat, sched, s0, seed=11)
        assert np.array_equal(np.asarray(out), np.asarray(ref))

    def test_deterministic_and_valid(self):
        lat = periodic_lattice(16, 4)
        s0 = sa.random_state(jax.random.key(1), 256, batch=(4,))
        sched = schedules.linear(2.0, 0.0, 30)
        x = pallas_split.anneal_lattice_split(lat, sched, s0, seed=3,
                                              interpret=True)
        y = pallas_split.anneal_lattice_split(lat, sched, s0, seed=3,
                                              interpret=True)
        z = pallas_split.anneal_lattice_split(lat, sched, s0, seed=4,
                                              interpret=True)
        assert set(np.unique(np.asarray(x))) <= {-1.0, 1.0}
        assert np.array_equal(np.asarray(x), np.asarray(y))
        assert not np.array_equal(np.asarray(x), np.asarray(z))

    def test_ferromagnet_ground_state(self):
        # J = -1 everywhere (H = sum J s s): aligned ground state,
        # E = -nbonds = -2 L^2 on the periodic lattice.
        L = 16
        lat = LatticeProblem.from_planes(
            -np.ones((L, L)), -np.ones((L, L))
        )
        s0 = sa.random_state(jax.random.key(2), L * L, batch=(4,))
        out = pallas_split.anneal_lattice_split(
            lat, schedules.linear(3.0, 0.0, 200), s0, seed=7, interpret=True
        )
        es = np.asarray(lat.energy(out))
        assert es.min() == -2.0 * L * L

    def test_hw_rng_path_valid(self):
        # interpreter stubs the on-chip PRNG; just exercise the code path
        lat = periodic_lattice(16, 5)
        s0 = sa.random_state(jax.random.key(3), 256, batch=(2,))
        out = pallas_split.anneal_lattice_split(
            lat, schedules.linear(2.0, 0.0, 20), s0, seed=1,
            interpret=True, hw_rng=True
        )
        assert out.shape == (2, 256)
        assert set(np.unique(np.asarray(out))) <= {-1.0, 1.0}

    def test_rejects_bad_shapes(self):
        lat, _ = instances.random_2d_lattice(8, rng=0, lattice=True)
        s0 = sa.random_state(jax.random.key(0), 64, batch=(2,))
        with pytest.raises(ValueError, match="split fused"):
            pallas_split.anneal_lattice_split(
                lat, schedules.linear(1.0, 0.0, 4), s0, seed=0,
                interpret=True
            )
