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


def oracle_qmc(lat, a_sched, b_sched, temp, confs, seed, global_moves):
    """Replay _qmc_split_kernel's update in plain JAX on the quarters."""
    sl = split.build_split(lat)
    xe, xo, ye, yo = split.pack_qmc(sl, confs)
    chains, Q, nh = xe.shape
    slices = 2 * Q
    teff = temp * slices
    K = sl.K
    wa, ha = sl.w_ab[:, 0], sl.h_ab[0]
    wb, hb = sl.w_ab[:, 1], sl.h_ab[1]
    flat = jnp.arange(nh, dtype=jnp.int32)
    qid = jnp.arange(Q, dtype=jnp.int32)
    chain = jnp.arange(chains, dtype=jnp.int32)
    seed32 = jnp.int32(seed)

    def ctr(t, idx):
        return (
            seed32 * jnp.int32(2654435761 - (1 << 32))
            + jnp.int32(t) * jnp.int32(40503)
            + jnp.int32(idx) * jnp.int32(1013904223)
        )

    def u_quarter(t, idx):
        uid = (
            chain[:, None, None] * jnp.int32(4 * Q * nh)
            + jnp.int32(idx * Q * nh)
            + qid[None, :, None] * jnp.int32(nh)
            + flat[None, None, :]
        )
        return _uniform01(ctr(t, idx), uid)

    def u_line(t, color):
        uid = (
            chain[:, None] * jnp.int32(2 * nh) + jnp.int32(color * nh)
            + flat[None, :]
        )
        return _uniform01(ctr(t, 4 + color), uid)

    def accept(de, u):
        return (de <= 0.0) | (-teff * jnp.log1p(-u) > de)

    for t, (gamma, bcur) in enumerate(
        zip(np.asarray(a_sched, np.float32), np.asarray(b_sched, np.float32))
    ):
        gamma = jnp.float32(gamma)
        jp = -(teff / 2.0) * jnp.log(jnp.tanh(gamma / teff))
        bc = -2.0 * jnp.float32(bcur)

        def upd(s, o, w, h, tr, idx):
            de = bc * s * (split._spatial_field(w, o, K) + h) \
                + 2.0 * s * jp * tr
            return jnp.where(accept(de, u_quarter(t, idx)), -s, s)

        xe = upd(xe, ye, wa, ha, yo + jnp.roll(yo, 1, axis=-2), 0)
        xo = upd(xo, yo, wb, hb, ye + jnp.roll(ye, -1, axis=-2), 1)
        ye = upd(ye, xe, wb, hb, xo + jnp.roll(xo, 1, axis=-2), 2)
        yo = upd(yo, xo, wa, ha, xe + jnp.roll(xe, -1, axis=-2), 3)

        if global_moves:
            de = bc * (
                jnp.sum(xe * (split._spatial_field(wa, ye, K) + ha), axis=-2)
                + jnp.sum(yo * (split._spatial_field(wa, xo, K) + ha),
                          axis=-2)
            )
            m = jnp.where(accept(de, u_line(t, 0)), -1.0, 1.0)[..., None, :]
            xe = xe * m
            yo = yo * m
            de = bc * (
                jnp.sum(ye * (split._spatial_field(wb, xe, K) + hb), axis=-2)
                + jnp.sum(xo * (split._spatial_field(wb, yo, K) + hb),
                          axis=-2)
            )
            m = jnp.where(accept(de, u_line(t, 1)), -1.0, 1.0)[..., None, :]
            ye = ye * m
            xo = xo * m
    return split.unpack_qmc(sl, xe, xo, ye, yo)


class TestQmcSplit:
    @pytest.mark.parametrize(
        "lat_fn,L,P,gm",
        [
            (lambda: periodic_lattice(16, 1), 16, 4, True),
            (lambda: instances.random_2d_lattice(16, rng=0, lattice=True)[0],
             16, 4, False),
            (lambda: instances.random_2d_lattice(32, rng=2, lattice=True)[0],
             32, 6, True),  # R2=4 seams + odd Q trotter ring
        ],
    )
    def test_bitwise_vs_oracle(self, lat_fn, L, P, gm):
        lat = lat_fn()
        rng = np.random.default_rng(0)
        confs = rng.choice([-1.0, 1.0], size=(2, P, L * L)).astype(np.float32)
        a = np.linspace(2.5, 1e-8, 12).astype(np.float32)
        b = np.ones_like(a)
        out = pallas_split.anneal_lattice_qmc_split(
            lat, a, b, 1.0 / P, confs, seed=9, global_moves=gm,
            interpret=True
        )
        ref = oracle_qmc(lat, a, b, 1.0 / P, confs, seed=9, global_moves=gm)
        assert np.array_equal(np.asarray(out), np.asarray(ref))

    def test_ferromagnet_orders(self):
        L, P = 16, 4
        lat = LatticeProblem.from_planes(-np.ones((L, L)), -np.ones((L, L)))
        rng = np.random.default_rng(1)
        confs = rng.choice([-1.0, 1.0], size=(2, P, L * L)).astype(np.float32)
        a = np.linspace(3.0, 1e-8, 150).astype(np.float32)
        out = pallas_split.anneal_lattice_qmc_split(
            lat, a, np.ones_like(a), 1.0 / P, confs, seed=5,
            global_moves=True, interpret=True
        )
        es = np.asarray(
            jax.vmap(jax.vmap(lat.energy))(jnp.asarray(out))
        )
        assert es.min() == -2.0 * L * L


def oracle_qmc_bath(lat, a_sched, b_sched, temp, lut, confs, seed,
                    global_moves):
    """Replay _qmc_bath_split_kernel's update in plain JAX on the per-slice
    halves (slice-sequential, half A then B, counter-hash uniforms)."""
    from montecarlosolvers_tpu.ops.piqmc import bath_matrix

    sl = split.build_split(lat)
    a, b = split.pack_classical(sl, confs)
    chains, slices, nh = a.shape
    teff = temp * slices
    K = sl.K
    wa, ha = sl.w_ab[:, 0], sl.h_ab[0]
    wb, hb = sl.w_ab[:, 1], sl.h_ab[1]
    m = bath_matrix(lut, slices)
    flat = jnp.arange(nh, dtype=jnp.int32)[None, :]
    chain = jnp.arange(chains, dtype=jnp.int32)[:, None]
    seed32 = jnp.int32(seed)

    def uniforms(t, idx):
        ctr = (
            seed32 * jnp.int32(2654435761 - (1 << 32))
            + jnp.int32(t) * jnp.int32(40503)
            + jnp.int32(idx) * jnp.int32(1013904223)
        )
        uid = chain * jnp.int32(2 * nh) + jnp.int32((idx % 2) * nh) + flat
        return _uniform01(ctr, uid)

    def accept(de, u):
        return (de <= 0.0) | (-teff * jnp.log1p(-u) > de)

    for t, (gamma, bcur) in enumerate(
        zip(np.asarray(a_sched, np.float32), np.asarray(b_sched, np.float32))
    ):
        gamma = jnp.float32(gamma)
        jp = -(teff / 2.0) * jnp.log(jnp.tanh(gamma / teff))
        bc = -2.0 * jnp.float32(bcur)
        for k in range(slices):
            up, dn = (k - 1) % slices, (k + 1) % slices
            bath_a = jnp.einsum("p,cpn->cn", m[k], a)
            bath_b = jnp.einsum("p,cpn->cn", m[k], b)
            a_k, b_k = a[:, k], b[:, k]
            de = (
                bc * a_k * (split._spatial_field(wa, b_k, K) + ha)
                + 2.0 * a_k * jp * (a[:, up] + a[:, dn])
                + 2.0 * teff * a_k * bath_a
            )
            a_k = jnp.where(accept(de, uniforms(t, 2 * k)), -a_k, a_k)
            a = a.at[:, k].set(a_k)
            de = (
                bc * b_k * (split._spatial_field(wb, a_k, K) + hb)
                + 2.0 * b_k * jp * (b[:, up] + b[:, dn])
                + 2.0 * teff * b_k * bath_b
            )
            b_k = jnp.where(accept(de, uniforms(t, 2 * k + 1)), -b_k, b_k)
            b = b.at[:, k].set(b_k)
        if global_moves:
            de = bc * jnp.sum(
                a * (split._spatial_field(wa, b, K) + ha), axis=-2
            )
            mfl = jnp.where(
                accept(de, uniforms(t, 2 * slices)), -1.0, 1.0
            )[:, None, :]
            a = a * mfl
            de = bc * jnp.sum(
                b * (split._spatial_field(wb, a, K) + hb), axis=-2
            )
            mfl = jnp.where(
                accept(de, uniforms(t, 2 * slices + 1)), -1.0, 1.0
            )[:, None, :]
            b = b * mfl
    return split.unpack_classical(sl, a, b)


class TestQmcBathSplit:
    @pytest.mark.parametrize(
        "lat_fn,L,P,gm",
        [
            (lambda: periodic_lattice(16, 1), 16, 4, False),
            (lambda: instances.random_2d_lattice(16, rng=0, lattice=True)[0],
             16, 3, True),   # odd P is fine here (no quarter layout)
            (lambda: instances.random_2d_lattice(32, rng=2, lattice=True)[0],
             32, 4, True),   # R2=4 seams
        ],
    )
    def test_bitwise_vs_oracle(self, lat_fn, L, P, gm):
        lat = lat_fn()
        rng = np.random.default_rng(0)
        confs = rng.choice([-1.0, 1.0], size=(2, P, L * L)).astype(np.float32)
        a = np.linspace(2.5, 1e-8, 10).astype(np.float32)
        b = np.ones_like(a)
        lut = schedules.bath_lookuptable(P, 0.05)
        out = pallas_split.anneal_lattice_qmc_bath_split(
            lat, a, b, 1.0 / P, lut, confs, seed=9, global_moves=gm,
            interpret=True
        )
        ref = oracle_qmc_bath(lat, a, b, 1.0 / P, lut, confs, seed=9,
                              global_moves=gm)
        assert np.array_equal(np.asarray(out), np.asarray(ref))

    def test_zero_bath_matches_physics_of_ferromagnet(self):
        # lut = 0: pure PIQMC; the ferromagnet must order
        L, P = 16, 4
        lat = LatticeProblem.from_planes(-np.ones((L, L)), -np.ones((L, L)))
        rng = np.random.default_rng(1)
        confs = rng.choice([-1.0, 1.0], size=(2, P, L * L)).astype(np.float32)
        a = np.linspace(3.0, 1e-8, 150).astype(np.float32)
        lut = np.zeros(P - 1, np.float32)
        out = pallas_split.anneal_lattice_qmc_bath_split(
            lat, a, np.ones_like(a), 1.0 / P, lut, confs, seed=5,
            global_moves=True, interpret=True
        )
        es = np.asarray(jax.vmap(jax.vmap(lat.energy))(jnp.asarray(out)))
        assert es.min() == -2.0 * L * L

    def test_hw_rng_path_valid(self):
        lat = periodic_lattice(16, 5)
        P = 4
        rng = np.random.default_rng(2)
        confs = rng.choice([-1.0, 1.0], size=(2, P, 256)).astype(np.float32)
        a = np.linspace(2.0, 1e-8, 12).astype(np.float32)
        lut = schedules.bath_lookuptable(P, 1e-2)
        out = pallas_split.anneal_lattice_qmc_bath_split(
            lat, a, np.ones_like(a), 1.0 / P, lut, confs, seed=1,
            interpret=True, hw_rng=True
        )
        assert out.shape == (2, P, 256)
        assert set(np.unique(np.asarray(out))) <= {-1.0, 1.0}


def oracle_svmc(lat, a_sched, b_sched, temp, theta, seed, tf):
    """Replay _svmc_split_kernel's update in plain JAX on the halves."""
    sl = split.build_split(lat)
    a, b = split.pack_classical(sl, theta)
    chains, nh = a.shape
    K = sl.K
    pi = jnp.float32(np.pi)
    flat = jnp.arange(nh, dtype=jnp.int32)[None, :]
    chain = jnp.arange(chains, dtype=jnp.int32)[:, None]
    seed32 = jnp.int32(seed)

    def uniforms(t, idx):
        ctr = (
            seed32 * jnp.int32(2654435761 - (1 << 32))
            + jnp.int32(t) * jnp.int32(40503)
            + jnp.int32(idx) * jnp.int32(1013904223)
        )
        uid = chain * jnp.int32(2 * nh) + jnp.int32((idx % 2) * nh) + flat
        return _uniform01(ctr, uid)

    for t, (ac, bc) in enumerate(
        zip(np.asarray(a_sched, np.float32), np.asarray(b_sched, np.float32))
    ):
        ac = jnp.float32(ac)
        bc = jnp.float32(bc)
        width = jnp.minimum(ac / bc, 1.0)

        def phase(th, other, w, h, idx):
            u_p = uniforms(t, idx)
            if tf:
                prop = jnp.clip(th + width * (2.0 * pi * u_p - pi), 0.0, pi)
            else:
                prop = pi * u_p
            zf = split._spatial_field(w, jnp.cos(other), K) + h
            de = bc * (jnp.cos(prop) - jnp.cos(th)) * zf \
                + ac * (jnp.sin(th) - jnp.sin(prop))
            u = uniforms(t, idx + 2)
            acc = (de <= 0.0) | (-temp * jnp.log1p(-u) > de)
            return jnp.where(acc, prop, th)

        a = phase(a, b, sl.w_ab[:, 0], sl.h_ab[0], 0)
        b = phase(b, a, sl.w_ab[:, 1], sl.h_ab[1], 1)
    return split.unpack_classical(sl, a, b)


class TestSvmcSplit:
    @pytest.mark.parametrize(
        "lat_fn,L,tf",
        [
            (lambda: periodic_lattice(16, 1), 16, False),
            (lambda: periodic_lattice(16, 1), 16, True),
            (lambda: instances.random_2d_lattice(32, rng=2, lattice=True)[0],
             32, True),  # R2=4 seams
        ],
    )
    def test_bitwise_vs_oracle(self, lat_fn, L, tf):
        lat = lat_fn()
        rng = np.random.default_rng(0)
        theta = (rng.random((2, L * L)) * np.pi).astype(np.float32)
        a = np.linspace(2.5, 1e-8, 16).astype(np.float32)
        b = np.ones_like(a)
        out = pallas_split.anneal_lattice_svmc_split(
            lat, a, b, 0.05, theta, seed=13, tf=tf, interpret=True
        )
        ref = oracle_svmc(lat, a, b, 0.05, theta, seed=13, tf=tf)
        # angles are continuous: the interpreter's fused/associated f32
        # ops differ from the oracle's at the 1-ulp level (max ~5e-7
        # observed), so exact equality is too strict — but any diverged
        # accept DECISION would produce O(1) differences and fail this.
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=2e-5, rtol=0
        )
        assert np.asarray(out).min() >= 0.0
        assert np.asarray(out).max() <= np.pi

    def test_ferromagnet_orders(self):
        from montecarlosolvers_tpu.ops.svmc_ops import z_projection

        L = 16
        lat = LatticeProblem.from_planes(-np.ones((L, L)), -np.ones((L, L)))
        rng = np.random.default_rng(1)
        theta = (rng.random((2, L * L)) * np.pi).astype(np.float32)
        a = np.linspace(2.0, 1e-8, 200).astype(np.float32)
        out = pallas_split.anneal_lattice_svmc_split(
            lat, a, np.ones_like(a), 0.02, theta, seed=3, tf=True,
            interpret=True
        )
        es = np.asarray(lat.energy(z_projection(jnp.asarray(out))))
        # rotors order more slowly than Ising spins: a few domain walls
        # can survive 200 sweeps; random states sit near 0 energy, so
        # 85% of the ground energy is unambiguous ordering.
        assert es.min() <= -0.85 * 2.0 * L * L
