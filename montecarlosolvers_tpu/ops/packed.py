"""Color-packed maskless sweep engine for arbitrary graphs.

`colored_metropolis_sweep` (ops/metropolis.py) computes the full
local-field tensor and evaluates the acceptance transcendentals for every
site in every color phase, then masks out the inactive colors — for a
greedy-colored sparse graph (chimera: 3 classes, random graphs: up to
maxdeg+1) that throws away (c-1)/c of the gather, FMA, and accept work.
This module permutes the state class-major ONCE per anneal so each phase
updates one contiguous block with no masks: per-sweep field/accept work
drops from c*N to N (the reference pays the same N via its sequential
visit order, sa.pyx:81-99 — this is the parallel layout that matches it).

The lattice analog is ops/split.py (which also kills the gathers via roll
stencils); this engine is the fast path for IsingProblem graphs that have
no lattice structure. The masked engine remains as the oracle and the
traced-problem fallback.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from montecarlosolvers_tpu.ops.metropolis import metropolis_accept


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PackedGraph:
    """Class-major permutation of an IsingProblem.

    nbr_idx / nbr_J: (N, maxnb) neighbor tables with BOTH rows and index
      targets remapped into packed order (padding self-slots stay
      self-referential with J = 0).
    h: (N,) fields in packed order.
    perm: packed position i holds original site perm[i] (static).
    starts: class block boundaries (c+1 entries, static); block k =
      packed[starts[k]:starts[k+1]] is one independent set.
    """

    nbr_idx: jax.Array
    nbr_J: jax.Array
    h: jax.Array
    perm: tuple = dataclasses.field(metadata=dict(static=True))
    starts: tuple = dataclasses.field(metadata=dict(static=True))


def supports_packed(problem):
    """True for concrete (non-traced) IsingProblem-style padded-gather
    problems with a usable coloring."""
    from montecarlosolvers_tpu.models.ising import IsingProblem

    return (
        type(problem) is IsingProblem
        and not isinstance(problem.nbr_idx, jax.core.Tracer)
    )


def build_packed(problem):
    colors = np.argmax(np.asarray(problem.color_masks), axis=0)  # (N,)
    perm = np.argsort(colors, kind="stable")
    inv = np.argsort(perm)
    nbr_idx = inv[np.asarray(problem.nbr_idx)[perm]]
    counts = np.bincount(colors, minlength=problem.num_colors)
    starts = np.concatenate([[0], np.cumsum(counts)])
    return PackedGraph(
        nbr_idx=jnp.asarray(nbr_idx, jnp.int32),
        nbr_J=jnp.asarray(np.asarray(problem.nbr_J)[perm], jnp.float32),
        h=jnp.asarray(np.asarray(problem.h)[perm], jnp.float32),
        perm=tuple(perm.tolist()),
        starts=tuple(int(x) for x in starts),
    )


def pack_state(pg, spins):
    return jnp.take(spins, jnp.asarray(pg.perm), axis=-1)


def unpack_state(pg, spins):
    inv = jnp.asarray(np.argsort(np.asarray(pg.perm)))
    return jnp.take(spins, inv, axis=-1)


def packed_energy(pg, spins):
    """Classical energy in packed space: each bond appears in both
    endpoints' field rows, hence the half factor on the coupling part."""
    nb = jnp.take(spins, pg.nbr_idx, axis=-1)
    coupling_field = jnp.sum(pg.nbr_J * nb, axis=-1)
    return (
        0.5 * jnp.sum(spins * coupling_field, axis=-1)
        + jnp.sum(pg.h * spins, axis=-1)
    )


def packed_sweep(pg, spins, key, temp, b_coeff=-2.0):
    """One full maskless Metropolis sweep over the class blocks.
    spins: (..., N) in PACKED order."""
    u = jax.random.uniform(key, spins.shape)
    for k in range(len(pg.starts) - 1):
        lo, hi = pg.starts[k], pg.starts[k + 1]
        if lo == hi:
            continue
        s_blk = spins[..., lo:hi]
        nb = jnp.take(spins, pg.nbr_idx[lo:hi], axis=-1)  # (..., nk, maxnb)
        field = jnp.sum(pg.nbr_J[lo:hi] * nb, axis=-1) + pg.h[lo:hi]
        de = b_coeff * s_blk * field
        acc = metropolis_accept(de, temp, u[..., lo:hi])
        spins = spins.at[..., lo:hi].set(jnp.where(acc, -s_blk, s_blk))
    return spins


def packed_svmc_sweep(pg, theta, key, temp, a_coeff, b_coeff, tf=False):
    """One maskless SVMC sweep over the class blocks (rotor dE per
    svmc.pyx:96-110). theta: (..., N) angles in PACKED order."""
    from montecarlosolvers_tpu.ops import svmc_ops

    ku, ka = jax.random.split(key)
    u_prop = jax.random.uniform(ku, theta.shape)
    u_acc = jax.random.uniform(ka, theta.shape)
    for k in range(len(pg.starts) - 1):
        lo, hi = pg.starts[k], pg.starts[k + 1]
        if lo == hi:
            continue
        th_blk = theta[..., lo:hi]
        up = u_prop[..., lo:hi]
        prop = (
            svmc_ops.propose_tf(th_blk, up, a_coeff, b_coeff)
            if tf else svmc_ops.propose_uniform(up)
        )
        cos_all = jnp.cos(theta)
        nb = jnp.take(cos_all, pg.nbr_idx[lo:hi], axis=-1)
        zfield = jnp.sum(pg.nbr_J[lo:hi] * nb, axis=-1) + pg.h[lo:hi]
        de = b_coeff * (jnp.cos(prop) - jnp.cos(th_blk)) * zfield
        de = de + a_coeff * (jnp.sin(th_blk) - jnp.sin(prop))
        acc = metropolis_accept(de, temp, u_acc[..., lo:hi])
        theta = theta.at[..., lo:hi].set(jnp.where(acc, prop, th_blk))
    return theta


def packed_svmc_scan(problem, a_sched, b_sched, temp, theta, key, tf=False,
                     collect_energy=False):
    """SVMC anneal scan on the packed layout — inner engine for
    solvers.svmc.anneal on concrete IsingProblem graphs."""
    from montecarlosolvers_tpu.ops.svmc_ops import z_projection

    pg = build_packed(problem)
    th = pack_state(pg, theta)
    keys = jax.random.split(key, a_sched.shape[0])

    def body(th, x):
        ac, bc, k = x
        th = packed_svmc_sweep(pg, th, k, temp, ac, bc, tf=tf)
        e = packed_energy(pg, z_projection(th)) if collect_energy else None
        return th, e

    th, es = jax.lax.scan(body, th, (a_sched, b_sched, keys))
    return unpack_state(pg, th), es


def packed_noisy_sweep(pg, nbr_J_t, h_t, spins, key, temp):
    """Maskless sweep with per-step coupling tables in PACKED row order
    (NoisyAnneal semantics, sa.pyx:291-378). The graph structure (and so
    pg.nbr_idx) is fixed; only the values vary per step."""
    u = jax.random.uniform(key, spins.shape)
    for k in range(len(pg.starts) - 1):
        lo, hi = pg.starts[k], pg.starts[k + 1]
        if lo == hi:
            continue
        s_blk = spins[..., lo:hi]
        nb = jnp.take(spins, pg.nbr_idx[lo:hi], axis=-1)
        field = jnp.sum(nbr_J_t[lo:hi] * nb, axis=-1) + h_t[lo:hi]
        de = -2.0 * s_blk * field
        acc = metropolis_accept(de, temp, u[..., lo:hi])
        spins = spins.at[..., lo:hi].set(jnp.where(acc, -s_blk, s_blk))
    return spins


def packed_noisy_scan(problem, temps, nbr_J_sched, h_sched, spins, key):
    """Noisy anneal scan on the packed layout: the coupling tables are
    row-permuted once outside the scan."""
    pg = build_packed(problem)
    perm = jnp.asarray(pg.perm)
    jt = jnp.take(jnp.asarray(nbr_J_sched), perm, axis=1)
    ht = jnp.take(jnp.asarray(h_sched), perm, axis=1)
    s = pack_state(pg, spins)
    keys = jax.random.split(key, temps.shape[0])

    def body(s, x):
        t, j, h, k = x
        return packed_noisy_sweep(pg, j, h, s, k, t), None

    s, _ = jax.lax.scan(body, s, (jnp.asarray(temps), jt, ht, keys))
    return unpack_state(pg, s)


def packed_noisy_svmc_scan(problem, a_sched, b_sched, temp, nbr_J_sched,
                           h_sched, theta, key, tf=False):
    """Noisy SVMC anneal on the packed layout (NoisySVMC/TF,
    svmc.pyx:236-448): per-step tables row-permuted once outside the
    scan."""
    from montecarlosolvers_tpu.ops import svmc_ops

    pg = build_packed(problem)
    perm = jnp.asarray(pg.perm)
    jts = jnp.take(jnp.asarray(nbr_J_sched), perm, axis=1)
    hts = jnp.take(jnp.asarray(h_sched), perm, axis=1)
    th = pack_state(pg, theta)
    keys = jax.random.split(key, a_sched.shape[0])

    def sweep(th, jt, ht, k, ac, bc):
        ku, ka = jax.random.split(k)
        u_prop = jax.random.uniform(ku, th.shape)
        u_acc = jax.random.uniform(ka, th.shape)
        for i in range(len(pg.starts) - 1):
            lo, hi = pg.starts[i], pg.starts[i + 1]
            if lo == hi:
                continue
            blk = th[..., lo:hi]
            up = u_prop[..., lo:hi]
            prop = (
                svmc_ops.propose_tf(blk, up, ac, bc)
                if tf else svmc_ops.propose_uniform(up)
            )
            nb = jnp.take(jnp.cos(th), pg.nbr_idx[lo:hi], axis=-1)
            zf = jnp.sum(jt[lo:hi] * nb, axis=-1) + ht[lo:hi]
            de = bc * (jnp.cos(prop) - jnp.cos(blk)) * zf
            de = de + ac * (jnp.sin(blk) - jnp.sin(prop))
            acc = metropolis_accept(de, temp, u_acc[..., lo:hi])
            th = th.at[..., lo:hi].set(jnp.where(acc, prop, blk))
        return th

    def body(th, x):
        ac, bc, jt, ht, k = x
        return sweep(th, jt, ht, k, ac, bc), None

    th, _ = jax.lax.scan(
        body, th, (jnp.asarray(a_sched), jnp.asarray(b_sched), jts, hts, keys)
    )
    return unpack_state(pg, th)


def packed_sweep_scan(problem, spins, key, temps, collect_energy=False):
    """Anneal scan on the packed layout — drop-in inner engine for
    solvers.sa.anneal on concrete IsingProblem graphs."""
    pg = build_packed(problem)
    s = pack_state(pg, spins)
    temps = jnp.asarray(temps)
    keys = jax.random.split(key, temps.shape[0])

    def body(s, x):
        t, k = x
        s = packed_sweep(pg, s, k, t)
        e = packed_energy(pg, s) if collect_energy else None
        return s, e

    s, es = jax.lax.scan(body, s, (temps, keys))
    return unpack_state(pg, s), es
