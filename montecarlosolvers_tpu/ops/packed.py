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
no lattice structure. The masked engine remains as the oracle, the
traced-problem fallback, and the many-color fallback (its fori color loop
keeps program size O(1); the block loop here is unrolled, so the packed
path is gated to MAX_PACKED_COLORS).

Jit structure: building PackedGraph requires CONCRETE index arrays
(np.argsort over the coloring), so the public scans build it eagerly and
call jitted inner scans — solvers therefore dispatch OUTSIDE jit (the
solver entry points are plain functions whose engine scans are jitted).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from montecarlosolvers_tpu.ops.metropolis import metropolis_accept
from montecarlosolvers_tpu.ops import svmc_ops

# Beyond this many color classes the unrolled per-block loop bloats the
# scan body (O(colors) HLO); the masked engine's fori loop handles those.
MAX_PACKED_COLORS = 8


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
    problems whose coloring is small enough for unrolled block phases.

    NOTE: inside a jit trace the index arrays are tracers and this returns
    False — callers then fall back to the masked engine, which is correct
    but slower. Solvers dispatch eagerly to keep this path live.
    """
    from montecarlosolvers_tpu.models.ising import IsingProblem

    return (
        type(problem) is IsingProblem
        # every leaf must be concrete: disorder sweeps vmap over coupling
        # VALUES with shared topology, leaving nbr_idx concrete but nbr_J
        # traced (tests/test_disorder.py)
        and not any(
            isinstance(x, jax.core.Tracer)
            for x in (problem.nbr_idx, problem.nbr_J, problem.h,
                      problem.color_masks)
        )
        and problem.num_colors <= MAX_PACKED_COLORS
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


def _tables(pg, nbr_J, h):
    return (pg.nbr_J if nbr_J is None else nbr_J,
            pg.h if h is None else h)


def packed_sweep(pg, spins, key, temp, b_coeff=-2.0, nbr_J=None, h=None):
    """One full maskless Metropolis sweep over the class blocks.
    spins: (..., N) in PACKED order. Optional (nbr_J, h) override the
    static tables with per-step values in packed row order (NoisyAnneal
    semantics, sa.pyx:291-378)."""
    nbr_J, h = _tables(pg, nbr_J, h)
    u = jax.random.uniform(key, spins.shape)
    for k in range(len(pg.starts) - 1):
        lo, hi = pg.starts[k], pg.starts[k + 1]
        if lo == hi:
            continue
        s_blk = spins[..., lo:hi]
        nb = jnp.take(spins, pg.nbr_idx[lo:hi], axis=-1)  # (..., nk, maxnb)
        field = jnp.sum(nbr_J[lo:hi] * nb, axis=-1) + h[lo:hi]
        de = b_coeff * s_blk * field
        acc = metropolis_accept(de, temp, u[..., lo:hi])
        spins = spins.at[..., lo:hi].set(jnp.where(acc, -s_blk, s_blk))
    return spins


def packed_svmc_sweep_cached(pg, state, key, temp, a_coeff, b_coeff,
                             tf=False, nbr_J=None, h=None):
    """One maskless SVMC sweep over the class blocks (rotor dE per
    svmc.pyx:96-110) on carried trig caches. state = (theta, cos theta,
    sin theta), all in PACKED order. Carrying the caches across sweeps
    leaves only the proposal's 2 sin/cos per site per sweep (the rotor
    sweep is transcendental-bound on the VPU)."""
    theta, cos_all, sin_all = state
    nbr_J, h = _tables(pg, nbr_J, h)
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
        nb = jnp.take(cos_all, pg.nbr_idx[lo:hi], axis=-1)
        zfield = jnp.sum(nbr_J[lo:hi] * nb, axis=-1) + h[lo:hi]
        cos_prop = jnp.cos(prop)
        sin_prop = jnp.sin(prop)
        de = b_coeff * (cos_prop - cos_all[..., lo:hi]) * zfield
        de = de + a_coeff * (sin_all[..., lo:hi] - sin_prop)
        acc = metropolis_accept(de, temp, u_acc[..., lo:hi])
        theta = theta.at[..., lo:hi].set(jnp.where(acc, prop, th_blk))
        cos_all = cos_all.at[..., lo:hi].set(
            jnp.where(acc, cos_prop, cos_all[..., lo:hi])
        )
        sin_all = sin_all.at[..., lo:hi].set(
            jnp.where(acc, sin_prop, sin_all[..., lo:hi])
        )
    return theta, cos_all, sin_all


def packed_svmc_sweep(pg, theta, key, temp, a_coeff, b_coeff, tf=False,
                      nbr_J=None, h=None):
    """Single-sweep convenience form of packed_svmc_sweep_cached (builds
    and drops the trig caches; use the cached form inside scans)."""
    theta, _, _ = packed_svmc_sweep_cached(
        pg, (theta, jnp.cos(theta), jnp.sin(theta)), key, temp,
        a_coeff, b_coeff, tf=tf, nbr_J=nbr_J, h=h,
    )
    return theta


# ------------------------------------------------------------ jitted scans
#
# build_packed needs concrete arrays; the scans below take the prebuilt
# PackedGraph (a pytree with static perm/starts) and are jitted.


@partial(jax.jit, static_argnames=("collect_energy",))
def _sa_scan(pg, spins, key, temps, collect_energy=False):
    s = pack_state(pg, spins)
    keys = jax.random.split(key, temps.shape[0])

    def body(s, x):
        t, k = x
        s = packed_sweep(pg, s, k, t)
        e = packed_energy(pg, s) if collect_energy else None
        return s, e

    s, es = jax.lax.scan(body, s, (temps, keys))
    return unpack_state(pg, s), es


@jax.jit
def _noisy_scan(pg, temps, nbr_J_sched, h_sched, spins, key):
    perm = jnp.asarray(pg.perm)
    jts = jnp.take(nbr_J_sched, perm, axis=1)
    hts = jnp.take(h_sched, perm, axis=1)
    s = pack_state(pg, spins)
    keys = jax.random.split(key, temps.shape[0])

    def body(s, x):
        t, j, h, k = x
        return packed_sweep(pg, s, k, t, nbr_J=j, h=h), None

    s, _ = jax.lax.scan(body, s, (temps, jts, hts, keys))
    return unpack_state(pg, s)


@partial(jax.jit, static_argnames=("tf", "collect_energy"))
def _svmc_scan(pg, a_sched, b_sched, temp, theta, key, tf=False,
               collect_energy=False):
    from montecarlosolvers_tpu.ops.svmc_ops import z_projection

    th = pack_state(pg, theta)
    keys = jax.random.split(key, a_sched.shape[0])

    def body(state, x):
        ac, bc, k = x
        state = packed_svmc_sweep_cached(pg, state, k, temp, ac, bc, tf=tf)
        e = (
            packed_energy(pg, svmc_ops.z_projection_from_cos(state[1]))
            if collect_energy else None
        )
        return state, e

    state0 = (th, jnp.cos(th), jnp.sin(th))
    (th, _, _), es = jax.lax.scan(body, state0, (a_sched, b_sched, keys))
    return unpack_state(pg, th), es


@partial(jax.jit, static_argnames=("tf",))
def _noisy_svmc_scan(pg, a_sched, b_sched, temp, nbr_J_sched, h_sched,
                     theta, key, tf=False):
    perm = jnp.asarray(pg.perm)
    jts = jnp.take(nbr_J_sched, perm, axis=1)
    hts = jnp.take(h_sched, perm, axis=1)
    th = pack_state(pg, theta)
    keys = jax.random.split(key, a_sched.shape[0])

    def body(state, x):
        ac, bc, j, h, k = x
        state = packed_svmc_sweep_cached(
            pg, state, k, temp, ac, bc, tf=tf, nbr_J=j, h=h
        )
        return state, None

    state0 = (th, jnp.cos(th), jnp.sin(th))
    (th, _, _), _ = jax.lax.scan(body, state0, (a_sched, b_sched, jts, hts, keys))
    return unpack_state(pg, th)


# -------------------------------------------------------- public entry points


def packed_sweep_scan(problem, spins, key, temps, collect_energy=False):
    """Anneal scan on the packed layout — inner engine for
    solvers.sa.anneal on concrete IsingProblem graphs."""
    pg = build_packed(problem)
    return _sa_scan(pg, spins, key, jnp.asarray(temps),
                    collect_energy=collect_energy)


def packed_noisy_scan(problem, temps, nbr_J_sched, h_sched, spins, key):
    """Noisy anneal scan on the packed layout (tables row-permuted once,
    inside the jitted scan's prologue)."""
    pg = build_packed(problem)
    return _noisy_scan(pg, jnp.asarray(temps), jnp.asarray(nbr_J_sched),
                       jnp.asarray(h_sched), spins, key)


def packed_svmc_scan(problem, a_sched, b_sched, temp, theta, key, tf=False,
                     collect_energy=False):
    """SVMC anneal scan on the packed layout — inner engine for
    solvers.svmc.anneal on concrete IsingProblem graphs."""
    pg = build_packed(problem)
    return _svmc_scan(pg, jnp.asarray(a_sched), jnp.asarray(b_sched),
                      jnp.asarray(temp, jnp.float32), theta, key, tf=tf,
                      collect_energy=collect_energy)


def packed_noisy_svmc_scan(problem, a_sched, b_sched, temp, nbr_J_sched,
                           h_sched, theta, key, tf=False):
    """Noisy SVMC anneal on the packed layout (NoisySVMC/TF,
    svmc.pyx:236-448)."""
    pg = build_packed(problem)
    return _noisy_svmc_scan(pg, jnp.asarray(a_sched), jnp.asarray(b_sched),
                            jnp.asarray(temp, jnp.float32),
                            jnp.asarray(nbr_J_sched),
                            jnp.asarray(h_sched), theta, key, tf=tf)
