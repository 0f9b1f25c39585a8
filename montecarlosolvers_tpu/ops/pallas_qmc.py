"""Fused Pallas PIQMC anneal kernel (lattice problems).

The full MST transverse-field anneal in one `pallas_call`: the Trotter
state block (chains, P, R, C) stays VMEM-resident across the whole
schedule; Gamma/B schedules stream through SMEM per chunk; J_perp is
recomputed on-chip each step (qmc.pyx:95); local sweeps use the combined
space-time coloring of ops/piqmc.py (2 phases for bipartite even-P) and
optional whole-line global moves reduce over the Trotter axis in-register
(qmc.pyx:405-438). RNG is the same counter-hash as pallas_sa.py —
bit-identical in interpreter and compiled modes.

Replaces the reference's qmc.QuantumAnneal[Global] hot loops
(qmc.pyx:97-143, 405-438).

Hardware status (2026-08, axon-tunneled v5e): compiles and runs on the
real chip after the schedule-chunk tile alignment fix (see
pallas_sa._align_sched_chunk); compiled output is BITWISE IDENTICAL to
the TPU-semantics interpreter (8x8 lattice, P=4, 24 steps, 2 chains).
Jitted slope-timed throughput at the benchmark shape (P=40, global
moves, 16 chains, chain_block=2): 1.26e10 att/s — 1.26x the 1e10 north
star, vs 2.5e10 for the XLA split space-time path (ops/split.py), which
remains the production engine; the ~2x is the full-plane color-phase
waste (see the pallas_sa.py deployment note, incl. the jit-wrapping
requirement).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from montecarlosolvers_tpu.ops.pallas_sa import (
    _align_sched_chunk,
    LANE,
    SUBLANE,
    _pad_up,
    _mix32,
    padded_planes,
)
from montecarlosolvers_tpu.ops.piqmc import spacetime_num_phases


def _uniform01_4d(ctr, ids):
    bits = _mix32(ids * jnp.int32(-1640531527) + ctr)
    b24 = jax.lax.shift_right_logical(bits, 8)
    return b24.astype(jnp.float32) * (1.0 / (1 << 24))


def _nbsum4(s, jr, jl, jd, ju, h, rows, cols, L, row_wrap, col_wrap):
    """Intra-slice neighbor sums on (Cb, P, R, C) blocks."""
    R, C = s.shape[2], s.shape[3]
    right = pltpu.roll(s, C - 1, 3)
    left = pltpu.roll(s, 1, 3)
    down = pltpu.roll(s, R - 1, 2)
    up = pltpu.roll(s, 1, 2)
    if row_wrap:
        right = jnp.where(cols == L - 1, pltpu.roll(s, L - 1, 3), right)
        left = jnp.where(cols == 0, pltpu.roll(s, C - L + 1, 3), left)
    if col_wrap:
        down = jnp.where(rows == L - 1, pltpu.roll(s, L - 1, 2), down)
        up = jnp.where(rows == 0, pltpu.roll(s, R - L + 1, 2), up)
    return jr[:] * right + jl[:] * left + jd[:] * down + ju[:] * up + h[:]


def _qmc_kernel(seed_ref, a_ref, b_ref, jr, jl, jd, ju, h, s_in, s_out, *,
                chunk, total_steps, L, row_wrap, col_wrap, m, temp,
                global_moves):
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        s_out[:] = s_in[:]

    shape = s_out.shape
    slices = shape[1]
    teff = temp * slices
    chain_ids = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    k_ids = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    rows = jax.lax.broadcasted_iota(jnp.int32, shape, 2)
    cols = jax.lax.broadcasted_iota(jnp.int32, shape, 3)
    parity = (rows + cols) % 2
    stc = (parity + k_ids) % m
    # globally unique site id: stride by the full (P, R, C) volume so no
    # two physical sites ever share an RNG stream
    plane = shape[2] * shape[3]
    site_ids = (
        (chain_ids + i * shape[0]) * jnp.int32(shape[1] * plane)
        + k_ids * jnp.int32(plane)
        + rows * jnp.int32(shape[3])
        + cols
    )
    seed = seed_ref[0]

    def step(t, _):
        t_global = j * chunk + t

        @pl.when(t_global < total_steps)
        def _():
            gamma = a_ref[t]
            bcoef = b_ref[t]
            jp = -0.5 * teff * jnp.log(jnp.tanh(gamma / teff))
            base = (
                seed * jnp.int32(2654435761 - (1 << 32))
                + t_global * jnp.int32(40503)
            )
            for p in range(m):
                s = s_out[:]
                f = _nbsum4(s, jr, jl, jd, ju, h, rows, cols, L,
                            row_wrap, col_wrap)
                s_up = pltpu.roll(s, 1, 1)
                s_dn = pltpu.roll(s, slices - 1, 1)
                de = -2.0 * bcoef * s * f + 2.0 * s * jp * (s_up + s_dn)
                u = _uniform01_4d(base + jnp.int32(p * 1013904223), site_ids)
                accept = (de <= 0.0) | (-teff * jnp.log1p(-u) > de)
                flip = accept & (stc == p)
                s_out[:] = jnp.where(flip, -s, s)
            if global_moves:
                gbase = base ^ jnp.int32(374761393)
                for color in range(2):
                    s = s_out[:]
                    f = _nbsum4(s, jr, jl, jd, ju, h, rows, cols, L,
                                row_wrap, col_wrap)
                    de_line = jnp.sum(-2.0 * bcoef * s * f, axis=1,
                                      keepdims=True)
                    u = _uniform01_4d(
                        gbase + jnp.int32(color * 69069), site_ids
                    )
                    # one decision per line: use the k=0 plane's uniforms
                    u0 = jax.lax.broadcast_in_dim(
                        u[:, 0:1], u.shape, (0, 1, 2, 3)
                    )
                    accept = (de_line <= 0.0) | (-teff * jnp.log1p(-u0) > de_line)
                    flip = accept & (parity == color)
                    s_out[:] = jnp.where(flip, -s, s)
        return 0

    jax.lax.fori_loop(0, chunk, step, 0)


def anneal_lattice_qmc(lat, a_sched, b_sched, temp, confs, seed, mcsteps=1,
                       global_moves=True, chain_block=4, chunk=256,
                       interpret=False):
    """Fused PIQMC anneal on a LatticeProblem.

    Args:
      lat: LatticeProblem (open or toroidal).
      a_sched, b_sched: (schedsize,) Gamma / B schedules.
      temp: ambient temperature (T_eff = P * temp, qmc.pyx:85).
      confs: (chains, P, N) float32 +/-1 slices-major Trotter states.
      seed: int PRNG seed.
      global_moves: add whole-line flips after each sweep.

    Returns:
      (chains, P, N) annealed states.
    """
    L = lat.L
    confs = jnp.asarray(confs, dtype=jnp.float32)
    squeeze = confs.ndim == 2
    if squeeze:
        confs = confs[None]
    chains, slices, nspins = confs.shape
    planes_np, R, C, row_wrap, col_wrap = padded_planes(lat)
    planes = tuple(jnp.asarray(p) for p in planes_np)

    m = spacetime_num_phases(2, slices)

    a = np.asarray(a_sched, dtype=np.float32)
    b = np.asarray(b_sched, dtype=np.float32)
    if mcsteps > 1:
        a = np.repeat(a, mcsteps)
        b = np.repeat(b, mcsteps)
    total = int(a.shape[0])
    chunk = _align_sched_chunk(chunk, total)
    padded_len = _pad_up(total, chunk)
    a_p = np.zeros(padded_len, np.float32)
    b_p = np.zeros(padded_len, np.float32)
    a_p[:total] = a
    b_p[:total] = b
    a_p[total:] = 1.0  # pad never used (kernel masks); keep log/tanh finite
    b_p[total:] = 1.0

    cb = min(chain_block, chains)
    while chains % cb:
        cb -= 1

    sp = jnp.zeros((chains, slices, R, C), dtype=jnp.float32)
    sp = sp.at[:, :, :L, :L].set(confs.reshape(chains, slices, L, L))

    out = _run_qmc(
        jnp.asarray([int(seed)], jnp.int32), jnp.asarray(a_p),
        jnp.asarray(b_p), planes, sp, cb=cb, chunk=chunk, total=total, L=L,
        row_wrap=row_wrap, col_wrap=col_wrap, m=m, temp=float(temp),
        global_moves=global_moves, interpret=interpret,
    )
    out = out[:, :, :L, :L].reshape(chains, slices, L * L)
    return out[0] if squeeze else out


@functools.partial(
    jax.jit,
    static_argnames=("cb", "chunk", "total", "L", "row_wrap", "col_wrap",
                     "m", "temp", "global_moves", "interpret"),
)
def _run_qmc(seed, a_p, b_p, planes, sp, *, cb, chunk, total, L, row_wrap,
             col_wrap, m, temp, global_moves, interpret):
    # jit-wrapped: a bare pallas_call re-lowers (and, through a remote-
    # compile service, RECOMPILES — ~21 s/call observed on the axon
    # tunnel) on every invocation; under jit repeat calls hit the
    # executable cache.
    chains, slices, R, C = sp.shape
    n_blocks = chains // cb
    n_chunks = a_p.shape[0] // chunk

    plane_spec = pl.BlockSpec((R, C), lambda i, j, *_: (0, 0),
                              memory_space=pltpu.VMEM)
    state_spec = pl.BlockSpec(
        (cb, slices, R, C), lambda i, j, *_: (i, 0, 0, 0),
        memory_space=pltpu.VMEM,
    )
    sched_spec = pl.BlockSpec((chunk,), lambda i, j, *_: (j,),
                              memory_space=pltpu.SMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_blocks, n_chunks),
        in_specs=[sched_spec, sched_spec,
                  plane_spec, plane_spec, plane_spec, plane_spec, plane_spec,
                  state_spec],
        out_specs=state_spec,
    )
    kernel = functools.partial(
        _qmc_kernel, chunk=chunk, total_steps=total, L=L,
        row_wrap=row_wrap, col_wrap=col_wrap, m=m, temp=temp,
        global_moves=global_moves,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(sp.shape, jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            # benchmark shapes exceed the default 16 MiB scoped-VMEM cap
            # (P=40 state block + roll temporaries); v5e has 128 MiB.
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=pltpu.InterpretParams() if interpret else False,
    )(seed, a_p, b_p, *planes, sp)
