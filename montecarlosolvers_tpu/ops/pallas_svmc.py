"""Fused Pallas SVMC anneal kernel (lattice problems).

Whole spin-vector Monte Carlo anneal (svmc.pyx:21-229 semantics) in one
`pallas_call`: angle state resident in VMEM across the (A, B) schedules,
checkerboard phases, optional transverse-field-informed proposals
(svmc.pyx:198-207), counter-hash RNG (two uniforms per site per sweep:
proposal + acceptance). Same deployment note as pallas_sa.py applies.

Hardware status (2026-08, axon-tunneled v5e): compiles and runs on the
real chip after the schedule-chunk tile alignment fix (see
pallas_sa._align_sched_chunk); compiled output is BITWISE IDENTICAL to
the TPU-semantics interpreter (8x8 lattice, 24 steps, 4 chains).
Jitted slope-timed throughput (256 chains, TF proposals): 3.1e9 rotor
attempts/s vs 9.8e9 for the XLA split engine, which remains production
(trig-heavy phases amplify the full-plane color-phase waste; see the
pallas_sa.py deployment note, incl. the jit-wrapping requirement).
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
    _pad_up,
    _mix32,
    _uniform01,
    padded_planes,
)

PI = float(np.pi)


def _zfield(c, jr, jl, jd, ju, h, rows, cols, L, row_wrap, col_wrap):
    """sum_j J_ij cos(theta_j) + h on the padded block (c = cos(theta))."""
    R, C = c.shape[1], c.shape[2]
    right = pltpu.roll(c, C - 1, 2)
    left = pltpu.roll(c, 1, 2)
    down = pltpu.roll(c, R - 1, 1)
    up = pltpu.roll(c, 1, 1)
    if row_wrap:
        right = jnp.where(cols == L - 1, pltpu.roll(c, L - 1, 2), right)
        left = jnp.where(cols == 0, pltpu.roll(c, C - L + 1, 2), left)
    if col_wrap:
        down = jnp.where(rows == L - 1, pltpu.roll(c, L - 1, 1), down)
        up = jnp.where(rows == 0, pltpu.roll(c, R - L + 1, 1), up)
    return jr[:] * right + jl[:] * left + jd[:] * down + ju[:] * up + h[:]


def _svmc_kernel(seed_ref, a_ref, b_ref, jr, jl, jd, ju, h, th_in, th_out, *,
                 chunk, total_steps, L, row_wrap, col_wrap, temp, tf):
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        th_out[:] = th_in[:]

    shape = th_out.shape
    chain_ids = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    rows = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    cols = jax.lax.broadcasted_iota(jnp.int32, shape, 2)
    parity = (rows + cols) % 2
    site_ids = (
        (chain_ids + i * shape[0]) * jnp.int32(shape[1] * shape[2])
        + rows * jnp.int32(shape[2])
        + cols
    )
    seed = seed_ref[0]

    def step(t, _):
        t_global = j * chunk + t

        @pl.when(t_global < total_steps)
        def _():
            a_c = a_ref[t]
            b_c = b_ref[t]
            base = (
                seed * jnp.int32(2654435761 - (1 << 32))
                + t_global * jnp.int32(40503)
            )
            for color in range(2):
                th = th_out[:]
                u_prop = _uniform01(
                    base + jnp.int32(color * 1013904223), site_ids
                )
                u_acc = _uniform01(
                    base + jnp.int32(color * 1013904223) ^ jnp.int32(374761393),
                    site_ids,
                )
                if tf:
                    width = jnp.minimum(a_c / b_c, 1.0)
                    prop = th + width * (2.0 * PI * u_prop - PI)
                    prop = jnp.clip(prop, 0.0, PI)
                else:
                    prop = PI * u_prop
                ct = jnp.cos(th)
                zf = _zfield(ct, jr, jl, jd, ju, h, rows, cols, L,
                             row_wrap, col_wrap)
                de = b_c * (jnp.cos(prop) - ct) * zf
                de = de + a_c * (jnp.sin(th) - jnp.sin(prop))
                accept = ((de <= 0.0) | (-temp * jnp.log1p(-u_acc) > de)) & (
                    parity == color
                )
                th_out[:] = jnp.where(accept, prop, th)
        return 0

    jax.lax.fori_loop(0, chunk, step, 0)


def anneal_lattice_svmc(lat, a_sched, b_sched, temp, theta, seed, mcsteps=1,
                        tf=False, chain_block=32, chunk=512, interpret=False):
    """Fused SVMC anneal on a LatticeProblem.

    theta: (chains, N) angles in [0, pi]. Returns annealed angles.
    """
    L = lat.L
    theta = jnp.asarray(theta, dtype=jnp.float32)
    squeeze = theta.ndim == 1
    if squeeze:
        theta = theta[None]
    chains = theta.shape[0]
    planes_np, R, C, row_wrap, col_wrap = padded_planes(lat)
    planes = tuple(jnp.asarray(p) for p in planes_np)

    a = np.asarray(a_sched, np.float32)
    b = np.asarray(b_sched, np.float32)
    if mcsteps > 1:
        a = np.repeat(a, mcsteps)
        b = np.repeat(b, mcsteps)
    total = int(a.shape[0])
    chunk = _align_sched_chunk(chunk, total)
    padded_len = _pad_up(total, chunk)
    a_p = np.ones(padded_len, np.float32)
    b_p = np.ones(padded_len, np.float32)
    a_p[:total] = a
    b_p[:total] = b

    cb = min(chain_block, chains)
    while chains % cb:
        cb -= 1

    sp = jnp.zeros((chains, R, C), dtype=jnp.float32)
    sp = sp.at[:, :L, :L].set(theta.reshape(chains, L, L))

    out = _run_svmc(
        jnp.asarray([int(seed)], jnp.int32), jnp.asarray(a_p),
        jnp.asarray(b_p), planes, sp, cb=cb, chunk=chunk, total=total, L=L,
        row_wrap=row_wrap, col_wrap=col_wrap, temp=float(temp), tf=tf,
        interpret=interpret,
    )
    out = out[:, :L, :L].reshape(chains, L * L)
    return out[0] if squeeze else out


@functools.partial(
    jax.jit,
    static_argnames=("cb", "chunk", "total", "L", "row_wrap", "col_wrap",
                     "temp", "tf", "interpret"),
)
def _run_svmc(seed, a_p, b_p, planes, sp, *, cb, chunk, total, L, row_wrap,
              col_wrap, temp, tf, interpret):
    # jit-wrapped: a bare pallas_call re-lowers (and, through a remote-
    # compile service, RECOMPILES — ~21 s/call observed on the axon
    # tunnel) on every invocation; under jit repeat calls hit the
    # executable cache.
    chains, R, C = sp.shape
    n_blocks = chains // cb
    n_chunks = a_p.shape[0] // chunk
    plane_spec = pl.BlockSpec((R, C), lambda i, j, *_: (0, 0),
                              memory_space=pltpu.VMEM)
    state_spec = pl.BlockSpec((cb, R, C), lambda i, j, *_: (i, 0, 0),
                              memory_space=pltpu.VMEM)
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
        _svmc_kernel, chunk=chunk, total_steps=total, L=L,
        row_wrap=row_wrap, col_wrap=col_wrap, temp=temp, tf=tf,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(sp.shape, jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            # large chain blocks exceed the default 16 MiB scoped-VMEM cap
            # (state block + roll/trig temporaries); v5e has 128 MiB.
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=pltpu.InterpretParams() if interpret else False,
    )(seed, a_p, b_p, *planes, sp)
