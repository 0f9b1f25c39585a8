"""Fused Pallas SA kernel on the split-checkerboard layout.

The full-plane fused kernel (ops/pallas_sa.py) computes the neighbor
field for every padded site each color phase but flips only one parity —
half the elementwise work and all the uniforms on the inactive color are
wasted, and L=80 pads to 128 lanes (37.5% dead). This kernel runs the
same maskless half-updates as the XLA split engine (ops/split.py): the
state lives as the two checkerboard halves, each flattened to
Nh = L*L/2 and reshaped (Nh/128, 128) — zero lane padding at the
benchmark shape (Nh = 3200 = 25*128) — and one phase updates one entire
half from the other.

Spatial fields reuse ops/split.py's precomputed per-offset weights
(build_split): the 4 lattice neighbors of a site sit at flat offsets
{0, +1, -1, +K, -K} of the opposite half (K = L/2), plus two row-wrap
correction slots +/-(K-1) on periodic lattices. A flat roll by |s| < C
on the (R2, C) reshape is one lane roll plus a sublane-carried copy
selected at the seam columns (_flat_roll) — 2 pltpu.rolls + 1 select
per slot, on half the data of the full-plane kernel's masked rolls.

RNG options: the counter-hash of pallas_sa (_mix32 — bitwise identical
between compiled and interpreter modes, used by the tests' pure-JAX
oracle), or the on-chip hardware PRNG (hw_rng=True,
pltpu.prng_random_bits — cheaper per phase, compiled-mode only, streams
seeded per (seed, block, chunk)).

Replaces the hot loop of sa.Anneal (sa.pyx:81-99) in its
checkerboard-phase form; statistical semantics identical to
ops/split.sa_split_sweep (same fields, same Metropolis rule).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from montecarlosolvers_tpu.ops.pallas_sa import (
    LANE,
    _align_sched_chunk,
    _pad_up,
    _uniform01,
)
from montecarlosolvers_tpu.ops import split as split_mod


def _flat_roll(x, s, col):
    """Roll the flattened (..., R2, C) array by `s` along the flat
    row-major axis of length R2*C (y_flat[j] = x_flat[j - s]), for static
    0 < |s| <= C. One lane roll + one sublane-carried copy selected at
    the seam columns; exact across the flat wrap (row 0 borrows row
    R2-1, matching jnp.roll on the flat axis)."""
    C = x.shape[-1]
    R2 = x.shape[-2]
    if s > 0:
        xr = pltpu.roll(x, s % C, 2) if s % C else x
        if R2 == 1:
            return xr
        xc = pltpu.roll(xr, 1, 1)
        return jnp.where(col >= s, xr, xc) if s < C else xc
    m = -s
    xr = pltpu.roll(x, (C - m) % C, 2) if m % C else x
    if R2 == 1:
        return xr
    xc = pltpu.roll(xr, R2 - 1, 1)
    return jnp.where(col < C - m, xr, xc) if m < C else xc


def _half_field(o, w, col, K, nslots):
    """sum_slot w[slot] * flat_roll(o, offset[slot]) — the in-kernel form
    of ops/split._spatial_field (same slot order/offsets)."""
    f = w[0] * o
    f += w[1] * _flat_roll(o, -1, col)
    f += w[2] * _flat_roll(o, 1, col)
    f += w[3] * _flat_roll(o, -K, col)
    f += w[4] * _flat_roll(o, K, col)
    if nslots > 5:
        f += w[5] * _flat_roll(o, K - 1, col)
        f += w[6] * _flat_roll(o, -(K - 1), col)
    return f


def _split_kernel(seed_ref, sched_ref, wa, wb, ha, hb, a_in, b_in,
                  a_out, b_out, *, chunk, total_steps, K, nslots, nh,
                  hw_rng):
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        a_out[:] = a_in[:]
        b_out[:] = b_in[:]

    shape = a_out.shape  # (cb, R2, C)
    col = jax.lax.broadcasted_iota(jnp.int32, shape, 2)
    flat = (
        jax.lax.broadcasted_iota(jnp.int32, shape, 1) * jnp.int32(shape[2])
        + col
    )
    chain_ids = jax.lax.broadcasted_iota(jnp.int32, shape, 0) + i * shape[0]
    seed = seed_ref[0]
    if hw_rng:
        pltpu.prng_seed(seed, i, j)

    def uniforms(t_global, color):
        if hw_rng:
            bits = pltpu.prng_random_bits(shape)
            b24 = jax.lax.shift_right_logical(bits, 8)
            return b24.astype(jnp.float32) * (1.0 / (1 << 24))
        ctr = (
            seed * jnp.int32(2654435761 - (1 << 32))
            + t_global * jnp.int32(40503)
            + jnp.int32(color) * jnp.int32(1013904223)
        )
        uid = chain_ids * jnp.int32(2 * nh) + jnp.int32(color * nh) + flat
        return _uniform01(ctr, uid)

    def step(t, _):
        t_global = j * chunk + t

        @pl.when(t_global < total_steps)
        def _():
            temp = sched_ref[t]
            # phase A: update half A from half B
            a = a_out[:]
            f = _half_field(b_out[:], wa, col, K, nslots) + ha[:]
            de = -2.0 * a * f
            u = uniforms(t_global, 0)
            accept = (de <= 0.0) | (-temp * jnp.log1p(-u) > de)
            a_out[:] = jnp.where(accept, -a, a)
            # phase B: update half B from the fresh half A
            b = b_out[:]
            f = _half_field(a_out[:], wb, col, K, nslots) + hb[:]
            de = -2.0 * b * f
            u = uniforms(t_global, 1)
            accept = (de <= 0.0) | (-temp * jnp.log1p(-u) > de)
            b_out[:] = jnp.where(accept, -b, b)
        return 0

    jax.lax.fori_loop(0, chunk, step, 0)


@functools.partial(
    jax.jit,
    static_argnames=("cb", "chunk", "total", "K", "nslots", "interpret",
                     "hw_rng"),
)
def _run_split(seed, sched_p, wa, wb, ha, hb, a, b, *, cb, chunk, total, K,
               nslots, interpret, hw_rng):
    # jit-wrapped: see pallas_sa._run_pallas (bare pallas_calls re-lower
    # and remote-recompile every invocation).
    chains, R2, C = a.shape
    nh = R2 * C
    n_blocks = chains // cb
    n_chunks = sched_p.shape[0] // chunk

    w_spec = pl.BlockSpec((nslots, R2, C), lambda i, j, *_: (0, 0, 0),
                          memory_space=pltpu.VMEM)
    h_spec = pl.BlockSpec((R2, C), lambda i, j, *_: (0, 0),
                          memory_space=pltpu.VMEM)
    state_spec = pl.BlockSpec((cb, R2, C), lambda i, j, *_: (i, 0, 0),
                              memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_blocks, n_chunks),
        in_specs=[
            pl.BlockSpec((chunk,), lambda i, j, *_: (j,),
                         memory_space=pltpu.SMEM),
            w_spec, w_spec, h_spec, h_spec, state_spec, state_spec,
        ],
        out_specs=(state_spec, state_spec),
    )
    kernel = functools.partial(
        _split_kernel, chunk=chunk, total_steps=total, K=K, nslots=nslots,
        nh=nh, hw_rng=hw_rng,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct(a.shape, jnp.float32),
            jax.ShapeDtypeStruct(b.shape, jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=pltpu.InterpretParams() if interpret else False,
    )(seed, sched_p, wa, wb, ha, hb, a, b)


def anneal_lattice_split(lat, sched, spins, seed, mcsteps=1, chain_block=32,
                         chunk=512, interpret=False, hw_rng=False):
    """Fused split-layout SA anneal on a LatticeProblem.

    Requirements: even L and Nh = L*L/2 a multiple of 128 (lane-exact
    reshape; L = 16, 80, 96, ... — the benchmark's L=80 gives
    Nh = 3200 = 25*128) and K = L/2 <= 128 (flat rolls lane-expressible).

    Args:
      lat: LatticeProblem (open or toroidal).
      sched: (schedsize,) temperatures.
      spins: (chains, N) float32 +/-1 flat states.
      seed: int PRNG seed.
      mcsteps: sweeps per schedule step (sa.pyx:68).
      hw_rng: draw uniforms from the on-chip PRNG instead of the
        counter hash (faster; compiled-mode only — the interpreter's
        stream differs, so bitwise interpreter checks need hw_rng=False).

    Returns:
      (chains, N) annealed states, float32.
    """
    L = lat.L
    nh = L * L // 2
    if L % 2 or nh % LANE or L // 2 > LANE:
        raise ValueError(
            f"split fused kernel needs even L, L*L/2 % {LANE} == 0 and "
            f"L/2 <= {LANE} (got L={L}); use pallas_sa.anneal_lattice"
        )
    spins = jnp.asarray(spins, dtype=jnp.float32)
    squeeze = spins.ndim == 1
    if squeeze:
        spins = spins[None, :]
    chains = spins.shape[0]
    R2, C = nh // LANE, LANE

    sl = split_mod.build_split(lat)
    a, b = split_mod.pack_classical(sl, spins)
    a = a.reshape(chains, R2, C)
    b = b.reshape(chains, R2, C)
    nslots = int(sl.w_ab.shape[0])
    wa = jnp.asarray(sl.w_ab[:, 0]).reshape(nslots, R2, C)
    wb = jnp.asarray(sl.w_ab[:, 1]).reshape(nslots, R2, C)
    ha = jnp.asarray(sl.h_ab[0]).reshape(R2, C)
    hb = jnp.asarray(sl.h_ab[1]).reshape(R2, C)

    sched = np.asarray(sched, dtype=np.float32)
    if mcsteps > 1:
        sched = np.repeat(sched, mcsteps)
    total = int(sched.shape[0])
    chunk = _align_sched_chunk(chunk, total)
    padded_len = _pad_up(total, chunk)
    sched_p = np.zeros(padded_len, dtype=np.float32)
    sched_p[:total] = sched

    cb = min(chain_block, chains)
    while chains % cb:
        cb -= 1

    a, b = _run_split(
        jnp.asarray([int(seed)], jnp.int32), jnp.asarray(sched_p),
        wa, wb, ha, hb, a, b, cb=int(cb), chunk=chunk, total=total,
        K=L // 2, nslots=nslots, interpret=interpret, hw_rng=hw_rng,
    )
    out = split_mod.unpack_classical(
        sl, a.reshape(chains, nh), b.reshape(chains, nh)
    )
    return out[0] if squeeze else out
