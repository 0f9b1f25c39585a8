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
ops/split.sa_split_sweep (same fields, same Metropolis rule). The PIQMC
variant (anneal_lattice_qmc_split) is the in-kernel form of
ops/split.qmc_split_sweep + qmc_split_global (qmc.pyx:97-143, 405-438).

Hardware status (2026-08, axon-tunneled v5e): both kernels compile, run,
and match the interpreter BITWISE (SA: L=16/L=32 lattices; PIQMC:
L=16, P=4, global moves). Jitted slope-timed rates on the santoro
80x80 benchmark: SA ~5e10 att/s at 64-512 chains — 5.6e10 at 128
chains with hw_rng=True — reaching the XLA split engine's peak
(5.1e10 at 640 chains) with 5-10x fewer chains; PIQMC P=40
local+global 2.8e10 att/s at 16 chains, chain_block=4, ABOVE the XLA
split engine's 2.5e10 at the same batch. Run-to-run spread through the
tunnel is ~±30%; the remote Mosaic compile service is erratic (the
same santoro-shape SA kernel compiled in 19 s and 8 min on different
attempts), so bench.py keeps these as budget-gated extra arms.

The dissipative kernel (anneal_lattice_qmc_bath_split) is
interpreter-validated (bitwise vs its pure-JAX oracle) AND
hardware-timed as the bench.py pallas_piqmc_bath arm: 2.89e10 att/s in
BENCH_r03 and 1.77e10 in the 2026-08-19 hardware-validated round-4 run
(results/bench_hw_validated.json), both at P=40 benchmark scale.
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
    lane_ax = x.ndim - 1
    sub_ax = x.ndim - 2
    if s > 0:
        xr = pltpu.roll(x, s % C, lane_ax) if s % C else x
        if R2 == 1:
            return xr
        xc = pltpu.roll(xr, 1, sub_ax)
        return jnp.where(col >= s, xr, xc) if s < C else xc
    m = -s
    xr = pltpu.roll(x, (C - m) % C, lane_ax) if m % C else x
    if R2 == 1:
        return xr
    xc = pltpu.roll(xr, R2 - 1, sub_ax)
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
        # prng_seed accepts at most 2 scalars; fold (block, chunk) into one
        pltpu.prng_seed(seed, i * jnp.int32(1 << 16) + j)

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


# -------------------------------------------------------------------- SVMC
#
# In-kernel form of ops/split.svmc_split_sweep: rotor angles as halves,
# each phase proposing + Metropolis-testing one whole half against the
# other's z-projected field (svmc.pyx:92-117; TF proposal window
# svmc.pyx:198-207). Two uniforms per site per phase (proposal, accept).


def _svmc_split_kernel(seed_ref, a_ref, b_ref, wa, wb, ha, hb, a_in, b_in,
                       a_out, b_out, ca, sa_, cb, sb_, *, chunk,
                       total_steps, K, nslots, nh, temp, tf, hw_rng):
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        a_out[:] = a_in[:]
        b_out[:] = b_in[:]
        # trig caches (VMEM scratch, persist across schedule chunks):
        # carrying cos/sin of the state cuts the transcendentals from 5
        # to 2 sin/cos per site per phase — the rotor sweep's bottleneck
        ca[:] = jnp.cos(a_in[:])
        sa_[:] = jnp.sin(a_in[:])
        cb[:] = jnp.cos(b_in[:])
        sb_[:] = jnp.sin(b_in[:])

    shape = a_out.shape  # (cb, R2, C)
    col = jax.lax.broadcasted_iota(jnp.int32, shape, 2)
    flat = (
        jax.lax.broadcasted_iota(jnp.int32, shape, 1) * jnp.int32(shape[2])
        + col
    )
    chain_ids = jax.lax.broadcasted_iota(jnp.int32, shape, 0) + i * shape[0]
    seed = seed_ref[0]
    if hw_rng:
        pltpu.prng_seed(seed, i * jnp.int32(1 << 16) + j)
    pi = jnp.float32(np.pi)

    def uniforms(t_global, idx):
        if hw_rng:
            bits = pltpu.prng_random_bits(shape)
            b24 = jax.lax.shift_right_logical(bits, 8)
            return b24.astype(jnp.float32) * (1.0 / (1 << 24))
        ctr = (
            seed * jnp.int32(2654435761 - (1 << 32))
            + t_global * jnp.int32(40503)
            + jnp.int32(idx) * jnp.int32(1013904223)
        )
        uid = (
            chain_ids * jnp.int32(2 * nh)
            + jnp.int32((idx % 2) * nh) + flat
        )
        return _uniform01(ctr, uid)

    def step(t, _):
        t_global = j * chunk + t

        @pl.when(t_global < total_steps)
        def _():
            ac = a_ref[t]
            bc = b_ref[t]
            width = jnp.minimum(ac / bc, 1.0)

            def phase(s_ref, c_ref, sn_ref, cos_other, w, h, idx):
                th = s_ref[:]
                u_p = uniforms(t_global, idx)
                if tf:
                    prop = jnp.clip(
                        th + width * (2.0 * pi * u_p - pi), 0.0, pi
                    )
                else:
                    prop = pi * u_p
                cp = jnp.cos(prop)
                sp = jnp.sin(prop)
                zf = _half_field(cos_other, w, col, K, nslots) + h[:]
                de = bc * (cp - c_ref[:]) * zf + ac * (sn_ref[:] - sp)
                u = uniforms(t_global, idx + 2)
                acc = (de <= 0.0) | (-temp * jnp.log1p(-u) > de)
                s_ref[:] = jnp.where(acc, prop, th)
                c_ref[:] = jnp.where(acc, cp, c_ref[:])
                sn_ref[:] = jnp.where(acc, sp, sn_ref[:])

            phase(a_out, ca, sa_, cb[:], wa, ha, 0)
            phase(b_out, cb, sb_, ca[:], wb, hb, 1)
        return 0

    jax.lax.fori_loop(0, chunk, step, 0)


@functools.partial(
    jax.jit,
    static_argnames=("cb", "chunk", "total", "K", "nslots", "temp", "tf",
                     "interpret", "hw_rng"),
)
def _run_svmc_split(seed, a_p, b_p, wa, wb, ha, hb, a, b, *, cb, chunk,
                    total, K, nslots, temp, tf, interpret, hw_rng):
    chains, R2, C = a.shape
    nh = R2 * C
    n_blocks = chains // cb
    n_chunks = a_p.shape[0] // chunk

    w_spec = pl.BlockSpec((nslots, R2, C), lambda i, j, *_: (0, 0, 0),
                          memory_space=pltpu.VMEM)
    h_spec = pl.BlockSpec((R2, C), lambda i, j, *_: (0, 0),
                          memory_space=pltpu.VMEM)
    state_spec = pl.BlockSpec((cb, R2, C), lambda i, j, *_: (i, 0, 0),
                              memory_space=pltpu.VMEM)
    sched_spec = pl.BlockSpec((chunk,), lambda i, j, *_: (j,),
                              memory_space=pltpu.SMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_blocks, n_chunks),
        in_specs=[sched_spec, sched_spec, w_spec, w_spec, h_spec, h_spec,
                  state_spec, state_spec],
        out_specs=(state_spec, state_spec),
        scratch_shapes=[pltpu.VMEM((cb, R2, C), jnp.float32)] * 4,
    )
    kernel = functools.partial(
        _svmc_split_kernel, chunk=chunk, total_steps=total, K=K,
        nslots=nslots, nh=nh, temp=temp, tf=tf, hw_rng=hw_rng,
    )
    st = jax.ShapeDtypeStruct(a.shape, jnp.float32)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(st, st),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=pltpu.InterpretParams() if interpret else False,
    )(seed, a_p, b_p, wa, wb, ha, hb, a, b)


def anneal_lattice_svmc_split(lat, a_sched, b_sched, temp, theta, seed,
                              mcsteps=1, tf=False, chain_block=32,
                              chunk=512, interpret=False, hw_rng=False):
    """Fused split-layout SVMC anneal on a LatticeProblem.

    Same shape requirements as anneal_lattice_split.
    theta: (chains, N) angles in [0, pi]. Returns annealed angles.
    """
    L = lat.L
    nh = L * L // 2
    if L % 2 or nh % LANE or L // 2 > LANE:
        raise ValueError(
            f"split fused kernel needs even L, L*L/2 % {LANE} == 0 and "
            f"L/2 <= {LANE} (got L={L}); use pallas_svmc.anneal_lattice_svmc"
        )
    theta = jnp.asarray(theta, dtype=jnp.float32)
    squeeze = theta.ndim == 1
    if squeeze:
        theta = theta[None]
    chains = theta.shape[0]
    R2, C = nh // LANE, LANE

    sl = split_mod.build_split(lat)
    a, b = split_mod.pack_classical(sl, theta)
    a = a.reshape(chains, R2, C)
    b = b.reshape(chains, R2, C)
    nslots = int(sl.w_ab.shape[0])
    wa = jnp.asarray(sl.w_ab[:, 0]).reshape(nslots, R2, C)
    wb = jnp.asarray(sl.w_ab[:, 1]).reshape(nslots, R2, C)
    ha = jnp.asarray(sl.h_ab[0]).reshape(R2, C)
    hb = jnp.asarray(sl.h_ab[1]).reshape(R2, C)

    a_s = np.asarray(a_sched, dtype=np.float32)
    b_s = np.asarray(b_sched, dtype=np.float32)
    if mcsteps > 1:
        a_s = np.repeat(a_s, mcsteps)
        b_s = np.repeat(b_s, mcsteps)
    total = int(a_s.shape[0])
    chunk = _align_sched_chunk(chunk, total)
    padded_len = _pad_up(total, chunk)
    a_p = np.ones(padded_len, np.float32)  # pad masked; keep A/B finite
    b_p = np.ones(padded_len, np.float32)
    a_p[:total] = a_s
    b_p[:total] = b_s

    cb = min(chain_block, chains)
    while chains % cb:
        cb -= 1

    a, b = _run_svmc_split(
        jnp.asarray([int(seed)], jnp.int32), jnp.asarray(a_p),
        jnp.asarray(b_p), wa, wb, ha, hb, a, b, cb=int(cb), chunk=chunk,
        total=total, K=L // 2, nslots=nslots, temp=float(temp), tf=tf,
        interpret=interpret, hw_rng=hw_rng,
    )
    out = split_mod.unpack_classical(
        sl, a.reshape(chains, nh), b.reshape(chains, nh)
    )
    return out[0] if squeeze else out


# ------------------------------------------------------------------- PIQMC
#
# In-kernel form of ops/split.qmc_split_sweep / qmc_split_global: the four
# quarter-volume arrays (xe, xo, ye, yo), each (cb, Q=P/2, R2, C), stay
# VMEM-resident across the whole schedule. Per step, phase X updates
# (xe, xo) against the y quarters (spatial flat rolls + one Trotter q-roll
# each), phase Y against the fresh x quarters, then optional whole-line
# global moves reduce over the Q axis in-register (J_perp cancels,
# qmc.pyx:405-438). J_perp is recomputed on-chip from the streamed Gamma
# schedule each step (qmc.pyx:95).


def _q_roll(x, up):
    """Trotter-ring roll by +/-1 along the Q axis of (cb, Q, R2, C)."""
    return pltpu.roll(x, 1 if up else x.shape[1] - 1, 1)


def _qmc_split_kernel(seed_ref, a_ref, b_ref, wa, wb, ha, hb,
                      xe_in, xo_in, ye_in, yo_in, xe, xo, ye, yo, *,
                      chunk, total_steps, K, nslots, nh, temp,
                      global_moves, hw_rng):
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        xe[:] = xe_in[:]
        xo[:] = xo_in[:]
        ye[:] = ye_in[:]
        yo[:] = yo_in[:]

    shape = xe.shape  # (cb, Q, R2, C)
    Q = shape[1]
    slices = 2 * Q
    teff = temp * slices
    col = jax.lax.broadcasted_iota(jnp.int32, shape, 3)
    flat = (
        jax.lax.broadcasted_iota(jnp.int32, shape, 2) * jnp.int32(shape[3])
        + col
    )
    qid = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    chain_ids = jax.lax.broadcasted_iota(jnp.int32, shape, 0) + i * shape[0]
    seed = seed_ref[0]

    gshape = (shape[0], shape[2], shape[3])
    gcol = jax.lax.broadcasted_iota(jnp.int32, gshape, 2)
    gflat = (
        jax.lax.broadcasted_iota(jnp.int32, gshape, 1) * jnp.int32(shape[3])
        + gcol
    )
    gchain = jax.lax.broadcasted_iota(jnp.int32, gshape, 0) + i * shape[0]
    if hw_rng:
        pltpu.prng_seed(seed, i * jnp.int32(1 << 16) + j)

    def ctr(t_global, idx):
        return (
            seed * jnp.int32(2654435761 - (1 << 32))
            + t_global * jnp.int32(40503)
            + jnp.int32(idx) * jnp.int32(1013904223)
        )

    def _hw_uniform(shp):
        bits = pltpu.prng_random_bits(shp)
        b24 = jax.lax.shift_right_logical(bits, 8)
        return b24.astype(jnp.float32) * (1.0 / (1 << 24))

    def u_quarter(t_global, idx):
        if hw_rng:
            return _hw_uniform(shape)
        uid = (
            chain_ids * jnp.int32(4 * Q * nh)
            + jnp.int32(idx * Q * nh) + qid * jnp.int32(nh) + flat
        )
        return _uniform01(ctr(t_global, idx), uid)

    def u_line(t_global, color):
        if hw_rng:
            return _hw_uniform(gshape)
        uid = gchain * jnp.int32(2 * nh) + jnp.int32(color * nh) + gflat
        return _uniform01(ctr(t_global, 4 + color), uid)

    def step(t, _):
        t_global = j * chunk + t

        @pl.when(t_global < total_steps)
        def _():
            gamma = a_ref[t]
            bcur = b_ref[t]
            jp = -(teff / 2.0) * jnp.log(jnp.tanh(gamma / teff))
            bc = -2.0 * bcur

            def upd(s_ref, o, w, h, tr, idx):
                s = s_ref[:]
                f = _half_field(o, w, col, K, nslots) + h[:]
                de = bc * s * f + 2.0 * s * jp * tr
                u = u_quarter(t_global, idx)
                acc = (de <= 0.0) | (-teff * jnp.log1p(-u) > de)
                s_ref[:] = jnp.where(acc, -s, s)

            # phase X: xe against (ye spatial, yo ring), xo against (yo, ye)
            upd(xe, ye[:], wa, ha, yo[:] + _q_roll(yo[:], True), 0)
            upd(xo, yo[:], wb, hb, ye[:] + _q_roll(ye[:], False), 1)
            # phase Y against the updated X
            upd(ye, xe[:], wb, hb, xo[:] + _q_roll(xo[:], True), 2)
            upd(yo, xo[:], wa, ha, xe[:] + _q_roll(xe[:], False), 3)

            if global_moves:
                # color A lines: sites xe + yo, spatial neighbors ye / xo
                de = bc * (
                    jnp.sum(
                        xe[:] * (_half_field(ye[:], wa, col, K, nslots)
                                 + ha[:]),
                        axis=1,
                    )
                    + jnp.sum(
                        yo[:] * (_half_field(xo[:], wa, col, K, nslots)
                                 + ha[:]),
                        axis=1,
                    )
                )
                u = u_line(t_global, 0)
                acc = (de <= 0.0) | (-teff * jnp.log1p(-u) > de)
                m = jnp.where(acc, -1.0, 1.0)[:, None, :, :]
                xe[:] = xe[:] * m
                yo[:] = yo[:] * m
                # color B lines, against the updated A quarters
                de = bc * (
                    jnp.sum(
                        ye[:] * (_half_field(xe[:], wb, col, K, nslots)
                                 + hb[:]),
                        axis=1,
                    )
                    + jnp.sum(
                        xo[:] * (_half_field(yo[:], wb, col, K, nslots)
                                 + hb[:]),
                        axis=1,
                    )
                )
                u = u_line(t_global, 1)
                acc = (de <= 0.0) | (-teff * jnp.log1p(-u) > de)
                m = jnp.where(acc, -1.0, 1.0)[:, None, :, :]
                ye[:] = ye[:] * m
                xo[:] = xo[:] * m
        return 0

    jax.lax.fori_loop(0, chunk, step, 0)


@functools.partial(
    jax.jit,
    static_argnames=("cb", "chunk", "total", "K", "nslots", "temp",
                     "global_moves", "interpret", "hw_rng"),
)
def _run_qmc_split(seed, a_p, b_p, wa, wb, ha, hb, quarters, *, cb, chunk,
                   total, K, nslots, temp, global_moves, interpret, hw_rng):
    chains, Q, R2, C = quarters[0].shape
    nh = R2 * C
    n_blocks = chains // cb
    n_chunks = a_p.shape[0] // chunk

    w_spec = pl.BlockSpec((nslots, R2, C), lambda i, j, *_: (0, 0, 0),
                          memory_space=pltpu.VMEM)
    h_spec = pl.BlockSpec((R2, C), lambda i, j, *_: (0, 0),
                          memory_space=pltpu.VMEM)
    state_spec = pl.BlockSpec((cb, Q, R2, C), lambda i, j, *_: (i, 0, 0, 0),
                              memory_space=pltpu.VMEM)
    sched_spec = pl.BlockSpec((chunk,), lambda i, j, *_: (j,),
                              memory_space=pltpu.SMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_blocks, n_chunks),
        in_specs=[sched_spec, sched_spec, w_spec, w_spec, h_spec, h_spec,
                  state_spec, state_spec, state_spec, state_spec],
        out_specs=(state_spec,) * 4,
    )
    kernel = functools.partial(
        _qmc_split_kernel, chunk=chunk, total_steps=total, K=K,
        nslots=nslots, nh=nh, temp=temp, global_moves=global_moves,
        hw_rng=hw_rng,
    )
    st = jax.ShapeDtypeStruct(quarters[0].shape, jnp.float32)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(st,) * 4,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=pltpu.InterpretParams() if interpret else False,
    )(seed, a_p, b_p, wa, wb, ha, hb, *quarters)


def anneal_lattice_qmc_split(lat, a_sched, b_sched, temp, confs, seed,
                             mcsteps=1, global_moves=True, chain_block=2,
                             chunk=256, interpret=False, hw_rng=False):
    """Fused split-layout PIQMC anneal on a LatticeProblem.

    Same shape requirements as anneal_lattice_split, plus even P.

    Args:
      confs: (chains, P, N) float32 +/-1 slices-major Trotter states.
      temp: ambient temperature (T_eff = P * temp, qmc.pyx:85).
      global_moves: whole-line flips after each local sweep
        (qmc.QuantumAnnealGlobal, qmc.pyx:284-438).

    Returns:
      (chains, P, N) annealed states.
    """
    L = lat.L
    nh = L * L // 2
    if L % 2 or nh % LANE or L // 2 > LANE:
        raise ValueError(
            f"split fused kernel needs even L, L*L/2 % {LANE} == 0 and "
            f"L/2 <= {LANE} (got L={L}); use pallas_qmc.anneal_lattice_qmc"
        )
    confs = jnp.asarray(confs, dtype=jnp.float32)
    squeeze = confs.ndim == 2
    if squeeze:
        confs = confs[None]
    chains, slices, _ = confs.shape
    if slices % 2:
        raise ValueError("split fused PIQMC needs even P")
    R2, C = nh // LANE, LANE
    Q = slices // 2

    sl = split_mod.build_split(lat)
    quarters = [
        q.reshape(chains, Q, R2, C) for q in split_mod.pack_qmc(sl, confs)
    ]
    nslots = int(sl.w_ab.shape[0])
    wa = jnp.asarray(sl.w_ab[:, 0]).reshape(nslots, R2, C)
    wb = jnp.asarray(sl.w_ab[:, 1]).reshape(nslots, R2, C)
    ha = jnp.asarray(sl.h_ab[0]).reshape(R2, C)
    hb = jnp.asarray(sl.h_ab[1]).reshape(R2, C)

    a = np.asarray(a_sched, dtype=np.float32)
    b = np.asarray(b_sched, dtype=np.float32)
    if mcsteps > 1:
        a = np.repeat(a, mcsteps)
        b = np.repeat(b, mcsteps)
    total = int(a.shape[0])
    chunk = _align_sched_chunk(chunk, total)
    padded_len = _pad_up(total, chunk)
    a_p = np.ones(padded_len, np.float32)  # pad masked; keep log/tanh finite
    b_p = np.ones(padded_len, np.float32)
    a_p[:total] = a
    b_p[:total] = b

    cb = min(chain_block, chains)
    while chains % cb:
        cb -= 1

    xe, xo, ye, yo = _run_qmc_split(
        jnp.asarray([int(seed)], jnp.int32), jnp.asarray(a_p),
        jnp.asarray(b_p), wa, wb, ha, hb, tuple(quarters), cb=int(cb),
        chunk=chunk, total=total, K=L // 2, nslots=nslots,
        temp=float(temp), global_moves=global_moves, interpret=interpret,
        hw_rng=hw_rng,
    )
    out = split_mod.unpack_qmc(
        sl, *(q.reshape(chains, Q, nh) for q in (xe, xo, ye, yo))
    )
    return out[0] if squeeze else out


# -------------------------------------------------- dissipative PIQMC (bath)
#
# In-kernel form of ops/split.qmc_bath_split_sweep (qmc.pyx:149-278): the
# per-slice halves A, B, each (cb, P, R2, C), stay VMEM-resident across the
# whole schedule — the XLA engine streams the full (chains, P, N) state
# through HBM once per slice step (P times per sweep), which is why the
# bath config is an order of magnitude below the other arms. Slices update
# sequentially (the bath couples every slice pair of a line, so P phases
# per half is the information-theoretic minimum); the bath field is a
# static-P-unrolled scalar-FMA sum over the same half's slices, with the
# (P, P) bath matrix streamed as SMEM scalars (zero diagonal excludes the
# slice itself). Optional whole-line global moves after each sweep
# (DissipativeQuantumAnnealGlobal, qmc.pyx:444-609; the bath term is
# exactly invariant under a full-line flip).


def _qmc_bath_split_kernel(seed_ref, a_ref, b_ref, m_ref, wa, wb, ha, hb,
                           ain, bin_, aout, bout, *, chunk, total_steps,
                           K, nslots, nh, temp, slices, global_moves,
                           hw_rng):
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        aout[:] = ain[:]
        bout[:] = bin_[:]

    cb = aout.shape[0]
    teff = temp * slices
    sshape = (cb, aout.shape[2], aout.shape[3])  # one slice of one half
    col = jax.lax.broadcasted_iota(jnp.int32, sshape, 2)
    flat = (
        jax.lax.broadcasted_iota(jnp.int32, sshape, 1)
        * jnp.int32(sshape[2]) + col
    )
    chain_ids = jax.lax.broadcasted_iota(jnp.int32, sshape, 0) + i * cb
    col4 = jax.lax.broadcasted_iota(jnp.int32, aout.shape, 3)
    seed = seed_ref[0]
    if hw_rng:
        pltpu.prng_seed(seed, i * jnp.int32(1 << 16) + j)

    def uniforms(t_global, idx):
        """idx = 2*k + half for slice phases, 2*P + color for line moves."""
        if hw_rng:
            bits = pltpu.prng_random_bits(sshape)
            b24 = jax.lax.shift_right_logical(bits, 8)
            return b24.astype(jnp.float32) * (1.0 / (1 << 24))
        ctr = (
            seed * jnp.int32(2654435761 - (1 << 32))
            + t_global * jnp.int32(40503)
            + idx * jnp.int32(1013904223)
        )
        uid = chain_ids * jnp.int32(2 * nh) + (idx % 2) * jnp.int32(nh) + flat
        return _uniform01(ctr, uid)

    def step(t, _):
        t_global = j * chunk + t

        @pl.when(t_global < total_steps)
        def _():
            gamma = a_ref[t]
            bcur = b_ref[t]
            jp = -(teff / 2.0) * jnp.log(jnp.tanh(gamma / teff))
            bc = -2.0 * bcur

            def slice_body(k, _):
                up = jax.lax.rem(k + jnp.int32(slices - 1), jnp.int32(slices))
                dn = jax.lax.rem(k + jnp.int32(1), jnp.int32(slices))
                av = aout[:]
                bv = bout[:]
                # bath fields: static-p unrolled scalar FMAs over the P
                # axis of the same half (m diag is zero)
                bath_a = m_ref[k * slices] * av[:, 0]
                bath_b = m_ref[k * slices] * bv[:, 0]
                for p in range(1, slices):
                    m = m_ref[k * slices + p]
                    bath_a += m * av[:, p]
                    bath_b += m * bv[:, p]
                a_k = aout[:, k]
                b_k = bout[:, k]
                a_tr = aout[:, up] + aout[:, dn]
                b_tr = bout[:, up] + bout[:, dn]
                # phase A
                f = _half_field(b_k, wa, col, K, nslots) + ha[:]
                de = bc * a_k * f + 2.0 * a_k * jp * a_tr \
                    + 2.0 * teff * a_k * bath_a
                u = uniforms(t_global, 2 * k)
                acc = (de <= 0.0) | (-teff * jnp.log1p(-u) > de)
                a_k = jnp.where(acc, -a_k, a_k)
                aout[:, k] = a_k
                # phase B against the fresh half A
                f = _half_field(a_k, wb, col, K, nslots) + hb[:]
                de = bc * b_k * f + 2.0 * b_k * jp * b_tr \
                    + 2.0 * teff * b_k * bath_b
                u = uniforms(t_global, 2 * k + 1)
                acc = (de <= 0.0) | (-teff * jnp.log1p(-u) > de)
                bout[:, k] = jnp.where(acc, -b_k, b_k)
                return 0

            jax.lax.fori_loop(0, slices, slice_body, 0)

            if global_moves:
                # whole-line flips: dE sums intra-slice terms only (J_perp
                # AND bath cancel exactly for a full-line flip)
                av = aout[:]
                bv = bout[:]
                de = bc * jnp.sum(
                    av * (_half_field(bv, wa, col4, K, nslots)
                          + ha[:][None]),
                    axis=1,
                )
                u = uniforms(t_global, jnp.int32(2 * slices))
                acc = (de <= 0.0) | (-teff * jnp.log1p(-u) > de)
                aout[:] = av * jnp.where(acc, -1.0, 1.0)[:, None]
                av = aout[:]
                de = bc * jnp.sum(
                    bv * (_half_field(av, wb, col4, K, nslots)
                          + hb[:][None]),
                    axis=1,
                )
                u = uniforms(t_global, jnp.int32(2 * slices + 1))
                acc = (de <= 0.0) | (-teff * jnp.log1p(-u) > de)
                bout[:] = bv * jnp.where(acc, -1.0, 1.0)[:, None]
        return 0

    jax.lax.fori_loop(0, chunk, step, 0)


@functools.partial(
    jax.jit,
    static_argnames=("cb", "chunk", "total", "K", "nslots", "temp",
                     "slices", "global_moves", "interpret", "hw_rng"),
)
def _run_qmc_bath_split(seed, a_p, b_p, m_flat, wa, wb, ha, hb, a, b, *,
                        cb, chunk, total, K, nslots, temp, slices,
                        global_moves, interpret, hw_rng):
    chains, P, R2, C = a.shape
    nh = R2 * C
    n_blocks = chains // cb
    n_chunks = a_p.shape[0] // chunk

    w_spec = pl.BlockSpec((nslots, R2, C), lambda i, j, *_: (0, 0, 0),
                          memory_space=pltpu.VMEM)
    h_spec = pl.BlockSpec((R2, C), lambda i, j, *_: (0, 0),
                          memory_space=pltpu.VMEM)
    state_spec = pl.BlockSpec((cb, P, R2, C), lambda i, j, *_: (i, 0, 0, 0),
                              memory_space=pltpu.VMEM)
    sched_spec = pl.BlockSpec((chunk,), lambda i, j, *_: (j,),
                              memory_space=pltpu.SMEM)
    m_spec = pl.BlockSpec((P * P,), lambda i, j, *_: (0,),
                          memory_space=pltpu.SMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_blocks, n_chunks),
        in_specs=[sched_spec, sched_spec, m_spec, w_spec, w_spec, h_spec,
                  h_spec, state_spec, state_spec],
        out_specs=(state_spec, state_spec),
    )
    kernel = functools.partial(
        _qmc_bath_split_kernel, chunk=chunk, total_steps=total, K=K,
        nslots=nslots, nh=nh, temp=temp, slices=slices,
        global_moves=global_moves, hw_rng=hw_rng,
    )
    st = jax.ShapeDtypeStruct(a.shape, jnp.float32)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(st, st),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=pltpu.InterpretParams() if interpret else False,
    )(seed, a_p, b_p, m_flat, wa, wb, ha, hb, a, b)


def anneal_lattice_qmc_bath_split(lat, a_sched, b_sched, temp, lookuptable,
                                  confs, seed, mcsteps=1, global_moves=False,
                                  chain_block=4, chunk=128, interpret=False,
                                  hw_rng=False):
    """Fused split-layout dissipative PIQMC anneal on a LatticeProblem.

    Same shape requirements as anneal_lattice_split (any P >= 2).

    Args:
      lookuptable: (P-1,) bath couplings (schedules.bath_lookuptable).
      confs: (chains, P, N) float32 +/-1 slices-major Trotter states.
      global_moves: whole-line flips after each slice sweep
        (DissipativeQuantumAnnealGlobal, qmc.pyx:444-609).

    Returns:
      (chains, P, N) annealed states.
    """
    from montecarlosolvers_tpu.ops.piqmc import bath_matrix

    L = lat.L
    nh = L * L // 2
    if L % 2 or nh % LANE or L // 2 > LANE:
        raise ValueError(
            f"split fused kernel needs even L, L*L/2 % {LANE} == 0 and "
            f"L/2 <= {LANE} (got L={L}); use solvers.qmc.anneal"
        )
    confs = jnp.asarray(confs, dtype=jnp.float32)
    squeeze = confs.ndim == 2
    if squeeze:
        confs = confs[None]
    chains, slices, _ = confs.shape
    R2, C = nh // LANE, LANE

    sl = split_mod.build_split(lat)
    a, b = split_mod.pack_classical(sl, confs)
    a = a.reshape(chains, slices, R2, C)
    b = b.reshape(chains, slices, R2, C)
    nslots = int(sl.w_ab.shape[0])
    wa = jnp.asarray(sl.w_ab[:, 0]).reshape(nslots, R2, C)
    wb = jnp.asarray(sl.w_ab[:, 1]).reshape(nslots, R2, C)
    ha = jnp.asarray(sl.h_ab[0]).reshape(R2, C)
    hb = jnp.asarray(sl.h_ab[1]).reshape(R2, C)
    m_flat = jnp.asarray(bath_matrix(lookuptable, slices),
                         jnp.float32).reshape(-1)

    a_s = np.asarray(a_sched, dtype=np.float32)
    b_s = np.asarray(b_sched, dtype=np.float32)
    if mcsteps > 1:
        a_s = np.repeat(a_s, mcsteps)
        b_s = np.repeat(b_s, mcsteps)
    total = int(a_s.shape[0])
    chunk = _align_sched_chunk(chunk, total)
    padded_len = _pad_up(total, chunk)
    a_p = np.ones(padded_len, np.float32)  # pad masked; keep log/tanh finite
    b_p = np.ones(padded_len, np.float32)
    a_p[:total] = a_s
    b_p[:total] = b_s

    cb = min(chain_block, chains)
    while chains % cb:
        cb -= 1

    a, b = _run_qmc_bath_split(
        jnp.asarray([int(seed)], jnp.int32), jnp.asarray(a_p),
        jnp.asarray(b_p), m_flat, wa, wb, ha, hb, a, b, cb=int(cb),
        chunk=chunk, total=total, K=L // 2, nslots=nslots,
        temp=float(temp), slices=int(slices), global_moves=global_moves,
        interpret=interpret, hw_rng=hw_rng,
    )
    out = split_mod.unpack_classical(
        sl, a.reshape(chains, slices, nh), b.reshape(chains, slices, nh)
    )
    return out[0] if squeeze else out


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
