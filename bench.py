"""Benchmark: spin-flip attempts/sec/chip on the 80x80 benchmark lattice.

Runs the production hot path — the split-checkerboard engine
(ops/split.py: maskless half-array phases, flat Nh lane layout, rbg
counter PRNG) through the public solver API — on whatever accelerator jax
provides. Prints ONE JSON line; vs_baseline is against the north-star 1e10
attempts/sec/chip (BASELINE.json).

Timing notes: each rate is measured as a two-point slope
(t(tau2) - t(tau1)) / (tau2 - tau1), which subtracts the fixed per-call
dispatch/tunnel overhead (~0.3s through the axon tunnel — at tau=1000
that overhead alone would halve the apparent rate). The timed region ends
at a small host-side reduction fetch: through the remote-TPU tunnel
`block_until_ready` can return before execution completes, and fetching
the full state would time the 8MB tunnel transfer instead of the compute.
The Pallas fused kernels are NOT used here: the axon remote-compile
service compiles Mosaic kernels pathologically slowly (minutes for a
trivial block); the XLA path below already exceeds the target.
"""

from __future__ import annotations

import json
import time

import numpy as np
import jax

# rbg: counter-based PRNG with much higher TPU throughput than threefry2x32
# (measured 1.7x end-to-end on this benchmark); still splittable + stable.
jax.config.update("jax_default_prng_impl", "rbg")

BASELINE_FLIPS_PER_SEC = 1.0e10


def _problem():
    from montecarlosolvers_tpu.models import instances

    try:
        return instances.santoro_80x80(lattice=True)
    except FileNotFoundError:
        problem, _ = instances.random_2d_lattice(80, rng=0, lattice=True)
        return problem, None


def _slope(run, tau1, tau2, trials=3):
    """Best-of-trials two-point slope: seconds per schedule step."""
    t_at = {}
    for tau in (tau1, tau2):
        run(tau, 0)  # compile + warm
        best = np.inf
        for t in range(trials):
            t0 = time.time()
            run(tau, 1 + t)
            best = min(best, time.time() - t0)
        t_at[tau] = best
    return (t_at[tau2] - t_at[tau1]) / (tau2 - tau1)


def _sa_rate(problem):
    """SA throughput at the measured-optimal 640 chains (5x128 batch
    tiles), plus eps_res quality from the tau2 run."""
    import jax.numpy as jnp
    from montecarlosolvers_tpu.solvers import sa
    from montecarlosolvers_tpu import schedules

    chains, tau1, tau2 = 640, 2000, 6000
    s0 = sa.random_state(jax.random.key(0), problem.nspins, batch=(chains,))
    out_ref = [None]

    def run(tau, seed):
        out = sa.anneal(
            problem, schedules.linear(3.0, 0.0, tau), s0, jax.random.key(seed)
        )
        float(jnp.sum(out[..., 0]))  # force completion, tiny fetch
        out_ref[0] = out

    per_step = _slope(run, tau1, tau2)
    es = np.asarray(problem.energy(out_ref[0]))
    return problem.nspins * chains / per_step, es


def _piqmc_rate(problem):
    """PIQMC local+global-move throughput at the benchmark's P=40,
    chains=16 (the measured VMEM-resident sweet spot)."""
    import jax.numpy as jnp
    from montecarlosolvers_tpu.solvers import sa, qmc
    from montecarlosolvers_tpu import schedules

    P, chains, tau1, tau2 = 40, 16, 1000, 3000
    key = jax.random.key(2)
    confs = qmc.replicate(
        sa.random_state(key, problem.nspins, batch=(chains,)), P
    )

    def run(tau, seed):
        a = schedules.transverse_field(3.0, 1e-8, tau)
        out = qmc.anneal(
            problem, a, jnp.ones_like(a), 1.0 / P, confs,
            jax.random.key(seed), global_moves=True,
        )
        float(jnp.sum(out[..., 0, 0]))

    per_step = _slope(run, tau1, tau2)
    return problem.nspins * P * chains / per_step


def main():
    problem, e_gs = _problem()

    rate, es = _sa_rate(problem)

    extra = {}
    if e_gs is not None:
        extra["eps_res"] = float((es.mean() - e_gs) / problem.nspins)
    try:
        extra["piqmc_attempts_per_sec"] = _piqmc_rate(problem)
    except Exception:
        pass

    print(
        json.dumps(
            {
                "metric": "sa_flip_attempts_per_sec_per_chip",
                "value": rate,
                "unit": "attempts/s",
                "vs_baseline": rate / BASELINE_FLIPS_PER_SEC,
                **extra,
            }
        )
    )


if __name__ == "__main__":
    main()
