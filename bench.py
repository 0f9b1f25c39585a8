"""Benchmark: spin-flip attempts/sec/chip on the 80x80 benchmark lattice.

Runs the hot path (SA colored-Metropolis sweeps, the engine shared by every
solver family) on whatever accelerator jax provides, with a chain batch
sized for TPU occupancy. Prints ONE JSON line; vs_baseline is against the
north-star 1e10 attempts/sec/chip (BASELINE.json).

Timing note: through the remote-TPU tunnel `block_until_ready` can return
before execution completes, so the timed region ends at a host-side fetch
of the result.
"""

from __future__ import annotations

import json
import time

import numpy as np
import jax
import jax.numpy as jnp


BASELINE_FLIPS_PER_SEC = 1.0e10


def _problem():
    try:
        from montecarlosolvers_tpu.models import instances

        problem, e_gs = instances.santoro_80x80()
        return problem, e_gs
    except Exception:
        from montecarlosolvers_tpu.models import instances

        problem, _ = instances.random_2d_lattice(80, rng=0)
        return problem, None


def main():
    from montecarlosolvers_tpu.solvers import sa
    from montecarlosolvers_tpu import schedules

    problem, e_gs = _problem()
    nspins = problem.nspins

    tau, chains = 4000, 256
    key = jax.random.key(0)
    sched = schedules.linear(3.0, 0.0, tau)
    s0 = sa.random_state(key, nspins, batch=(chains,))

    # Warm-up / compile (short schedule shares no cache with the long one,
    # so compile the real shape with a single timing throwaway).
    out = sa.anneal(problem, sched, s0, key)
    np.asarray(out)

    t0 = time.time()
    out = sa.anneal(problem, sched, s0, jax.random.key(1))
    es = np.asarray(problem.energy(out))  # host fetch ends the timed region
    dt = time.time() - t0

    attempts = float(tau) * nspins * chains
    rate = attempts / dt

    extra = {}
    if e_gs is not None:
        extra["eps_res"] = float((es.mean() - e_gs) / nspins)

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
