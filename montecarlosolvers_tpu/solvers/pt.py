"""Parallel tempering (replica exchange) — a production extension beyond
the reference's capability surface (it has no replica-exchange component;
SURVEY.md §2), natural on TPU: the temperature ladder is a batch axis, and
swap moves are a masked permutation.

Replica i runs colored-Metropolis sweeps at temps[i]; after every
`swap_every` sweeps, adjacent pairs (alternating even/odd anchors per
attempt) exchange configurations with the standard acceptance

    p = min(1, exp((1/T_i - 1/T_j)(E_i - E_j))),

which preserves the product of Gibbs measures (validated by the exact
per-temperature histogram test in tests/test_pt.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from montecarlosolvers_tpu.ops.metropolis import (
    colored_metropolis_sweep,
    metropolis_accept,
)


def _swap_phase(problem, states, temps, key, parity):
    """One replica-exchange attempt across pairs (k, k+1), k % 2 == parity.

    states: (M, N); temps: (M,). Returns (states, accepted_mask (M,)).
    """
    M = temps.shape[0]
    e = problem.energy(states)  # (M,)
    beta = 1.0 / temps
    # pair anchor k swaps with k+1
    idx = jnp.arange(M)
    is_anchor = (idx % 2 == parity) & (idx + 1 < M)
    partner = jnp.where(is_anchor, idx + 1, jnp.where(
        (idx % 2 != parity) & (idx > 0), idx - 1, idx))
    # only anchors draw the decision; partner mirrors it
    delta = (beta - beta[jnp.clip(idx + 1, 0, M - 1)]) * (
        e - e[jnp.clip(idx + 1, 0, M - 1)]
    )
    u = jax.random.uniform(key, (M,))
    # log-form accept (floor-free; ops/metropolis.py): p = min(1, e^delta)
    accept_anchor = is_anchor & metropolis_accept(-delta, 1.0, u)
    # an index participates in a swap if it's an accepted anchor or the
    # partner of one
    accept = accept_anchor | jnp.roll(accept_anchor, 1)
    perm = jnp.where(accept, partner, idx)
    return states[perm], accept_anchor


@partial(jax.jit, static_argnames=("nsweeps", "swap_every", "collect_energy"))
def sample(problem, temps, states, key, nsweeps, swap_every=1,
           collect_energy=False):
    """Run parallel tempering.

    Args:
      problem: IsingProblem or LatticeProblem.
      temps: (M,) temperature ladder (ascending or descending).
      states: (M, N) one configuration per rung.
      nsweeps: total sweeps per replica.
      swap_every: exchange attempt cadence.

    Returns:
      (states, swap_rate) or (states, swap_rate, energies (nsweeps, M)).
    """
    temps = jnp.asarray(temps)
    keys = jax.random.split(key, nsweeps)

    M = temps.shape[0]

    from montecarlosolvers_tpu.models.dense import DenseProblem

    if isinstance(problem, DenseProblem):
        from montecarlosolvers_tpu.ops.dense_sweep import dense_metropolis_sweep

        def _sweep(states, k):
            # rungs are the chain axis; per-rung temps broadcast through
            # the per-chain acceptance of the dense engine
            return dense_metropolis_sweep(problem, states, k, temps)
    else:
        def _sweep(states, k):
            return colored_metropolis_sweep(problem, states, k, temps[:, None])

    def body(carry, k):
        states, nacc, npairs, natt = carry
        k1, k2, k3 = jax.random.split(k, 3)
        states = _sweep(states, k1)
        i = natt  # sweep counter doubles as swap parity clock
        do_swap = (i % swap_every) == 0
        parity = (i // swap_every) % 2

        def with_swap(states):
            return _swap_phase(problem, states, temps, k2, parity)

        states, acc = jax.lax.cond(
            do_swap, with_swap, lambda s: (s, jnp.zeros_like(temps, bool)),
            states,
        )
        # pairs actually attempted this step: anchors k%2==parity, k+1<M
        attempted = jnp.where(do_swap, (M - parity) // 2, 0)
        e = problem.energy(states) if collect_energy else None
        return (states, nacc + acc.sum(), npairs + attempted, natt + 1), e

    (states, nacc, npairs, _), es = jax.lax.scan(
        body, (states, jnp.asarray(0), jnp.asarray(0), jnp.asarray(0)), keys
    )
    swap_rate = nacc / jnp.maximum(npairs, 1)
    if collect_energy:
        return states, swap_rate, es
    return states, swap_rate


def geometric_ladder(t_min, t_max, num):
    """Geometric temperature ladder — the standard PT spacing.

    Sizing guidance (measured on the 80x80 benchmark): adjacent-rung swap
    acceptance needs the rung ratio - 1 to scale like 1/sqrt(N) (energy
    distributions must overlap). 16 rungs over [0.2, 3] gave a 4% swap
    rate at N = 6400; 96 rungs over [0.3, 2.5] gave 60%. Tune `num` until
    `sample`'s swap_rate lands in the 20-60% band.
    """
    return jnp.geomspace(t_min, t_max, num)
