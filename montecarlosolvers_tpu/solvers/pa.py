"""Population annealing — weighted-ensemble thermal annealing.

The reference anneals independent chains (sa.Anneal, sa.pyx:19-101;
45 repetitions in the MST driver, examples/santoro80.py:258). Population
annealing (Hukushima & Iba 2003; Machta 2010; Weigel et al., "Monte
Carlo methods for massively parallel computers") is the literature-
standard massively-parallel extension of exactly that protocol: a
population of R replicas anneals down the same temperature schedule, but
between steps each replica is reweighted by exp(-dbeta*E) and resampled,
so the ensemble tracks the Gibbs distribution instead of falling out of
equilibrium. Free byproduct: an unbiased estimator of free-energy
differences, ln[Z(beta_end)/Z(beta_0)].

TPU-first design: the population is the batch axis through the same
engines solvers.sa uses (split-checkerboard for lattices, MXU blocked
for dense, masked colored otherwise), so the sweep hot path is identical
to `sa.anneal` at equal population. The PA-specific work per step — an
(R,) energy readout, a logsumexp, a cumsum and one row gather — is O(R)
against the O(R*N) sweep, and every piece is GSPMD-shardable over the
population axis (the resampling gather is the only cross-device traffic;
see __graft_entry__.dryrun_multichip's PA leg).

Resampling schemes:
  * "systematic" (default) — one uniform offset, stratified comb over the
    cumulative weights: lowest variance, the PA-literature standard.
  * "multinomial" — R independent categorical draws.

Weights accumulate across steps and the population resamples only when
the effective sample size drops below `ess_threshold * R` (the standard
always-resample protocol is ess_threshold=1.0, the default — with equal
weights ESS == R, so no-op resamples are skipped exactly).
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.scipy.special import logsumexp

from montecarlosolvers_tpu import schedules as sched_mod
from montecarlosolvers_tpu.ops.metropolis import colored_metropolis_sweep
from montecarlosolvers_tpu.ops import split as split_ops

SEGMENT = 100_000  # max schedule steps per device dispatch (see sa.SEGMENT)


def beta_linear(beta_end, num, beta_start=0.0):
    """Temperature schedule linear in BETA — the PA-native grid.

    A temperature-linear schedule (schedules.linear) has huge late dbeta
    jumps (1/T blows up as T -> 0) that collapse the effective sample
    size; PA quality is controlled by dbeta * std(E), so a uniform beta
    grid is the natural default. beta_start=0.0 makes the first
    temperature inf: a uniform-random population IS the exact Gibbs
    ensemble at beta=0, so ln Z estimates become absolute via
    uniform_log_z(n).
    """
    betas = np.linspace(beta_start, beta_end, num)
    with np.errstate(divide="ignore"):
        return jnp.asarray(1.0 / betas, jnp.float32)


def uniform_log_z(nspins):
    """ln Z at beta = 0 (2^N states): offset making `log_z` absolute when
    the run starts from uniform-random states at beta0 = 0."""
    return float(nspins) * float(np.log(2.0))


def _systematic_indices(key, w):
    """Stratified comb over the cumulative weights: index i draws the
    first replica j with cum[j] >= (i + u)/R. One uniform for the whole
    population; with equal weights this is exactly the identity."""
    r = w.shape[0]
    u = jax.random.uniform(key, (), dtype=w.dtype)
    cum = jnp.cumsum(w)
    pts = (jnp.arange(r, dtype=w.dtype) + u) / r
    return jnp.clip(jnp.searchsorted(cum, pts, side="left"), 0, r - 1)


@partial(jax.jit, static_argnames=("mcsteps", "resample", "collect_stats"))
def _run(problem, temps, state_in, key, logw, log_z, beta_prev, anc,
         mcsteps, resample, collect_stats, ess_threshold):
    """One jitted segment of the PA scan. Engine dispatch mirrors
    pt.sample: the population is the chain axis of the same sweep
    kernels, and the resample is a leading-axis row gather."""
    from montecarlosolvers_tpu.models.dense import DenseProblem

    if isinstance(problem, DenseProblem):
        from montecarlosolvers_tpu.ops.dense_sweep import dense_metropolis_sweep

        state = state_in

        def _sweep(state, k, t):
            return dense_metropolis_sweep(problem, state, k, t)

        _energy = problem.energy
        _permute = lambda s, idx: s[idx]  # noqa: E731
        _unpack = lambda s: s  # noqa: E731
    elif split_ops.supports_split(problem):
        sl = split_ops.build_split(problem)
        state = split_ops.pack_classical(sl, state_in)

        def _sweep(state, k, t):
            return split_ops.sa_split_sweep(sl, *state, k, t)

        def _energy(state):
            return split_ops.classical_energy_split(sl, *state)

        def _permute(state, idx):
            return tuple(x[idx] for x in state)

        def _unpack(state):
            return split_ops.unpack_classical(sl, *state)
    else:
        state = state_in

        def _sweep(state, k, t):
            return colored_metropolis_sweep(problem, state, k, t)

        _energy = problem.energy
        _permute = lambda s, idx: s[idx]  # noqa: E731
        _unpack = lambda s: s  # noqa: E731

    r = logw.shape[0]
    log_r = jnp.float32(np.log(r))

    def body(carry, x):
        state, logw, log_z, beta_prev, anc = carry
        temp, k = x
        k_rs, k_sweep = jax.random.split(k)
        beta = 1.0 / temp
        e = _energy(state).astype(jnp.float32)
        logw = logw - (beta - beta_prev) * e
        # normalize to mean weight 1, rolling the normalizer into log_z:
        # log_z accumulates ln[Z(beta)/Z(beta_prev)] estimates regardless
        # of whether this step resamples (standard SMC accounting)
        c = logsumexp(logw) - log_r
        log_z = log_z + c
        logw = logw - c
        w = jnp.exp(logw - log_r)  # normalized, sums to 1
        ess = 1.0 / jnp.sum(w * w)
        do_rs = ess < ess_threshold * r
        if resample == "systematic":
            idx = _systematic_indices(k_rs, w)
        else:  # multinomial
            idx = jax.random.categorical(k_rs, logw, shape=(r,))
        idx = jnp.where(do_rs, idx, jnp.arange(r))
        state = _permute(state, idx)
        anc = anc[idx]  # surviving-family lineage (Wang-Machta-Katzgraber)
        logw = jnp.where(do_rs, jnp.zeros_like(logw), logw)
        for i in range(mcsteps):
            state = _sweep(state, jax.random.fold_in(k_sweep, i), temp)
        stats = (ess, jnp.mean(e), do_rs) if collect_stats else None
        return (state, logw, log_z, beta, anc), stats

    keys = jax.random.split(key, temps.shape[0])
    (state, logw, log_z, beta_prev, anc), stats = jax.lax.scan(
        body, (state, logw, log_z, beta_prev, anc), (temps, keys)
    )
    return _unpack(state), logw, log_z, beta_prev, anc, stats


def sample(problem, temps, states, key, mcsteps=1, beta0=None,
           ess_threshold=1.0, resample="systematic", collect_stats=False,
           segment=SEGMENT):
    """Population-annealing run down the temperature schedule `temps`.

    Args:
      problem: IsingProblem / LatticeProblem / DenseProblem.
      temps: (S,) temperatures, all > 0 (inf allowed for beta = 0 grid
        points — see beta_linear). Each step reweights the population
        from the previous step's inverse temperature to 1/temps[k],
        resamples if ESS dropped below `ess_threshold * R`, then runs
        `mcsteps` sweeps at temps[k].
      states: (R, N) +/-1 population. For an absolute ln Z (beta0=0.0)
        this must be uniform random — the exact beta = 0 ensemble.
      key: PRNG key (deterministic replay, AnnealMA-style).
      beta0: inverse temperature the initial population is equilibrated
        at. Default None = 1/temps[0] (first reweight is a no-op; the
        SA-style usage). Pass 0.0 with uniform-random states for
        absolute free energies: ln Z(beta_end) = log_z + uniform_log_z(N).
      ess_threshold: resample when ESS < ess_threshold * R. 1.0 (default)
        = the standard every-step protocol (equal-weight steps skip the
        no-op exactly); lower values trade resampling-correlation for
        weight variance.
      resample: "systematic" (default) or "multinomial".
      collect_stats: also return per-step (ess, e_mean, resampled) arrays.
      segment: max schedule steps per device dispatch (sa.anneal's
        watchdog-safe segmentation; None disables).

    Returns:
      (states, log_z[, stats]): the final (R, N) population, the
      accumulated ln[Z(1/temps[-1]) / Z(beta0)] estimator, and — when
      collect_stats — a dict with "ess" (S,), "e_mean" (S,),
      "resampled" (S,), and "families" (int: surviving distinct initial
      lineages; R/families is the mean family size rho_t, the standard
      PA equilibration diagnostic). With ess_threshold=1.0 the returned population
      is equally weighted; below it, residual weights were normalized
      into log_z and the final population is weighted by exp(logw)
      (not returned; resample at the end by passing ess_threshold=1.0
      for the last step, or keep the default).
    """
    temps = jnp.asarray(temps, jnp.float32)
    beta_prev = jnp.float32(beta0 if beta0 is not None else 1.0 / temps[0])
    r = states.shape[0]
    logw = jnp.zeros((r,), jnp.float32)
    log_z = jnp.float32(0.0)
    anc = jnp.arange(r, dtype=jnp.int32)
    segs = sched_mod.segments(temps.shape[0], segment)
    stats_parts = []
    for lo, hi in segs:
        k = key if len(segs) == 1 else jax.random.fold_in(key, lo)
        states, logw, log_z, beta_prev, anc, stats = _run(
            problem, temps[lo:hi], states, k, logw, log_z, beta_prev, anc,
            mcsteps, resample, collect_stats,
            jnp.float32(ess_threshold),
        )
        if collect_stats:
            stats_parts.append(stats)
    if collect_stats:
        ess, e_mean, rs = (
            stats_parts[0]
            if len(stats_parts) == 1
            else tuple(jnp.concatenate(p) for p in zip(*stats_parts))
        )
        # surviving families: replicas descending from distinct initial
        # states — the PA literature's equilibration health metric
        # (R/families is the effective lineage multiplicity rho_t)
        families = int(np.unique(np.asarray(anc)).size)
        return states, log_z, {"ess": ess, "e_mean": e_mean,
                               "resampled": rs, "families": families}
    return states, log_z
