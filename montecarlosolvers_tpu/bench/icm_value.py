"""ICM value experiment (round 5; VERDICT r4 missing #1).

results/pt_value measured ICM (Houdayer cluster moves + parallel
tempering, solvers/pt.sample_icm) on the 2D santoro benchmark and found
the cluster phases cost ~85x the sweeps they accompany while the 2D
landscape never rewards them. The spin-glass literature's claim
(Houdayer 2001; Zhu, Ochoa, Katzgraber 2015) is that the moves pay on
3D Edwards-Anderson-class landscapes — valleys separated by system-wide
droplets that local+exchange dynamics cannot cross. This experiment
measures that claim on TPU at equal WALL-CLOCK:

  * Instances: 3D EA +/-J, L in {8, 10} periodic (models/instances.
    random_3d_lattice), several disorder seeds. T_c ~ 1.1; the ladder's
    cold end sits far below (0.3). SK is deliberately excluded: on a
    complete graph the q = -1 overlap domain is a single component, so
    the Houdayer move degenerates to a relabeling (sample_icm docstring)
    — there is no sparse structure for the cluster to exploit.
  * Arms per instance: ICM at Houdayer cadences {2, 8, 32} sweeps, and
    the PT-only baseline = the SAME sampler with houdayer_every=0 (the
    two ladders run independent PT through the identical code path, so
    the Houdayer phases are the ONLY difference).
  * Equal wall: every arm runs in SEG-sweep segments with per-segment
    cumulative best energy and wall recorded; the PT baseline runs until
    it has covered the slowest ICM arm's wall, so any ICM point can be
    compared against PT's best at the same (or larger) wall.
  * Mechanism metrics: Houdayer flip fraction (the q = -1 domain mass
    that actually moves), swap rates, measured per-phase cluster cost
    (the jump-labeling path, ops/cluster._label_components jump_every).

Metric: best energy ever found (any rung, any ladder; per-sweep energies
are collected, so time-to-target curves come for free), plus the cold-
rung sampling mean over the final half. e_ref per instance = best energy
any arm ever found; +/-J energies are integer-quantized so hitting e_ref
exactly is meaningful.

Writes results/icm_value/summary.json (resume-cached by arm name).
"""

from __future__ import annotations

import json
import os
import time

import numpy as np
import jax
import jax.numpy as jnp

from montecarlosolvers_tpu.models import instances
from montecarlosolvers_tpu.solvers import sa, pt
from montecarlosolvers_tpu.bench._common import make_recorder


L_SIZES = (8, 10)
SEEDS = (0, 1, 2)
RUNGS = 24
SEG = 500            # sweeps per segment (one device dispatch)
ICM_SEGS = 8         # 4000 sweeps per ICM arm
CADENCES = (2, 8, 32)
T_COLD, T_HOT = 0.3, 1.6


def _run_segments(problem, temps, s0, key, n_segs, houdayer_every,
                  max_wall=None, grid_bonds=None):
    """Run sample_icm in SEG-sweep segments, carrying states; returns a
    per-segment record list and the final states. Stops early when
    max_wall (seconds of accumulated measured wall) is exceeded."""
    states = s0
    recs = []
    e_best = np.inf
    wall = 0.0
    for seg in range(n_segs):
        k = jax.random.fold_in(key, seg)
        t0 = time.time()
        states, rate, hfrac, es = pt.sample_icm(
            problem, temps, states, k, SEG, swap_every=2,
            houdayer_every=houdayer_every, collect_energy=True,
            grid_bonds=grid_bonds,
        )
        es = np.asarray(es)  # (SEG, 2, M) rung-ordered
        dt = time.time() - t0
        wall += dt
        e_best = min(e_best, float(es.min()))
        recs.append(dict(
            wall_s=round(wall, 3),
            sweeps=(seg + 1) * SEG,
            e_best=e_best,
            e_cold=float(es[SEG // 2:, :, 0].mean()),
            swap_rate=float(rate),
            h_frac=float(hfrac),
        ))
        if max_wall is not None and wall >= max_wall:
            break
    return recs, states


def run_instance(L, seed, key, record):
    from montecarlosolvers_tpu.ops.cluster import grid_bonds_from_edges

    problem, (rows, cols, vals) = instances.random_3d_lattice(
        L, rng=seed, dist="pm1"
    )
    gb = grid_bonds_from_edges((L, L, L), rows, cols, vals)
    n = problem.nspins
    k_init, k_tune, k_run = jax.random.split(key, 3)
    s0 = sa.random_state(k_init, n, batch=(2, RUNGS))

    def arm_tune():
        temps0 = pt.geometric_ladder(T_COLD, T_HOT, RUNGS)
        temps, pair_rates = pt.tune_ladder(
            problem, temps0, k_tune, rounds=3, sweeps_per_round=200
        )
        return dict(
            temps=[float(t) for t in np.asarray(temps)],
            pair_rate_min=float(np.min(pair_rates)),
            pair_rate_mean=float(np.mean(pair_rates)),
        )

    tune = record(f"tune_L{L}_s{seed}", arm_tune)
    if tune is None:
        return
    temps = jnp.asarray(tune["temps"], jnp.float32)

    # --- ICM arms, one per cadence --------------------------------------
    max_wall = 0.0
    for h in CADENCES:
        def arm_icm(h=h):
            # warm segment (compile) outside the recorded walls
            _ = _run_segments(problem, temps, s0,
                              jax.random.fold_in(k_run, 9000 + h), 1, h,
                              grid_bonds=gb)
            recs, _ = _run_segments(
                problem, temps, s0, jax.random.fold_in(k_run, h),
                ICM_SEGS, h, grid_bonds=gb,
            )
            return dict(segments=recs)

        out = record(f"icm_h{h}_L{L}_s{seed}", arm_icm)
        if out:
            max_wall = max(max_wall, out["segments"][-1]["wall_s"])

    # --- PT baseline: same code path, no Houdayer, run to max ICM wall --
    def arm_pt():
        _ = _run_segments(problem, temps, s0,
                          jax.random.fold_in(k_run, 9999), 1, 0)
        # cover the slowest ICM arm's wall with margin (cap the segment
        # count so a mis-measured wall cannot run away)
        recs, _ = _run_segments(
            problem, temps, s0, jax.random.fold_in(k_run, 7),
            n_segs=400, houdayer_every=0, max_wall=max(max_wall * 1.1, 1.0),
        )
        return dict(segments=recs)

    record(f"pt_L{L}_s{seed}", arm_pt)


def summarize(done):
    """Equal-wall verdict per instance: for each ICM arm's final point,
    PT's best energy at the same-or-larger wall."""
    out = {}
    for L in L_SIZES:
        for seed in SEEDS:
            ptk = f"pt_L{L}_s{seed}"
            if ptk not in done:
                continue
            pt_recs = done[ptk]["segments"]
            arms = {}
            e_ref = min(r["e_best"] for r in pt_recs)
            for h in CADENCES:
                k = f"icm_h{h}_L{L}_s{seed}"
                if k in done:
                    e_ref = min(
                        e_ref, min(r["e_best"] for r in done[k]["segments"])
                    )
            n = L ** 3
            for h in CADENCES:
                k = f"icm_h{h}_L{L}_s{seed}"
                if k not in done:
                    continue
                last = done[k]["segments"][-1]
                # PT's best at wall <= the ICM arm's wall (PT covered
                # >= that wall, so take the last qualifying segment; if
                # even PT's first segment exceeds it, use the first)
                cand = [r for r in pt_recs if r["wall_s"] <= last["wall_s"]]
                ptb = cand[-1] if cand else pt_recs[0]
                arms[f"h{h}"] = dict(
                    icm_eps=round((last["e_best"] - e_ref) / n, 6),
                    pt_eps=round((ptb["e_best"] - e_ref) / n, 6),
                    icm_wall=last["wall_s"],
                    pt_wall=ptb["wall_s"],
                    icm_sweeps=last["sweeps"],
                    pt_sweeps=ptb["sweeps"],
                    h_frac=done[k]["segments"][-1]["h_frac"],
                    winner=(
                        "icm" if last["e_best"] < ptb["e_best"]
                        else "pt" if ptb["e_best"] < last["e_best"]
                        else "tie"
                    ),
                )
            out[f"L{L}_s{seed}"] = dict(e_ref=e_ref, arms=arms)
    return out


def main(outdir="results/icm_value", budget_s=2400):
    from montecarlosolvers_tpu.utils.xla_cache import enable_persistent_cache

    enable_persistent_cache()
    os.makedirs(outdir, exist_ok=True)
    path = os.path.join(outdir, "summary.json")
    done = {}
    if os.path.exists(path):
        with open(path) as f:
            done = json.load(f)
    record = make_recorder(path, done, budget_s=budget_s)

    key = jax.random.key(5)
    for L in L_SIZES:
        for seed in SEEDS:
            run_instance(L, seed, jax.random.fold_in(key, 100 * L + seed),
                         record)

    done["equal_wall_verdicts"] = summarize(done)
    with open(path, "w") as f:
        json.dump(done, f, indent=2)
    print(json.dumps(done["equal_wall_verdicts"], indent=2))
    return done


if __name__ == "__main__":
    main()
