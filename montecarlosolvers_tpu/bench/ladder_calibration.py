"""_auto_ladder calibration across N (round 5; VERDICT r4 weak #7).

solvers/api._auto_ladder sizes PT ladders from the 1/sqrt(N) overlap
rule with a constant c that round 4 calibrated from ONE anchor point
(48 rungs, N=6400 lattice, swap rate 0.34). This driver measures the
realized swap rate of the auto-sized ladder at N in {256, 1024, 6400,
16384} on 2D Gaussian lattices and N in {256, 1024, 2048} on SK (dense
engine), so the constant is backed by a measured table instead of one
anchor. tests/test_api.py asserts the 20-60% band at the CPU-sized
points.

Writes results/ladder_calibration.json: per config the rung count the
rule chose, the measured swap rate, and (when outside the band) the
c that WOULD have centered it — the fit signal for retuning.
"""

from __future__ import annotations

import json
import os

import numpy as np
import jax

from montecarlosolvers_tpu.models import instances
from montecarlosolvers_tpu.solvers import sa, pt
from montecarlosolvers_tpu.solvers.api import _auto_ladder
from montecarlosolvers_tpu.bench._common import make_recorder

T_MIN, T_MAX = 0.5, 2.5
SWEEPS = 300


def _measure(problem, n, key, sweeps=SWEEPS):
    m = _auto_ladder(n, T_MIN, T_MAX)
    temps = pt.geometric_ladder(T_MIN, T_MAX, m)
    s0 = sa.random_state(key, n, batch=(m,))
    _, rate, pair = pt.sample(
        problem, temps, s0, key, sweeps, swap_every=2, per_pair_rates=True
    )
    rate = float(rate)
    out = dict(
        nspins=n, rungs=m, swap_rate=round(rate, 4),
        pair_rate_min=round(float(np.min(pair)), 4),
        in_band=bool(0.2 <= rate <= 0.6),
    )
    if not out["in_band"] and 0.0 < rate < 1.0:
        # invert the spacing rule: swap ~ overlap(dbeta * std(E)); to
        # first order moving the rate to 0.4 rescales ln-spacing by
        # ln(0.4)/ln(rate), i.e. c_fit = 2.5 * ln(rate)/ln(0.4)
        out["c_to_center"] = round(2.5 * np.log(rate) / np.log(0.4), 2)
    return out


def main(outdir="results/ladder_calibration", budget_s=1200):
    from montecarlosolvers_tpu.utils.xla_cache import enable_persistent_cache

    enable_persistent_cache()
    os.makedirs(outdir, exist_ok=True)
    path = os.path.join(outdir, "summary.json")
    done = {}
    if os.path.exists(path):
        with open(path) as f:
            done = json.load(f)
    record = make_recorder(path, done, budget_s=budget_s)
    key = jax.random.key(21)

    for L in (16, 32, 80, 128):
        def arm(L=L):
            problem, _ = instances.random_2d_lattice(L, rng=L, lattice=True)
            return _measure(problem, L * L, jax.random.fold_in(key, L))

        record(f"lattice_N{L * L}", arm)

    for n in (256, 1024, 2048):
        def arm(n=n):
            problem, _ = instances.sk_model(n, rng=n)
            return _measure(problem, n, jax.random.fold_in(key, 10 * n))

        record(f"sk_N{n}", arm)

    print(json.dumps(done, indent=2))
    return done


if __name__ == "__main__":
    main()
