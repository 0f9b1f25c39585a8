"""Martonak–Santoro–Tosatti benchmark reproduction harness.

TPU-native re-design of the reference's experiment driver
(examples/santoro80.py:12-323, `martonak_paper` + `plot_sontoro`):

  * The 45-repetition loop (examples/santoro80.py:258) is a single vmapped
    chain batch — one device launch per (tau, config) point instead of 45
    sequential kernel calls.
  * Protocol parameters match the reference exactly: tau in
    geomspace(60, 6e6, 14), mcsteps=1, SA schedule T: 3->0, PIQMC with
    PT in {1} x P in {5,10,20,40}, T = PT/P, Gamma: 3.0 (2.5 if PT != 1)
    -> 1e-8, B = 1, pre-anneal T: 3.0 -> PT in 0.05 steps at 100
    sweeps/step (examples/santoro80.py:250-285).
  * Incremental .npz checkpointing per tau point mirrors the reference's
    crude-but-effective resumability (examples/santoro80.py:254-265):
    a killed run re-runs only missing points.
  * Readout: best-slice classical energy (examples/santoro80.py:290-296),
    residual energy per spin vs the certified ground state.
"""

from __future__ import annotations

import json
import os
import time
import zlib

import numpy as np
import jax
import jax.numpy as jnp

from montecarlosolvers_tpu.solvers import sa, qmc
from montecarlosolvers_tpu import schedules


DEFAULT_TAUS = np.unique(np.geomspace(60, 6e6, 14).astype(np.int64))
DEFAULT_EXPS = ((1, 5), (1, 10), (1, 20), (1, 40))


def sa_arm(problem, tau, reps, key, pre_temp=3.0):
    """One SA point: `reps` chains annealed T: pre_temp -> 0 over tau steps
    (examples/santoro80.py:258-262). Returns per-chain energies."""
    k1, k2 = jax.random.split(key)
    s0 = sa.random_state(k1, problem.nspins, batch=(reps,))
    sched = schedules.linear(pre_temp, 0.0, int(tau))
    out = sa.anneal(problem, sched, s0, k2)
    return np.asarray(problem.energy(out))


def piqmc_arm(problem, tau, reps, key, pt=1.0, slices=40, pre_temp=3.0,
              global_moves=True, chunk=8, segment=25_000):
    """One PIQMC point following the full MST protocol
    (examples/santoro80.py:269-296): pre-anneal, replicate, Gamma-anneal,
    best-slice readout. Returns per-chain best-slice energies.

    Chains run in chunks of `chunk` so the (chunk, P, N) Trotter state
    stays VMEM-resident (throughput collapses ~4x once it spills to HBM).
    Schedules longer than `segment` steps run as several dispatches with
    per-segment keys — long single dispatches can trip remote-TPU
    watchdogs (ARCHITECTURE.md §8), and segment boundaries also bound the
    compile count for very long anneals.
    """
    temp = pt / slices
    fieldstart = 3.0 if pt == 1 else 2.5
    pre = schedules.pre_anneal_schedule(pre_temp, pt)
    a_full = np.asarray(
        schedules.transverse_field(fieldstart, 1e-8, int(tau))
    )
    outs = []
    done = 0
    while done < reps:
        n = min(chunk, reps - done)
        kc = jax.random.fold_in(key, done)
        k1, k2, k3 = jax.random.split(kc, 3)
        s0 = sa.random_state(k1, problem.nspins, batch=(n,))
        s0 = sa.anneal(problem, pre, s0, k2, mcsteps=100)
        confs = qmc.replicate(s0, slices)
        for seg_i in range(0, len(a_full), segment):
            a = jnp.asarray(a_full[seg_i:seg_i + segment])
            confs = qmc.anneal(
                problem, a, jnp.ones_like(a), temp, confs,
                jax.random.fold_in(k3, seg_i), global_moves=global_moves,
            )
        outs.append(np.asarray(qmc.best_slice_energy(problem, confs)))
        done += n
    return np.concatenate(outs)


def mst_benchmark(problem, e_gs, outdir="mst_results", taus=None, reps=45,
                  exps=DEFAULT_EXPS, seed=0, max_tau=None, verbose=True):
    """Run the full SA-vs-PIQMC residual-energy sweep with incremental
    checkpointing. Returns {name: (taus, eps_res_means)}.

    Each completed (arm, tau) point is written to `outdir` immediately
    (the reference's incremental np.save pattern,
    examples/santoro80.py:254-265) and skipped on re-run.
    """
    os.makedirs(outdir, exist_ok=True)
    taus = DEFAULT_TAUS if taus is None else np.asarray(taus)
    if max_tau is not None:
        taus = taus[taus <= max_tau]
    nspins = problem.nspins
    key = jax.random.key(seed)
    results = {}

    def point(name, fn):
        path = os.path.join(outdir, f"{name}.npz")
        if os.path.exists(path):
            d = np.load(path)
            return float(d["eps"]), False
        energies = fn()
        eps = float((energies.mean() - e_gs) / nspins)
        np.savez(path, energies=energies, eps=eps)
        return eps, True

    t_start = time.time()
    arms = [("CA", None)] + [(f"PT={pt}_P={p}", (pt, p)) for pt, p in exps]
    for name, cfg in arms:
        xs, ys = [], []
        for i, tau in enumerate(taus):
            # stable digest (python hash() is salted per process)
            kp = jax.random.fold_in(
                key, zlib.crc32(f"{name}:{int(tau)}".encode()) & 0x7FFFFFFF
            )
            if cfg is None:
                eps, fresh = point(
                    f"CA_tau{tau}", lambda: sa_arm(problem, tau, reps, kp)
                )
                xs.append(int(tau))
            else:
                pt, p = cfg
                eps, fresh = point(
                    f"{name}_tau{tau}",
                    lambda: piqmc_arm(problem, tau, reps, kp, pt=pt, slices=p),
                )
                xs.append(int(tau) * p)  # total sweeps across replicas
            ys.append(eps)
            if verbose:
                mark = "ran" if fresh else "cached"
                print(
                    f"[{time.time()-t_start:7.1f}s] {name} tau={tau}: "
                    f"eps_res={eps:.5f} ({mark})",
                    flush=True,
                )
        results[name] = (np.asarray(xs), np.asarray(ys))

    with open(os.path.join(outdir, "summary.json"), "w") as f:
        json.dump(
            {k: {"tau": v[0].tolist(), "eps": v[1].tolist()}
             for k, v in results.items()},
            f, indent=2,
        )
    return results


def summarize_dir(outdir, nspins, e_gs, exps=DEFAULT_EXPS):
    """Rebuild {name: (total_sweeps, eps)} purely from the cached point
    files in `outdir` — no compute. Tolerates ragged arms (points missing
    for some configs, e.g. after an aborted run)."""
    import glob
    import re

    results = {}
    arms = [("CA", 1)] + [(f"PT={pt}_P={p}", p) for pt, p in exps]
    for name, mult in arms:
        xs, ys = [], []
        for path in glob.glob(os.path.join(outdir, f"{name}_tau*.npz")):
            m = re.search(r"_tau(\d+)\.npz$", path)
            if not m:
                continue
            d = np.load(path)
            xs.append(int(m.group(1)) * mult)
            ys.append(float(d["eps"]))
        if xs:
            order = np.argsort(xs)
            results[name] = (np.asarray(xs)[order], np.asarray(ys)[order])
    with open(os.path.join(outdir, "summary.json"), "w") as f:
        json.dump(
            {k: {"tau": v[0].tolist(), "eps": v[1].tolist()}
             for k, v in results.items()},
            f, indent=2,
        )
    return results


def plot_results(results, path=None):
    """Log-log eps_res vs tau, one curve per arm (the reference's
    plot_sontoro, examples/santoro80.py:304-323). Returns the figure."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots()
    for idx, (name, (xs, ys)) in enumerate(results.items()):
        style = dict(marker="x", ls="-")
        if name == "CA":
            style["color"] = "k"
        ax.plot(xs, ys, label=name, **style)
    ax.set_xscale("log")
    ax.set_yscale("log")
    ax.set_xlabel(r"$\tau$ (total sweeps)")
    ax.set_ylabel(r"$\epsilon_{res}$")
    ax.legend()
    if path:
        fig.savefig(path, dpi=120, bbox_inches="tight")
    return fig
