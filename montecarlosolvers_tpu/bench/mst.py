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

import glob
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


class BudgetExceeded(Exception):
    """Raised when a run hits its wall-clock budget; the caller exits and
    an outer loop restarts the process (remote-TPU workers degrade past
    ~20 min of device time — ARCHITECTURE.md §8). All finished work is on
    disk, so the restart resumes at the first missing chunk."""


def sa_arm(problem, tau, reps, key, pre_temp=3.0, deadline=None):
    """One SA point: `reps` chains annealed T: pre_temp -> 0 over tau steps
    (examples/santoro80.py:258-262). Returns per-chain energies.

    Dispatch-length safety lives in the solver (sa.anneal's `segment`,
    VERDICT r3 #9): without a `deadline` the whole tau=6e6 schedule is
    ONE call. With `deadline` (absolute time.time()) the call is issued
    per SEGMENT-sized window purely as a BUDGET CHECKPOINT — the window
    keys fold exactly as the solver's internal segmentation does
    (fold_in at the absolute segment start; unfolded when single), so
    the trajectory is bitwise the single-call one, and BudgetExceeded
    fires between windows at the last window's measured cost (a
    projection-only check would let a degraded-throughput point overrun
    unboundedly — review r4)."""
    k1, k2 = jax.random.split(key)
    s0 = sa.random_state(k1, problem.nspins, batch=(reps,))
    sched = np.linspace(pre_temp, 0.0, int(tau), dtype=np.float32)
    # pad to a compile bucket: NaN steps are exact no-ops (VERDICT r3 #8),
    # so a 14-tau matrix compiles <=3 SA program shapes instead of 14
    sched = np.asarray(schedules.pad_schedule(sched, sa.SEGMENT))
    if deadline is None:
        # segment passed explicitly so both paths read sa.SEGMENT at call
        # time (the solver default binds it at def time)
        out = sa.anneal(problem, jnp.asarray(sched), s0, k2,
                        segment=sa.SEGMENT)
        return np.asarray(problem.energy(out))
    segs = schedules.segments(len(sched), sa.SEGMENT)
    out = s0
    win_cost = 0.0
    for lo, hi in segs:
        if time.time() + win_cost > deadline:
            raise BudgetExceeded(f"SA tau={tau} at step {lo}")
        t_win = time.time()
        k = k2 if len(segs) == 1 else jax.random.fold_in(k2, lo)
        out = sa.anneal(problem, jnp.asarray(sched[lo:hi]), out, k)
        float(jnp.sum(out[..., 0]))  # sync for an honest window cost
        win_cost = time.time() - t_win
    return np.asarray(problem.energy(out))


def piqmc_arm(problem, tau, reps, key, pt=1.0, slices=40, pre_temp=3.0,
              global_moves=True, chunk=32, cache_prefix=None, deadline=None):
    """One PIQMC point following the full MST protocol
    (examples/santoro80.py:269-296): pre-anneal, replicate, Gamma-anneal,
    best-slice readout. Returns per-chain best-slice energies.

    Chains run in chunks of `chunk` so the (chunk, P, N) Trotter state
    stays VMEM-resident (throughput collapses ~4x once it spills to HBM;
    32 is the bfloat16-carry sweet spot at P=40 — see
    ops/split.qmc_anneal_split. Re-running a pre-bf16 cached point needs
    chunk=16 or a fresh cache_prefix: cached chunks are validated
    against the chunk size).
    Dispatch-length safety lives in the solver now (qmc.anneal's
    `segment`, VERDICT r3 #9): the whole Gamma schedule is ONE call that
    never holds the remote-TPU tunnel past ~1 min per dispatch.

    With `cache_prefix`, each finished chunk is checkpointed to
    `<cache_prefix>.chunk<i>.npz` and skipped on re-run (cache entries are
    validated against the current chunk size), so a long point (tau = 6e6
    at P = 40 is ~45 min of device time) survives process restarts;
    `deadline` (absolute time.time()) raises BudgetExceeded before
    starting a chunk that — at the last computed chunk's measured cost —
    would overrun it.
    """
    temp = pt / slices
    fieldstart = 3.0 if pt == 1 else 2.5
    pre = schedules.pre_anneal_schedule(pre_temp, pt)
    # host-side numpy: jnp.linspace + np.asarray would compute the 6M-
    # element schedule on device and fetch it through the tunnel per call.
    # NaN-padded to a compile bucket (exact no-op steps, VERDICT r3 #8):
    # the whole 14-tau matrix compiles <=3 PIQMC program shapes per arm.
    a_full = schedules.pad_schedule(
        np.linspace(fieldstart, 1e-8, int(tau), dtype=np.float32),
        qmc.SEGMENT,
    )
    # B pads must be NaN too: global line moves depend on B alone, so a
    # real B on a pad step would execute them
    b_full = jnp.where(jnp.isnan(a_full), jnp.nan, 1.0)
    outs = []
    done = 0
    # Seed the per-chunk cost estimate with an optimistic device-rate floor
    # (2.5e10 attempts/s, a conservative bound on the measured 3.3e10 v5e
    # PIQMC rate — overestimating cost aborts earlier, never later) so even the FIRST
    # chunk of a point cannot silently overrun a tight deadline by its full
    # ~9 min; once a chunk is measured, the larger of the two is used.
    cost_floor = chunk * slices * problem.nspins * int(tau) / 2.5e10
    chunk_cost = cost_floor if deadline is not None else 0.0
    while done < reps:
        n = min(chunk, reps - done)
        part = f"{cache_prefix}.chunk{done}.npz" if cache_prefix else None
        if part and os.path.exists(part):
            cached = np.load(part)["energies"]
            if cached.shape[0] != n:
                raise ValueError(
                    f"{part} holds {cached.shape[0]} energies, expected {n}"
                    " — was this point started with a different chunk size"
                    " or reps? Delete the stale .chunk files to recompute."
                )
            outs.append(cached)
            done += n
            continue
        # stop if the deadline has passed OR the next chunk (estimated at
        # the last computed chunk's cost) would overrun it
        if deadline is not None and time.time() + chunk_cost > deadline:
            raise BudgetExceeded(f"{cache_prefix} at chunk {done}/{reps}")
        t_chunk = time.time()
        kc = jax.random.fold_in(key, done)
        k1, k2, k3 = jax.random.split(kc, 3)
        # remainder chunks run PADDED to the full chunk size and slice the
        # result: a fresh batch shape would recompile every program, and
        # through the remote-TPU compile service one odd-shape compile can
        # cost more than the extra chains' compute
        s0 = sa.random_state(k1, problem.nspins, batch=(chunk,))
        s0 = sa.anneal(problem, pre, s0, k2, mcsteps=100)
        confs = qmc.replicate(s0, slices)
        confs = qmc.anneal(
            problem, a_full, b_full, temp, confs, k3,
            global_moves=global_moves,
        )
        es = np.asarray(qmc.best_slice_energy(problem, confs))[:n]
        if part:
            np.savez(part, energies=es)
        outs.append(es)
        done += n
        chunk_cost = max(time.time() - t_chunk, cost_floor)
    return np.concatenate(outs)


def mst_benchmark(problem, e_gs, outdir="mst_results", taus=None, reps=45,
                  exps=DEFAULT_EXPS, seed=0, max_tau=None, verbose=True,
                  budget_s=None):
    """Run the full SA-vs-PIQMC residual-energy sweep with incremental
    checkpointing. Returns ({name: (taus, eps_res_means)}, complete).

    Each completed (arm, tau) point is written to `outdir` immediately
    (the reference's incremental np.save pattern,
    examples/santoro80.py:254-265) and skipped on re-run; long PIQMC
    points additionally checkpoint per chain chunk. With `budget_s`, the
    run stops cleanly once the wall-clock budget is spent and returns
    complete=False — re-invoking resumes where it stopped (the remote-TPU
    worker degrades past ~20 min of device time, so long matrices are run
    as a restart loop; examples/santoro_mst.py --budget)."""
    os.makedirs(outdir, exist_ok=True)
    taus = DEFAULT_TAUS if taus is None else np.asarray(taus)
    if max_tau is not None:
        taus = taus[taus <= max_tau]
    nspins = problem.nspins
    key = jax.random.key(seed)
    # touch the device BEFORE starting the budget clock: remote-tunnel
    # backend init after a previous process's disconnect intermittently
    # hangs for many minutes and would otherwise consume the whole budget
    # (the caller's process-level timeout still bounds a truly dead tunnel)
    jax.block_until_ready(jax.random.uniform(jax.random.key(0), (8,)))
    t_start = time.time()
    deadline = t_start + budget_s if budget_s is not None else None

    def point(name, fn):
        path = os.path.join(outdir, f"{name}.npz")
        if os.path.exists(path):
            d = np.load(path)
            return float(d["eps"]), False
        if deadline is not None and time.time() > deadline:
            raise BudgetExceeded(name)
        energies = fn()
        eps = float((energies.mean() - e_gs) / nspins)
        np.savez(path, energies=energies, eps=eps)
        for part in glob.glob(os.path.join(outdir, f"{name}.chunk*.npz")):
            os.remove(part)  # chunk checkpoints are subsumed by the point
        return eps, True

    complete = True
    arms = [("CA", None)] + [(f"PT={pt}_P={p}", (pt, p)) for pt, p in exps]
    for name, cfg in arms:
        for i, tau in enumerate(taus):
            # stable digest (python hash() is salted per process)
            kp = jax.random.fold_in(
                key, zlib.crc32(f"{name}:{int(tau)}".encode()) & 0x7FFFFFFF
            )
            try:
                if cfg is None:
                    eps, fresh = point(
                        f"CA_tau{tau}",
                        lambda: sa_arm(problem, tau, reps, kp,
                                       deadline=deadline),
                    )
                else:
                    pt, p = cfg
                    eps, fresh = point(
                        f"{name}_tau{tau}",
                        lambda: piqmc_arm(
                            problem, tau, reps, kp, pt=pt, slices=p,
                            # smaller chunks at large P bound the wall time
                            # of one (uncheckpointable) chunk to ~9 min at
                            # tau = 6e6, keeping restarts effective
                            chunk=8 if p >= 40 else 16,
                            cache_prefix=os.path.join(
                                outdir, f"{name}_tau{tau}"
                            ),
                            deadline=deadline,
                        ),
                    )
            except BudgetExceeded as e:
                if verbose:
                    print(
                        f"[{time.time()-t_start:7.1f}s] budget exhausted "
                        f"at {e}; resume to continue",
                        flush=True,
                    )
                complete = False
                break
            if verbose:
                mark = "ran" if fresh else "cached"
                print(
                    f"[{time.time()-t_start:7.1f}s] {name} tau={tau}: "
                    f"eps_res={eps:.5f} ({mark})",
                    flush=True,
                )
        if not complete:
            break

    # rebuild the summary from ALL point files on disk — writing only the
    # arms visited this invocation would discard previously completed arms
    # after a budget-exhausted partial pass
    results = summarize_dir(outdir, nspins, e_gs, exps=exps)
    return results, complete


def summarize_dir(outdir, nspins, e_gs, exps=DEFAULT_EXPS):
    """Rebuild {name: {"tau", "total_sweeps", "eps"}} purely from the
    cached point files in `outdir` — no compute. Tolerates ragged arms
    (points missing for some configs, e.g. after an aborted run).

    Two x-axis conventions are carried side by side:
      "tau"          — the schedule length, the reference's plot axis
                       (examples/santoro80.py:310-317: SA and PIQMC share
                       the same tau; PIQMC does P x more flip attempts).
      "total_sweeps" — tau * P, the stricter equal-work axis.
    """
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
            xs.append(int(m.group(1)))
            ys.append(float(d["eps"]))
        if xs:
            order = np.argsort(xs)
            xs = np.asarray(xs)[order]
            results[name] = {
                "tau": xs,
                "total_sweeps": xs * mult,
                "eps": np.asarray(ys)[order],
            }
    with open(os.path.join(outdir, "summary.json"), "w") as f:
        json.dump(
            {k: {"tau": v["tau"].tolist(),
                 "total_sweeps": v["total_sweeps"].tolist(),
                 "eps": v["eps"].tolist()}
             for k, v in results.items()},
            f, indent=2,
        )
    return results


def plot_results(results, path=None, x="total_sweeps"):
    """Log-log eps_res curves, one per arm (the reference's plot_sontoro,
    examples/santoro80.py:304-323). Returns the figure.

    x="tau" plots the reference/MST-2002 convention (equal tau for SA and
    PIQMC — PIQMC gets P x more flip attempts at equal x); the default
    x="total_sweeps" is the stricter equal-work comparison. Legacy
    (xs, eps) tuples are accepted and plotted as-is.
    """
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots()
    for name, v in results.items():
        xs, ys = (v[x], v["eps"]) if isinstance(v, dict) else v
        style = dict(marker="x", ls="-")
        if name == "CA":
            style["color"] = "k"
        ax.plot(xs, ys, label=name, **style)
    ax.set_xscale("log")
    ax.set_yscale("log")
    ax.set_xlabel(
        r"$\tau$ (schedule steps)" if x == "tau"
        else r"$\tau \cdot P$ (total sweeps)"
    )
    ax.set_ylabel(r"$\epsilon_{res}$")
    ax.legend()
    if path:
        fig.savefig(path, dpi=120, bbox_inches="tight")
    return fig
