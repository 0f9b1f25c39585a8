"""Reproduce the Martonak–Santoro–Tosatti SA-vs-PIQMC benchmark on TPU.

The TPU-native analog of the reference's examples/santoro80.py driver:
loads the certified 80x80 instance, sweeps tau for classical annealing and
PIQMC at P in {5,10,20,40}, checkpoints incrementally, and writes the
log-log residual-energy plot.

Usage:
    python examples/santoro_mst.py [--max-tau 60000] [--reps 45]
"""

import argparse

import jax

jax.config.update("jax_default_prng_impl", "rbg")

from montecarlosolvers_tpu.models import instances
from montecarlosolvers_tpu.bench import mst


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--max-tau", type=int, default=None,
                    help="cap the tau sweep (full sweep reaches 6e6)")
    ap.add_argument("--reps", type=int, default=45)
    ap.add_argument("--outdir", default="mst_results")
    args = ap.parse_args()

    problem, e_gs = instances.santoro_80x80(lattice=True)
    results = mst.mst_benchmark(
        problem, e_gs, outdir=args.outdir, reps=args.reps,
        max_tau=args.max_tau,
    )
    mst.plot_results(results, path=f"{args.outdir}/santoro_mst.png")
    print(f"wrote {args.outdir}/santoro_mst.png")


if __name__ == "__main__":
    main()
