#!/usr/bin/env python
"""Skewed-Gaussian sampling example: the reference's flagship test, rebuilt.

Mirrors the full pipeline of
``/root/reference/test/sequential/SkewedGaussian/{StretchMove,WalkMove,
DiffEvo,MH}/src/main.cpp``: sample the 2-D skewed Gaussian (eps = 0.13, true
covariance [[1+eps, (1-eps)/2], [(1-eps)/2, (1+eps)/4]]), report acceptance,
ACT, covariance/correlation, corner histograms and percentiles, and write
CSV outputs — with the mover selected on the CLI.

Usage:
    python examples/skewed_gaussian.py --mover stretch|walk|de|mh|dram \
        [--walkers 320] [--steps 40000] [--thin 30] [--outdir out]
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np
import jax.numpy as jnp

from mcmcpp_tpu import (
    DRAMMove, EnsembleSampler, StretchMove, WalkMove,
    DifferentialEvolutionMove, MetropolisHastingsMove, analysis,
)
from mcmcpp_tpu.io import CsvEngine, DataWriter, HistMultiOutput, MatrixOutput

EPS = 0.13


def logp(t):
    # ≙ test/sequential/SkewedGaussian/Common/SkewedGaussian.h:52-57
    a, b = t[0] / 2.0 - t[1], t[0] / 2.0 + t[1]
    return -0.5 * (a * a / EPS + b * b)


def true_cov():
    return np.array([[1 + EPS, (1 - EPS) / 2], [(1 - EPS) / 2, (1 + EPS) / 4]])


def _mh_cov(kind):
    """≙ the MH example's CLI-selectable covariance
    (test/sequential/SkewedGaussian/MH/src/main.cpp:74-97): ideal /
    identity / a deliberately non-PD matrix exercising the validation
    fallback."""
    if kind == "ideal":
        return true_cov()
    if kind == "identity":
        return None
    if kind == "bad":
        return np.array([[1.0, 5.0], [5.0, 1.0]])  # not positive definite
    raise ValueError(kind)


MOVERS = {
    "stretch": lambda **kw: StretchMove(),
    "walk": lambda **kw: WalkMove(n_samples=6),
    "de": lambda **kw: DifferentialEvolutionMove(),
    "mh": lambda mh_cov="ideal": MetropolisHastingsMove(
        covariance=_mh_cov(mh_cov), scale=1.2
    ),
    # beyond the reference's four: delayed-rejection adaptive Metropolis
    # (movers/dram.py — Haario et al. 2006)
    "dram": lambda **kw: DRAMMove(),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mover", choices=MOVERS, default="stretch")
    ap.add_argument("--mh-cov", choices=["ideal", "identity", "bad"],
                    default="ideal",
                    help="MH proposal covariance (bad -> identity fallback)")
    ap.add_argument("--walkers", type=int, default=320)
    ap.add_argument("--steps", type=int, default=40000)
    ap.add_argument("--thin", type=int, default=30)
    ap.add_argument("--burn", type=int, default=1000)
    ap.add_argument("--outdir", default=None)
    args = ap.parse_args()

    mover = (MOVERS["mh"](mh_cov=args.mh_cov) if args.mover == "mh"
             else MOVERS[args.mover]())
    s = EnsembleSampler(
        logp, n_walkers=args.walkers, n_params=2, seed=0, mover=mover
    )
    s.init_ball(np.zeros(2), scale=0.3)
    s.run_mcmc(args.burn, store=False)
    s.run_mcmc(args.steps, thin=args.thin)

    samples = s.get_samples()
    flat = s.get_samples(flat=True)
    cov = np.cov(flat.T)
    act = analysis.autocorr_time(samples)
    print(f"mover              : {args.mover}")
    print(f"acceptance fraction: {s.acceptance_fraction:.4f}")
    print(f"autocorr times     : {np.round(act, 2)}")
    print(f"covariance         :\n{np.round(cov, 4)}")
    print(f"true covariance    :\n{np.round(true_cov(), 4)}")
    print(f"correlation        :\n"
          f"{np.round(analysis.correlation_matrix(samples), 4)}")
    pf = analysis.PercentileAndMaximumFinder().process_chain_data(samples)
    for p in (15.866, 50.0, 84.134):  # -1sigma, median, +1sigma
        vals = [pf.get_value_from_percentile(i, p) for i in range(2)]
        print(f"percentile {p:7.3f}%: {np.round(vals, 4)}")
    print(f"peaks              : "
          f"{np.round([pf.get_peak_location(i) for i in range(2)], 4)}")

    if args.outdir:
        ch = analysis.CornerHistograms(n_bins=100).calculate(samples)
        with DataWriter(CsvEngine(args.outdir)) as w:
            w.add(MatrixOutput("covariance", cov))
            w.add(HistMultiOutput("corner", ch))
        print(f"wrote CSV outputs to {args.outdir}/")


if __name__ == "__main__":
    main()
