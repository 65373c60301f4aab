#!/usr/bin/env python
"""AR(1) autocorrelation-time oracle: the reference's AcTime test, rebuilt.

Mirrors ``/root/reference/test/sequential/AcTime/src/main.cpp`` (and the
parallel variant with ``--sharded``): run the AutoRegressiveMove ensemble
whose integrated autocorrelation time is analytically (1+phi)/(1-phi) and
compare the FFT/Sokal estimator to the truth (phi -> tau: 0.8->9, 0.905->20,
0.9355->30, 0.9672->60, 0.99->200).

Usage:
    python examples/actime.py [--walkers 100] [--steps 65536] [--sharded]
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np
import jax

from mcmcpp_tpu import AutoRegressiveMove, EnsembleSampler, ShardedEnsembleSampler
from mcmcpp_tpu import analysis


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--walkers", type=int, default=100)
    ap.add_argument("--steps", type=int, default=65536)
    ap.add_argument("--sharded", action="store_true",
                    help="shard walkers over all devices "
                         "(≙ test/parallel/AcTime)")
    args = ap.parse_args()

    # ≙ test/sequential/AcTime/src/main.cpp:16-22
    phis = np.array([0.8, 0.905, 0.9355, 0.9672, 0.99])
    mover = AutoRegressiveMove(
        offsets=np.zeros(5), phis=phis, variances=np.ones(5)
    )
    cls = ShardedEnsembleSampler if args.sharded else EnsembleSampler
    n_walkers = args.walkers
    if args.sharded:  # pad so halves divide the mesh
        n_dev = len(jax.devices())
        n_walkers = ((n_walkers + 2 * n_dev - 1) // (2 * n_dev)) * 2 * n_dev
    s = cls(lambda t: 0.0, n_walkers=n_walkers, n_params=5, seed=0, mover=mover)
    s.set_initial_walker_pos(
        mover.initial_positions(jax.random.key(1), n_walkers)
    )
    s.run_mcmc(args.steps)
    tau = analysis.autocorr_time(s.get_samples())
    print(f"{'phi':>8} {'true tau':>9} {'estimate':>9} {'rel err':>8}")
    for p, t in zip(phis, tau):
        truth = (1 + p) / (1 - p)
        print(f"{p:8.4f} {truth:9.2f} {t:9.2f} {abs(t - truth) / truth:8.2%}")


if __name__ == "__main__":
    main()
