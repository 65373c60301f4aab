#!/usr/bin/env python
"""Gaussian-process latent inference with elliptical slice sampling.

A 1-D log-Gaussian Cox-style model: f ~ GP(0, RBF), counts
y_i ~ Poisson(exp(f_i)). The GP prior is exactly the structure
elliptical slice sampling (Murray et al. 2010) exploits — no tuning, no
gradients, every proposal on the prior ellipse.

Usage: python examples/gp_latent.py [--n 60] [--quick]
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np
import jax.numpy as jnp

from mcmcpp_tpu import EllipticalSliceSampler


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=60)
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()
    n = args.n
    steps = 400 if args.quick else 4000

    rng = np.random.default_rng(0)
    x = np.linspace(0.0, 4.0, n)
    k = np.exp(-0.5 * (x[:, None] - x[None, :]) ** 2 / 0.5**2)
    chol = np.linalg.cholesky(k + 1e-6 * np.eye(n)).astype(np.float32)
    f_true = chol @ rng.standard_normal(n).astype(np.float32)
    y = rng.poisson(np.exp(f_true)).astype(np.float32)
    yj = jnp.asarray(y)

    def loglike(f):  # Poisson(exp(f)) counts
        return jnp.sum(yj * f - jnp.exp(f))

    s = EllipticalSliceSampler(
        loglike, prior_mean=np.zeros(n), prior_chol=chol,
        n_chains=64, seed=1,
    )
    s.init_prior(seed=2)
    s.run(steps // 4)  # burn-in
    s.chain.clear()
    s.run(steps)
    flat = s.get_samples(flat=True)
    f_mean = flat.mean(axis=0)
    f_sd = flat.std(axis=0)
    inside = np.mean(np.abs(f_mean - f_true) < 2 * f_sd)
    rmse = float(np.sqrt(np.mean((f_mean - f_true) ** 2)))
    print(f"n={n} latents, {steps} steps x 64 chains")
    print(f"posterior-mean RMSE vs true latent: {rmse:.3f} "
          f"(prior sd ~ 1.0)")
    print(f"truth within 2sd band: {100 * inside:.0f}% of inputs")
    assert inside > 0.8


if __name__ == "__main__":
    main()
