#!/usr/bin/env python
"""Dirichlet-process mixture (truncated) — Bayesian nonparametric
density estimation with the GEM stick-breaking prior.

The model never fixes the number of clusters: K is a truncation level,
``w ~ GEM(alpha, K)`` puts geometrically-decaying mass on the sticks, and
the learned concentration ``alpha`` controls how many components the data
actually activate (Ishwaran & James 2001). Label switching is broken by
an ``Ordered`` prior on the component means, so the chain mixes over a
single labeling.

Data: three well-separated Gaussian clusters; the DP mixture with K=8
truncation should (a) put ~all weight on 3 components and (b) recover
the predictive density.

Usage: python examples/dp_mixture.py [--quick]
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np
import jax
import jax.numpy as jnp

from mcmcpp_tpu import NUTSSampler
from mcmcpp_tpu.dsl import (
    GEM,
    Gamma,
    HalfNormal,
    Mixture,
    Model,
    Normal,
    StickBreaking,
    ordered,
)

K = 8
TRUE_MEANS = np.array([-3.0, 0.5, 4.0])
TRUE_SDS = np.array([0.6, 0.5, 0.8])
TRUE_W = np.array([0.3, 0.45, 0.25])


def make_data(n, seed=0):
    rng = np.random.default_rng(seed)
    z = rng.choice(3, size=n, p=TRUE_W)
    return (TRUE_MEANS[z] + TRUE_SDS[z] * rng.standard_normal(n)).astype(
        np.float32
    )


def build_model(y):
    def obs(p):
        comps = [Normal(p["mu"][k], p["sigma"][k]) for k in range(K)]
        return Mixture(comps, weights=p["w"])

    return (
        Model()
        .param("alpha", Gamma(2.0, 1.0))
        .param("w", lambda p: GEM(p["alpha"], K), shape=(K,),
               transform=StickBreaking(K))
        .param("mu", ordered(Normal(0.0, 5.0)), shape=(K,))
        .param("sigma", HalfNormal(2.0), shape=(K,))
        .observe("y", obs, jnp.asarray(y))
    )


def true_density(grid):
    from scipy.stats import norm

    return sum(
        w * norm.pdf(grid, m, s)
        for w, m, s in zip(TRUE_W, TRUE_MEANS, TRUE_SDS)
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--n", type=int, default=400)
    args = ap.parse_args()
    warm, steps = (150, 300) if args.quick else (600, 1500)

    y = make_data(args.n)
    model = build_model(y)
    logp, dim, constrain = model.build()
    print(f"DP mixture: truncation K={K}, {dim} unconstrained dims, "
          f"n={args.n}")

    s = NUTSSampler(logp, n_chains=16, n_params=dim, seed=0, max_depth=8)
    s.init_ball(np.zeros(dim), scale=0.3, seed=1)
    s.warmup(warm)
    s.run(steps)
    post = constrain(s.get_samples(burn_in=steps // 5, flat=True))

    # (a) how many components does the posterior actually use?
    w_mean = np.asarray(post["w"]).mean(axis=0)
    active = (np.sort(w_mean)[::-1] > 0.05).sum()
    print("posterior mean stick weights:",
          np.array2string(w_mean, precision=3))
    print(f"components with >5% weight: {active} (truth: 3)")
    print(f"posterior mean alpha: {float(np.mean(post['alpha'])):.2f}")

    # (b) posterior predictive density vs truth on a grid
    grid = np.linspace(-6.5, 7.5, 281)
    sub = slice(None, None, max(1, post["w"].shape[0] // 400))
    w_s = np.asarray(post["w"])[sub]              # (S, K)
    mu_s = np.asarray(post["mu"])[sub]
    sd_s = np.asarray(post["sigma"])[sub]
    dens = np.zeros_like(grid)
    for wk, mk, sk in zip(w_s, mu_s, sd_s):
        dens += (wk[None, :] * np.exp(
            -0.5 * ((grid[:, None] - mk[None, :]) / sk[None, :]) ** 2
        ) / (sk[None, :] * np.sqrt(2 * np.pi))).sum(axis=1)
    dens /= len(w_s)
    l1 = np.trapezoid(np.abs(dens - true_density(grid)), grid)
    print(f"predictive-density L1 error: {l1:.3f} (0 = exact)")
    if not args.quick:
        assert l1 < 0.15, l1
        assert active == 3, w_mean
    print("OK")


if __name__ == "__main__":
    main()
