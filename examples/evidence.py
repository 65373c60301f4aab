#!/usr/bin/env python
"""Bayesian model comparison with the evidence triad.

Which model generated the data: a single Gaussian (M1) or a two-component
mixture (M2)? Marginal likelihoods answer this directly — posterior model
odds = Bayes factor × prior odds. This example computes log Z for both
models three independent ways and checks they agree:

1. Nested sampling (``NestedSampler``) — shell decomposition, multimodal-safe;
2. Adaptive-ladder SMC (``SMCSampler.log_evidence``);
3. Power-posterior parallel tempering (``ParallelTemperingSampler``
   with ``loglike_fn``/``logprior_fn``), stepping-stone estimator.

Usage: python examples/evidence.py [--quick]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np
import jax
import jax.numpy as jnp

from mcmcpp_tpu import (
    NestedSampler,
    ParallelTemperingSampler,
    SMCSampler,
    power_ladder,
)

QUICK = "--quick" in sys.argv

# data: a genuinely bimodal sample (two Gaussians at ±2)
rng = np.random.default_rng(7)
DATA = jnp.asarray(
    np.concatenate([
        rng.normal(-2.0, 0.6, 60), rng.normal(2.0, 0.6, 60),
    ]).astype(np.float32)
)


# --- M1: single Gaussian, theta = (mu, log sigma is fixed at 0.6) ---------
def m1_logprior(t):
    return -0.5 * jnp.sum(t * t) / 25.0 - 0.5 * np.log(2 * np.pi * 25.0)


def m1_loglike(t):
    return jnp.sum(
        -0.5 * ((DATA - t[0]) / 0.6) ** 2 - np.log(0.6 * np.sqrt(2 * np.pi))
    )


def m1_prior_sample(key, n):
    return 5.0 * jax.random.normal(key, (n, 1))


# --- M2: symmetric two-component mixture, theta = (separation s > 0) -----
def m2_logprior(t):
    # s ~ HalfNormal(5): log 2 + N(0,25) on s > 0 (enforced via -inf)
    lp = (np.log(2.0) - 0.5 * t[0] ** 2 / 25.0
          - 0.5 * np.log(2 * np.pi * 25.0))
    return jnp.where(t[0] > 0.0, lp, -jnp.inf)


def m2_loglike(t):
    s = t[0]
    a = -0.5 * ((DATA - s) / 0.6) ** 2
    b = -0.5 * ((DATA + s) / 0.6) ** 2
    return jnp.sum(
        jnp.logaddexp(a, b) + np.log(0.5) - np.log(0.6 * np.sqrt(2 * np.pi))
    )


def m2_prior_sample(key, n):
    return jnp.abs(5.0 * jax.random.normal(key, (n, 1)))


def triad(tag, logprior, loglike, prior_sample):
    n_live = 300 if QUICK else 600
    ns = NestedSampler(logprior, loglike, prior_sample, n_params=1,
                       n_live=n_live, n_mcmc=20, seed=0)
    r = ns.run()
    smc = SMCSampler(logprior, loglike, prior_sample,
                     n_particles=1024 if QUICK else 4096, n_params=1,
                     n_mcmc=5, seed=0)
    smc.run()
    k = 8 if QUICK else 16
    pt = ParallelTemperingSampler(
        loglike_fn=loglike, logprior_fn=logprior, n_walkers=128,
        n_params=1, betas=power_ladder(k), seed=0,
    )
    pt.init_ball(np.ones(1), scale=0.5)
    pt.run_mcmc(300, thin=300)
    pt.reset_evidence()
    pt.run_mcmc(500 if QUICK else 2000, thin=10)
    ss = pt.log_evidence("stepping_stone")
    print(f"{tag}: nested={r.logz:+.2f}±{r.logz_err:.2f}  "
          f"smc={smc.log_evidence:+.2f}  pt-ss={ss:+.2f}")
    spread = max(r.logz, smc.log_evidence, ss) - min(
        r.logz, smc.log_evidence, ss
    )
    assert spread < 1.0, f"evidence engines disagree by {spread:.2f} nats"
    return np.mean([r.logz, smc.log_evidence, ss])


def main():
    print(f"n={DATA.shape[0]} bimodal observations")
    lz1 = triad("M1 (single Gaussian)  ", m1_logprior, m1_loglike,
                m1_prior_sample)
    lz2 = triad("M2 (symmetric mixture)", m2_logprior, m2_loglike,
                m2_prior_sample)
    bf = lz2 - lz1
    print(f"log Bayes factor (M2 vs M1): {bf:+.1f} "
          f"({'decisive for M2' if bf > 5 else 'inconclusive'})")
    assert bf > 5, "the mixture should win decisively on bimodal data"


if __name__ == "__main__":
    main()
