#!/usr/bin/env python
"""Hierarchical (eight-schools) model: the full DSL + ChEES-HMC workflow.

Demonstrates capabilities beyond the reference (whose "model language" is a
black-box C++ Calculator, ``MCMCpp/Utility/UserOjbectsTest.h:144-151``):
named parameters with priors, a plate, a deterministic (non-centered
reparameterization), observe() sites, ChEES-HMC sampling with the
convergence-gated driver, and posterior-predictive replication.

Usage:
    python examples/hierarchical.py [--chains 32]
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np
import jax
import jax.numpy as jnp

from mcmcpp_tpu import CheesHMCSampler, run_until_converged
from mcmcpp_tpu.dsl import HalfNormal, Model, Normal


# Rubin (1981) eight-schools data: treatment effects and standard errors
Y = np.array([28.0, 8.0, -3.0, 7.0, -1.0, 1.0, 18.0, 12.0])
SIGMA = np.array([15.0, 10.0, 16.0, 11.0, 9.0, 11.0, 10.0, 18.0])


def build_model():
    return (
        Model()
        .plate("schools", len(Y))
        .param("mu", Normal(0.0, 10.0))
        .param("tau", HalfNormal(10.0))
        .param("theta_raw", Normal(0.0, 1.0), plate="schools")
        # non-centered parameterization: theta = mu + tau * theta_raw
        # (the funnel geometry lives in theta_raw, which is a priori N(0,1))
        .deterministic("theta", lambda p: p["mu"] + p["tau"] * p["theta_raw"])
        .observe("y", lambda p: Normal(p["theta"], jnp.asarray(SIGMA)), Y)
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chains", type=int, default=32)
    args = ap.parse_args()

    model = build_model()
    logp, dim, constrain = model.build()
    print(f"eight schools: {dim} unconstrained parameters")

    s = CheesHMCSampler(logp, n_chains=args.chains, n_params=dim, seed=0)
    s.init_ball(np.zeros(dim), scale=0.5)
    s.warmup(700)
    print(f"adapted: step={float(np.asarray(s.step_size)):.3f} "
          f"trajectory={s.traj_length:.3f}")
    rep = run_until_converged(s, max_steps=20000, check_every=2000,
                              act_multiplier=50, rhat_threshold=1.01)
    print(f"convergence: {rep.reason} after {rep.steps_run} steps "
          f"(tau_max={rep.tau.max():.1f})")

    draws = constrain(s.get_samples(flat=True))
    print(f"mu    = {draws['mu'].mean():6.2f} +- {draws['mu'].std():.2f}")
    print(f"tau   = {draws['tau'].mean():6.2f} +- {draws['tau'].std():.2f}")
    print("theta =", np.round(draws["theta"].mean(axis=0), 2))

    # posterior predictive: replicate the study
    flat = s.get_samples(flat=True)
    take = flat[:: max(1, len(flat) // 1000)]
    y_rep = model.posterior_predictive(jax.random.key(1), take)["y"]
    print("y_rep mean:", np.round(y_rep.mean(axis=0), 1))
    print("observed  :", Y)
    # posterior-predictive p-value for the max statistic
    p_max = float(np.mean(y_rep.max(axis=1) > Y.max()))
    print(f"posterior-predictive p(max y_rep > max y) = {p_max:.2f}")
    return draws


if __name__ == "__main__":
    main()
