#!/usr/bin/env python
"""Regime-switching state space: online regime tracking with the
Rao-Blackwellised (mixture Kalman) filter, then hyperparameter
inference by PMMH driven by the SAME filter through the ``loglik_fn``
hook.

Model: a local level x_t observed in noise, whose drift variance
switches between a CALM and a VOLATILE regime following a 2-state
Markov chain:

    z_t ~ Markov(P),  P = [[0.95, 0.05], [0.10, 0.90]]
    x_t = x_{t-1} + N(0, q[z_t]),   q = (0.02², 0.5²)
    y_t = x_t + N(0, r²)

Because x is linear-Gaussian GIVEN the regime path, particles live only
on z-paths and carry exact per-particle Kalman moments — the filtered
regime probabilities P(z_t | y_{1:t}) come out of the weighted one-hots,
no state-sampling noise attached. The same filter is an unbiased (and
lower-variance-than-bootstrap) likelihood estimator, so plugging it into
``PMMHSampler(loglik_fn=...)`` yields exact pseudo-marginal inference
for the observation noise r.

Usage: python examples/regime_switching.py [--quick]
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np
import jax
import jax.numpy as jnp

from mcmcpp_tpu import PMMHSampler, rao_blackwell_filter, switching_model

TRANS = np.array([[0.95, 0.05], [0.10, 0.90]], np.float32)
SIG_Q = np.array([0.02, 0.5], np.float32)   # calm / volatile drift
SIG_R = 0.25


def simulate(t_n, seed=0):
    rng = np.random.default_rng(seed)
    z, x = 0, 0.0
    zs, ys = [], []
    for t in range(t_n):
        if t > 0:
            z = rng.choice(2, p=TRANS[z])
            x = x + SIG_Q[z] * rng.standard_normal()
        zs.append(z)
        ys.append(x + SIG_R * rng.standard_normal())
    return np.asarray(zs), np.asarray(ys, np.float32)


def build_model(sig_r):
    # jnp throughout: sig_r may be a traced PMMH parameter
    eye = jnp.eye(1, dtype=jnp.float32)
    return switching_model(
        TRANS,
        A=jnp.stack([eye, eye]),
        b=jnp.zeros((2, 1), jnp.float32),
        Q=jnp.stack([SIG_Q[0] ** 2 * eye, SIG_Q[1] ** 2 * eye]),
        H=jnp.stack([eye, eye]),
        c=jnp.zeros((2, 1), jnp.float32),
        R=jnp.stack([sig_r ** 2 * eye, sig_r ** 2 * eye]),
        m0=jnp.zeros(1, jnp.float32), P0=4.0 * eye,
        init_probs=np.array([0.9, 0.1], np.float32),
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()
    t_n = 80 if args.quick else 300
    n_particles = 256 if args.quick else 1024
    zs, ys = simulate(t_n, seed=7)

    # -- 1. online regime tracking ---------------------------------------
    res = rao_blackwell_filter(
        jax.random.key(0), build_model(SIG_R), ys, n_particles
    )
    probs = np.asarray(res.z_stats)            # (T, 2) filtered P(z_t|y)
    hard = probs.argmax(axis=1)
    acc = float((hard == zs).mean())
    print(f"RBPF: T={t_n}, N={n_particles} regime-classification "
          f"accuracy {acc:.2f} (chance 0.5)")
    print(f"  log-evidence {float(res.loglik):.2f}; "
          f"min particle ESS {float(np.asarray(res.ess).min()):.0f}")
    assert acc > 0.7

    # -- 2. PMMH over log r with the RB'd likelihood ---------------------
    def loglik_fn(key, theta):
        return rao_blackwell_filter(
            key, build_model(jnp.exp(theta[0])), ys,
            n_particles if args.quick else 512,
        ).loglik

    pm = PMMHSampler(
        ssm=None, ys=None,
        log_prior=lambda th: -0.5 * th[0] ** 2,
        n_params=1, proposal_scale=0.25, n_chains=8, seed=1,
        loglik_fn=loglik_fn,
    )
    pm.init(np.full((8, 1), np.log(0.5), np.float32))
    pm.run(60 if args.quick else 300)
    burn = 20 if args.quick else 100
    draws = np.exp(np.asarray(pm.get_samples(burn_in=burn, flat=True)))
    print(f"PMMH (RB'd likelihood): r posterior "
          f"{draws.mean():.3f} +- {draws.std():.3f} (truth {SIG_R})")
    print(f"  acceptance {pm.acceptance_fraction.mean():.2f}")
    if not args.quick:
        assert abs(draws.mean() - SIG_R) < 0.15


if __name__ == "__main__":
    main()
