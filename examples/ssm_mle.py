"""SSM parameter estimation three ways: IF2 MLE, PMMH posterior, Kalman.

One linear-Gaussian state-space model (so the exact answer is
computable), three inference routes from the particle toolbox:

1. exact Kalman MLE — direct search over the collapsed likelihood
   (``models/lgss.py``), the ground truth;
2. IF2 iterated filtering (``if2.py``, Ionides et al. 2015) — the
   simulation-based (plug-and-play) MLE: an augmented (x, θ) particle
   cloud with cooled θ-perturbations, needing only the ability to
   SIMULATE the model;
3. PMMH (``particle.py``) — the fully Bayesian route: a posterior over
   θ whose mode/mean should bracket the same point.

On a real non-linear model only routes 2 and 3 exist — this example
verifies them against route 1 where all three are available.

Usage: python examples/ssm_mle.py [--t 150] [--if2-iters 30]
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np
import jax
import jax.numpy as jnp

from mcmcpp_tpu import PMMHSampler, StateSpaceModel, if2
from mcmcpp_tpu.models.lgss import lgss_loglik, lgss_params

A_TRUE, Q_TRUE, SR_TRUE = 0.85, 0.3, 0.5
SQ = np.sqrt(Q_TRUE).astype(np.float32)
C0 = 0.5 * np.log(2 * np.pi)


def simulate(t_n, seed=11):
    rng = np.random.default_rng(seed)
    x, ys = 0.0, np.empty(t_n, np.float32)
    for t in range(t_n):
        x = A_TRUE * x + SQ * rng.standard_normal()
        ys[t] = x + SR_TRUE * rng.standard_normal()
    return ys


def exact_loglik(theta, ys):
    p = lgss_params(A=float(theta[0]), b=0.0, Q=Q_TRUE, H=1.0, c=0.0,
                    R=float(np.exp(2 * theta[1])), m0=0.0, P0=0.0)
    return float(lgss_loglik(p, ys, method="sequential", initial="prior"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--t", type=int, default=150)
    ap.add_argument("--if2-iters", type=int, default=30)
    ap.add_argument("--particles", type=int, default=1500)
    args = ap.parse_args()
    ys = simulate(args.t)

    # 1) exact Kalman MLE (the oracle)
    from scipy.optimize import minimize

    mle = minimize(lambda th: -exact_loglik(th, ys), x0=[0.5, 0.0],
                   method="Nelder-Mead").x
    print(f"truth        : a={A_TRUE:.3f}  log_sr={np.log(SR_TRUE):+.3f}")
    print(f"Kalman MLE   : a={mle[0]:.3f}  log_sr={mle[1]:+.3f}")

    # 2) IF2: θ = [a, log_sr]; hooks receive θ PER PARTICLE (if2.py)
    ssm_if2 = StateSpaceModel(
        init_sample=lambda key, n, th: SQ * jax.random.normal(key, (n, 1)),
        trans_sample=lambda key, x, t, th: th[:, 0:1] * x
        + SQ * jax.random.normal(key, x.shape),
        obs_logpdf=lambda y, x, t, th: (
            -0.5 * jnp.square((y[0] - x[:, 0]) / jnp.exp(th[:, 1]))
            - th[:, 1] - C0
        ),
    )
    r = if2(jax.random.key(0), ssm_if2, ys, n_particles=args.particles,
            theta0=np.array([0.5, 0.0], np.float32), sigma0=0.05,
            n_iters=args.if2_iters, cooling=0.9)
    est = np.asarray(r.theta)
    print(f"IF2 MLE      : a={est[0]:.3f}  log_sr={est[1]:+.3f}  "
          f"(final swarm sd {np.asarray(r.theta_sd_trace)[-1].round(4)})")

    # 3) PMMH posterior over the same θ (fixed-θ hooks)
    ssm_pm = StateSpaceModel(
        init_sample=lambda key, n, th: SQ * jax.random.normal(key, (n, 1)),
        trans_sample=lambda key, x, t, th: th[0] * x
        + SQ * jax.random.normal(key, x.shape),
        obs_logpdf=lambda y, x, t, th: (
            -0.5 * jnp.square((y[0] - x[:, 0]) / jnp.exp(th[1]))
            - th[1] - C0
        ),
    )
    pm = PMMHSampler(
        ssm_pm, ys, log_prior=lambda th: -0.5 * jnp.sum(th * th) / 4.0,
        n_params=2, n_particles=256, proposal_scale=[0.04, 0.08],
        n_chains=16, seed=0,
    )
    pm.init(np.tile(np.array([0.5, 0.0], np.float32), (16, 1)))
    pm.run(550)
    post = pm.get_samples(burn_in=150, flat=True)
    print(f"PMMH mean    : a={post[:, 0].mean():.3f}  "
          f"log_sr={post[:, 1].mean():+.3f}  "
          f"(sd {post.std(axis=0).round(3)})")
    err = np.abs(est - mle)
    print(f"\nIF2 - MLE    : |da|={err[0]:.3f}  |dlog_sr|={err[1]:.3f} "
          "(simulation-based MLE matches the exact one)")


if __name__ == "__main__":
    main()
