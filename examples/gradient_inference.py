#!/usr/bin/env python
"""Gradient-based inference demo: NUTS / HMC / MALA / SMC / ADVI.

Capabilities beyond the reference (its Calculator contract is gradient-free;
see SURVEY.md §7): fit a correlated Gaussian posterior with every
gradient-based engine in the framework and compare posterior summaries.

Usage:
    python examples/gradient_inference.py [--dim 10] [--chains 64]
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np
import jax
import jax.numpy as jnp

from mcmcpp_tpu import ADVI, HMCSampler, MALASampler, NUTSSampler, SMCSampler
from mcmcpp_tpu.analysis import summary


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dim", type=int, default=10)
    ap.add_argument("--chains", type=int, default=64)
    args = ap.parse_args()

    dim, rho = args.dim, 0.5
    idx = np.arange(dim)
    cov = rho ** np.abs(idx[:, None] - idx[None, :])
    prec = jnp.asarray(np.linalg.inv(cov), jnp.float32)

    def logp(t):
        return -0.5 * t @ (prec @ t)

    print(f"target: {dim}-D AR(1)-correlated Gaussian, rho={rho}")
    for name, cls, kw in [
        ("NUTS", NUTSSampler, {"max_depth": 8}),
        ("HMC", HMCSampler, {"n_leapfrog": 16}),
        ("MALA", MALASampler, {}),
    ]:
        s = cls(logp, n_chains=args.chains, n_params=dim, seed=0, **kw)
        s.init_ball(np.zeros(dim), scale=1.0, seed=1)
        s.warmup(400)
        s.run(1000)
        st = summary(s.get_samples(burn_in=100))
        print(f"{name:5s} accept={s.last_mean_accept:.2f} "
              f"step={s.step_size:.3f} max|mean|={np.abs(st['mean']).max():.3f} "
              f"max rhat={st['rhat'].max():.3f} min ess={st['ess'].min():.0f}")

    smc = SMCSampler(
        log_prior_fn=lambda t: -0.5 * jnp.sum(t * t) / 9.0,
        log_like_fn=logp,
        prior_sample_fn=lambda k, n: 3.0 * jax.random.normal(k, (n, dim)),
        n_particles=4096, n_params=dim, seed=0,
    )
    smc.run()
    print(f"SMC   stages={smc.n_stages} logZ={smc.log_evidence:.2f} "
          f"max|mean|={np.abs(smc.particles.mean(0)).max():.3f}")

    vi = ADVI(logp, n_params=dim, full_rank=True, learning_rate=0.02, seed=0)
    vi.fit(2000)
    err = np.abs(vi.cov - cov).max()
    print(f"ADVI  max|mean|={np.abs(vi.mean).max():.3f} max|cov err|={err:.3f}")


if __name__ == "__main__":
    main()
