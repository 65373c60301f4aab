#!/usr/bin/env python
"""State-space workflows: the three latent-dynamics regimes side by side.

1. LINEAR-GAUSSIAN (local level, unknown observation variance): exact
   FFBS trajectory block (`models.lgss.LGSSKernel`) + conjugate
   inverse-gamma variance block in one blocked-Gibbs loop.
2. NON-LINEAR (stochastic volatility): particle marginal MH over the
   mean log-volatility with the bootstrap filter's unbiased likelihood
   estimate (`PMMHSampler`).
3. DISCRETE REGIMES (sticky 2-state HMM): exact discrete FFBS state
   block (`models.hmm.HMMKernel`) + conjugate Dirichlet transition rows.

No reference counterpart (jmatta1/MCMCpp has no time-series layer);
north-star scope. Usage: python examples/state_space.py [--quick]
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np
import jax
import jax.numpy as jnp

from mcmcpp_tpu import (
    BlockedGibbsSampler,
    ExactGibbsKernel,
    PMMHSampler,
    StateSpaceModel,
)
from mcmcpp_tpu.models.hmm import (
    HMMKernel,
    gaussian_emission_logpdf,
    transition_counts,
)
from mcmcpp_tpu.models.lgss import LGSSKernel, lgss_params


def local_level(quick):
    print("== 1. local level (exact FFBS + conjugate variance) ==")
    rng = np.random.default_rng(11)
    t_n, sig_q, sig_r = 80, 0.25, 0.7
    x_true = np.cumsum(rng.normal(0, sig_q, t_n)) + 1.0
    ys = (x_true + rng.normal(0, sig_r, t_n)).astype(np.float32)
    a0, b0 = 2.0, 1.0

    def params_fn(others):
        return lgss_params(A=1.0, b=0.0, Q=sig_q**2, H=1.0, c=0.0,
                           R=others["s2r"][0], m0=1.0, P0=4.0)

    def sample_s2r(key, others):
        resid = jnp.asarray(ys) - others["x"]
        return ((b0 + 0.5 * jnp.sum(resid**2))
                / jax.random.gamma(key, a0 + 0.5 * t_n))[None]

    gb = BlockedGibbsSampler(
        [("x", t_n, LGSSKernel(ys, params_fn)),
         ("s2r", 1, ExactGibbsKernel(sample_s2r))],
        n_chains=8, seed=0,
    )
    gb.init({"x": np.zeros(t_n, np.float32), "s2r": np.ones(1, np.float32)})
    gb.run(100 if quick else 500)
    burn = 25 if quick else 125
    s2r = np.asarray(gb.get_block("s2r"))[burn:].reshape(-1)
    xs = np.asarray(gb.get_block("x"))[burn:]
    rmse = float(np.sqrt(((xs.mean((0, 1)) - x_true) ** 2).mean()))
    print(f"  sigma_r^2 posterior mean {s2r.mean():.3f} "
          f"(truth {sig_r**2:.3f}); trajectory RMSE {rmse:.3f} "
          f"(< obs noise {sig_r})")
    assert rmse < sig_r


def stochastic_volatility(quick):
    print("== 2. stochastic volatility (PMMH) ==")
    rng = np.random.default_rng(5)
    t_n = 100 if quick else 250
    mu, phi, sig = -1.0, 0.95, 0.3
    x = np.empty(t_n)
    x[0] = mu
    for t in range(1, t_n):
        x[t] = mu + phi * (x[t - 1] - mu) + sig * rng.standard_normal()
    ys = (np.exp(x / 2) * rng.standard_normal(t_n)).astype(np.float32)

    ssm = StateSpaceModel(
        init_sample=lambda key, n, th: th[0] + sig / np.sqrt(1 - phi**2)
        * jax.random.normal(key, (n, 1)),
        trans_sample=lambda key, xp, t, th: th[0] + phi * (xp - th[0])
        + sig * jax.random.normal(key, xp.shape),
        obs_logpdf=lambda y, xp, t, th: -0.5 * (
            xp[:, 0] + y[0] ** 2 * jnp.exp(-xp[:, 0]) + np.log(2 * np.pi)
        ),
    )
    s = PMMHSampler(
        ssm, ys, log_prior=lambda th: -0.5 * th[0] ** 2, n_params=1,
        n_particles=128 if quick else 512,
        proposal_scale=0.3, n_chains=8, seed=0,
    )
    s.init(np.zeros((8, 1), np.float32))
    s.run(150 if quick else 400)
    burn = 50 if quick else 150
    draws = np.asarray(s.get_samples(burn_in=burn, flat=True))[:, 0]
    print(f"  mu posterior {draws.mean():.3f} +- {draws.std():.3f} "
          f"(truth {mu}); acceptance "
          f"{s.acceptance_fraction.mean():.2f}")
    assert abs(draws.mean() - mu) < 0.8


def regime_switching(quick):
    print("== 3. sticky 2-state HMM (discrete FFBS + Dirichlet rows) ==")
    rng = np.random.default_rng(7)
    t_n = 150 if quick else 300
    gamma_true = np.array([[0.95, 0.05], [0.10, 0.90]])
    mus = np.array([-1.5, 1.5])
    z = np.zeros(t_n, int)
    for t in range(1, t_n):
        z[t] = rng.choice(2, p=gamma_true[z[t - 1]])
    ys = (mus[z] + 0.7 * rng.standard_normal(t_n)).astype(np.float32)

    log_obs = gaussian_emission_logpdf(ys, mus, np.array([0.7, 0.7]))
    log_pi = np.log(np.array([0.5, 0.5], np.float32))

    def sample_rows(key, others):
        counts = transition_counts(others["z"].astype(jnp.int32), 2)
        g = jax.random.gamma(key, counts.astype(jnp.float32) + 1.0)
        return jnp.log(g / jnp.sum(g, 1, keepdims=True)).reshape(-1)

    gb = BlockedGibbsSampler(
        [("z", t_n, HMMKernel(log_obs, log_pi,
                              lambda o: o["lgam"].reshape(2, 2))),
         ("lgam", 4, ExactGibbsKernel(sample_rows))],
        n_chains=8, seed=0,
    )
    gb.init({"z": rng.integers(0, 2, t_n).astype(np.float32),
             "lgam": np.log(np.full(4, 0.5, np.float32))})
    gb.run(100 if quick else 300)
    burn = 25 if quick else 75
    zs = np.asarray(gb.get_block("z"))[burn:]
    lgs = np.asarray(gb.get_block("lgam"))[burn:].reshape(-1, 2, 2)
    z_hat = (zs.mean((0, 1)) > 0.5).astype(int)
    acc = float((z_hat == z).mean())
    diag = np.exp(lgs)[:, [0, 1], [0, 1]].mean(0)
    print(f"  state accuracy {acc:.3f}; sticky diagonal "
          f"[{diag[0]:.2f}, {diag[1]:.2f}] (truth [0.95, 0.90])")
    assert acc > 0.85


def structural_decomposition(quick):
    print("== 4. structural decomposition + forecast (BSTS-style) ==")
    from mcmcpp_tpu.models.lgss import (
        forecast as lgss_forecast,
        local_level as ll_component,
        rts_smoother,
        seasonal as seasonal_component,
        structural,
    )

    rng = np.random.default_rng(13)
    S, t_n, h = 4, 72 if quick else 144, 8
    season_true = np.array([1.2, -0.4, -1.0, 0.2])
    level_true = np.cumsum(rng.normal(0, 0.15, t_n + h)) + 2.0
    y_full = (level_true + season_true[np.arange(t_n + h) % S]
              + rng.normal(0, 0.3, t_n + h))
    ys = y_full[:t_n].astype(np.float32)

    p = structural(
        [ll_component(0.15), seasonal_component(S, 0.01)],
        sigma_obs=0.3, p0_scale=25.0,
    )
    means, _ = rts_smoother(p, ys)
    means = np.asarray(means)
    corr = np.corrcoef(means[8:, 1],
                       season_true[np.arange(8, t_n) % S])[0, 1]
    _, _, om, oP = lgss_forecast(p, ys, horizon=h)
    om = np.asarray(om)[:, 0]
    sd = np.sqrt(np.asarray(oP)[:, 0, 0])
    cover = float((np.abs(om - y_full[t_n:]) < 3 * sd).mean())
    print(f"  smoothed seasonal corr with truth {corr:.3f}; "
          f"{h}-step holdout 3-sigma coverage {cover:.2f}")
    assert corr > 0.85 and cover >= 0.75


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()
    local_level(args.quick)
    stochastic_volatility(args.quick)
    regime_switching(args.quick)
    structural_decomposition(args.quick)
    print("OK")


if __name__ == "__main__":
    main()
