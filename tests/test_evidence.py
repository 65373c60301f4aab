"""Power-posterior parallel tempering: log-evidence oracles.

The reference has no evidence machinery at all (SURVEY.md §2 covers
sampling + diagnostics only); this subsystem is beyond-reference. Oracle
pattern follows SURVEY.md §4: analytic/quadrature ground truth, generous
MC tolerances, fixed seeds.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mcmcpp_tpu.tempering import (
    ParallelTemperingSampler,
    power_ladder,
)


# conjugate 1-D Gaussian: prior N(0, S0²), likelihood y_i ~ N(theta, 1)
S0 = 2.0
Y = np.array(
    [1.14, 0.72, 0.21, 1.95, 0.38, 1.52, -0.34, 0.91, 1.18, 0.43],
    np.float32,
)


def logprior(t):
    return -0.5 * jnp.sum(t * t) / S0**2 - 0.5 * np.log(2 * np.pi * S0**2)


def loglike(t):
    return jnp.sum(-0.5 * (Y - t[0]) ** 2) - Y.size / 2 * np.log(2 * np.pi)


def _quadrature_logz():
    g = np.linspace(-12, 12, 200001)
    lp = (
        -0.5 * g**2 / S0**2
        - 0.5 * np.log(2 * np.pi * S0**2)
        + np.sum(-0.5 * (Y[:, None] - g[None, :]) ** 2, axis=0)
        - Y.size / 2 * np.log(2 * np.pi)
    )
    m = lp.max()
    return m + np.log(np.trapezoid(np.exp(lp - m), g))


LOGZ_TRUE = _quadrature_logz()


def _run_power_pt(mesh=None, n_temps=12, seed=0):
    pt = ParallelTemperingSampler(
        loglike_fn=loglike, logprior_fn=logprior, n_walkers=128,
        n_params=1, betas=power_ladder(n_temps), seed=seed, mesh=mesh,
    )
    pt.init_ball(np.zeros(1), scale=1.0, seed=1)
    pt.run_mcmc(400, thin=400)  # burn-in
    pt.reset_evidence()
    pt.run_mcmc(2000, thin=5)
    return pt


@pytest.mark.slow
def test_stepping_stone_matches_quadrature():
    pt = _run_power_pt()
    ss = pt.log_evidence("stepping_stone")
    assert ss == pytest.approx(LOGZ_TRUE, abs=0.1)
    # TI on a K=12 power ladder carries trapezoid bias; looser tolerance
    ti = pt.log_evidence("ti")
    assert ti == pytest.approx(LOGZ_TRUE, abs=0.5)
    # the cold chain is still a valid posterior sampler: conjugate moments
    post_prec = 1.0 / S0**2 + Y.size
    samp = pt.get_samples(flat=True)
    assert samp.mean() == pytest.approx(Y.sum() / post_prec, abs=0.05)
    assert samp.std() == pytest.approx(post_prec**-0.5, abs=0.05)
    # integrand curve is monotone in beta for this unimodal model
    betas, means = pt.ti_curve()
    assert betas[0] == 0.0 and betas[-1] == 1.0
    assert np.all(np.diff(means) >= -0.5)  # noisy but increasing


@pytest.mark.slow
def test_power_pt_cross_checks_smc_evidence():
    """PT stepping-stone and SMC must agree on the same model (both within
    tolerance of the analytic answer) — two independent evidence engines."""
    from mcmcpp_tpu.smc import SMCSampler

    def prior_sample(key, n):
        return S0 * jax.random.normal(key, (n, 1))

    smc = SMCSampler(logprior, loglike, prior_sample,
                     n_particles=2048, n_params=1, n_mcmc=5, seed=0)
    smc.run()
    pt = _run_power_pt()
    ss = pt.log_evidence("stepping_stone")
    assert ss == pytest.approx(LOGZ_TRUE, abs=0.1)
    assert smc.log_evidence == pytest.approx(LOGZ_TRUE, abs=0.15)
    assert ss == pytest.approx(smc.log_evidence, abs=0.25)


def test_power_mode_mesh_bitwise_identical():
    """Walker-mesh power mode must match unmeshed BITWISE, including the
    evidence accumulators (replicated global statistics)."""
    from mcmcpp_tpu import make_walker_mesh

    def run(mesh):
        pt = ParallelTemperingSampler(
            loglike_fn=loglike, logprior_fn=logprior, n_walkers=64,
            n_params=1, betas=power_ladder(6), seed=3, mesh=mesh,
        )
        pt.init_ball(np.zeros(1), scale=1.0, seed=4)
        pt.run_mcmc(120, thin=4)
        return (pt.get_samples(), pt.log_evidence("stepping_stone"),
                pt.log_evidence("ti"))

    a, ssa, tia = run(None)
    b, ssb, tib = run(make_walker_mesh())
    np.testing.assert_array_equal(a, b)
    # the accumulators reduce over the SHARDED walker axis — cross-device
    # summation order differs, so near-equality is the right bar here
    assert ssa == pytest.approx(ssb, rel=1e-5)
    assert tia == pytest.approx(tib, rel=1e-5)


def test_reset_evidence_restarts_accumulation():
    pt = ParallelTemperingSampler(
        loglike_fn=loglike, logprior_fn=logprior, n_walkers=32,
        n_params=1, betas=power_ladder(4), seed=0,
    )
    pt.init_ball(np.zeros(1), scale=1.0)
    pt.run_mcmc(50, thin=50)
    n_before = float(pt.state.acc_n)
    assert n_before == 50
    pt.reset_evidence()
    assert float(pt.state.acc_n) == 0
    with pytest.raises(RuntimeError, match="no accumulated"):
        pt.log_evidence()
    pt.run_mcmc(10, thin=10)
    assert float(pt.state.acc_n) == 10


def test_power_mode_validation():
    with pytest.raises(ValueError, match="BOTH"):
        ParallelTemperingSampler(
            loglike_fn=loglike, n_walkers=8, n_params=1
        )
    with pytest.raises(ValueError, match="either"):
        ParallelTemperingSampler(
            logp_fn=loglike, loglike_fn=loglike, logprior_fn=logprior,
            n_walkers=8, n_params=1,
        )
    # beta=0 rung without a proper prior to fall back on is rejected
    with pytest.raises(ValueError, match="improper"):
        ParallelTemperingSampler(
            logp_fn=loglike, n_walkers=8, n_params=1,
            betas=power_ladder(4),
        )
    # movers without a propose() (slice) can't do power-posterior accepts
    from mcmcpp_tpu.movers.slice import EnsembleSliceMove

    with pytest.raises(ValueError, match="propose-based"):
        ParallelTemperingSampler(
            loglike_fn=loglike, logprior_fn=logprior, n_walkers=8,
            n_params=1, mover=EnsembleSliceMove(),
        )
    # plain mode has no evidence accumulators
    pt = ParallelTemperingSampler(
        logp_fn=lambda t: -0.5 * jnp.sum(t * t), n_walkers=8, n_params=1,
        n_temps=2,
    )
    with pytest.raises(RuntimeError, match="power-posterior"):
        pt.reset_evidence()


def test_zero_likelihood_region_recovers():
    """Walkers initialized where L=0 (log L=-inf) must still move (the
    -inf-safe accept/swap guards) and the evidence must stay finite."""

    def ll_gated(t):
        # likelihood zero for t < 0, Gaussian otherwise
        return jnp.where(
            t[0] < 0.0, -jnp.inf, -0.5 * jnp.sum((t - 1.0) ** 2)
        )

    pt = ParallelTemperingSampler(
        loglike_fn=ll_gated, logprior_fn=logprior, n_walkers=64,
        n_params=1, betas=power_ladder(6), seed=0,
    )
    # start every walker in the dead zone
    pt.init_ball(np.full(1, -2.0), scale=0.3)
    pt.run_mcmc(300, thin=300)
    pt.reset_evidence()
    pt.run_mcmc(500, thin=5)
    ss = pt.log_evidence("stepping_stone")
    assert np.isfinite(ss)
    # truth: ∫ N(t;0,S0²) 1[t>0] exp(-(t-1)²/2) dt by quadrature
    g = np.linspace(0, 12, 100001)
    lp = (-0.5 * g**2 / S0**2 - 0.5 * np.log(2 * np.pi * S0**2)
          - 0.5 * (g - 1.0) ** 2)
    m = lp.max()
    truth = m + np.log(np.trapezoid(np.exp(lp - m), g))
    assert ss == pytest.approx(truth, abs=0.25)
    # all cold-chain samples landed in the support
    assert (pt.get_samples(flat=True) >= 0).all()


def test_tune_ladder_rejected_in_power_mode():
    """Log-gap tuning would destroy the required β=0 rung and silently
    invalidate the evidence contract — must raise."""
    pt = ParallelTemperingSampler(
        loglike_fn=loglike, logprior_fn=logprior, n_walkers=16,
        n_params=1, betas=power_ladder(4), seed=0,
    )
    pt.init_ball(np.zeros(1), scale=1.0)
    with pytest.raises(RuntimeError, match="power-posterior"):
        pt.tune_ladder(n_blocks=1, block_steps=5)


def test_ti_survives_hard_constraints():
    """A -inf log-likelihood walker must not NaN-poison the TI Welford
    accumulator (per-rung finite masking); TI warns and stays finite."""

    def ll_gated(t):
        return jnp.where(
            t[0] < 0.0, -jnp.inf, -0.5 * jnp.sum((t - 1.0) ** 2)
        )

    pt = ParallelTemperingSampler(
        loglike_fn=ll_gated, logprior_fn=logprior, n_walkers=64,
        n_params=1, betas=power_ladder(6), seed=0,
    )
    pt.init_ball(np.full(1, -2.0), scale=0.3)  # all walkers start dead
    pt.run_mcmc(200, thin=200)
    pt.reset_evidence()
    pt.run_mcmc(300, thin=5)
    with pytest.warns(UserWarning, match="non-finite|conditioned"):
        ti = pt.log_evidence("ti")
    assert np.isfinite(ti)
    betas, means = pt.ti_curve()
    assert np.isfinite(means[1:]).all()  # all rungs above β=0 recovered
