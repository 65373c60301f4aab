"""Simulation-based calibration: the calibrated pipeline passes, broken
pipelines fail with the documented signatures (Talts et al. 2018)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mcmcpp_tpu.analysis import sbc_ranks, sbc_summary, sbc_uniformity

# conjugate scalar model: θ ~ N(0, τ²), y_i | θ ~ N(θ, 1), i=1..N_OBS
TAU = 1.5
N_OBS = 8
L_DRAWS = 63  # ranks on {0..63}: clean power-of-two binning


def prior_sample(key):
    return TAU * jax.random.normal(key, (1,))


def simulate(key, theta):
    return theta[0] + jax.random.normal(key, (N_OBS,))


def _posterior(y):
    prec = 1.0 / TAU**2 + N_OBS
    return jnp.sum(y) / prec, 1.0 / prec  # mean, var


def fit_exact(key, y):
    mu, var = _posterior(y)
    return mu + jnp.sqrt(var) * jax.random.normal(key, (L_DRAWS, 1))


def test_exact_posterior_is_calibrated():
    ranks = sbc_ranks(prior_sample, simulate, fit_exact, n_sims=256,
                      seed=0, vectorized=True)
    assert ranks.shape == (256, 1)
    assert ranks.min() >= 0 and ranks.max() <= L_DRAWS
    stats, p = sbc_uniformity(ranks, L_DRAWS)
    assert p[0] > 0.01, f"exact posterior flagged miscalibrated: p={p[0]}"
    assert "calibrated" in sbc_summary(ranks, L_DRAWS, names=["theta"])


@pytest.mark.parametrize(
    "scale,shift,signature",
    [
        (0.3, 0.0, "overconfident"),  # too narrow → ∪-shaped ranks
        (4.0, 0.0, "wide"),  # too wide → ∩-shaped
        (1.0, 1.0, "overestimates"),  # shifted up → θ* ranks low
    ],
)
def test_broken_posteriors_are_flagged(scale, shift, signature):
    def fit_broken(key, y):
        mu, var = _posterior(y)
        return (mu + shift) + scale * jnp.sqrt(var) * jax.random.normal(
            key, (L_DRAWS, 1)
        )

    ranks = sbc_ranks(prior_sample, simulate, fit_broken, n_sims=256,
                      seed=1, vectorized=True)
    stats, p = sbc_uniformity(ranks, L_DRAWS)
    assert p[0] < 1e-4, f"{signature} pipeline not flagged: p={p[0]}"
    assert signature in sbc_summary(ranks, L_DRAWS)


def test_host_loop_matches_vectorized():
    rv = sbc_ranks(prior_sample, simulate, fit_exact, n_sims=16, seed=2,
                   vectorized=True)
    rh = sbc_ranks(prior_sample, simulate, fit_exact, n_sims=16, seed=2,
                   vectorized=False)
    np.testing.assert_array_equal(rv, rh)


def test_uniformity_bins_divide_levels():
    # 64 levels, default bins → a divisor of 64, expected counts exact
    ranks = np.random.default_rng(0).integers(0, 64, size=(200, 1))
    stats, p = sbc_uniformity(ranks, 63)
    assert np.isfinite(stats).all() and (0 <= p).all() and (p <= 1).all()


@pytest.mark.slow
def test_end_to_end_ensemble_sampler_calibrated():
    """Full-pipeline SBC: EnsembleSampler fits of the conjugate model,
    thinned past the ACT, must produce uniform ranks.

    64 sims (round-5 wall-time trim; was 96): the chi-square keeps
    ~5.3 expected counts/bin (12 auto bins), still a real calibration
    gate — the cost is per-fit COMPILATION (fresh closures), so sims
    are the only knob."""
    from mcmcpp_tpu import EnsembleSampler

    fit_count = [0]

    def fit_mcmc(key, y):
        # every sim builds fresh jit closures (new data, new logp), so the
        # executable cache only ACCUMULATES across the 96 fits — enough,
        # on top of a full-suite run, to segfault XLA's in-process
        # compiler. Caching buys nothing across sims; cap the buildup.
        fit_count[0] += 1
        if fit_count[0] % 16 == 0:
            jax.clear_caches()
        y = np.asarray(y)
        seed = int(jax.random.randint(key, (), 0, 2**31 - 1))

        def logp(t):
            return (-0.5 * t[0] ** 2 / TAU**2
                    - 0.5 * jnp.sum((y - t[0]) ** 2))

        s = EnsembleSampler(logp, n_walkers=32, n_params=1, seed=seed)
        s.init_ball(np.zeros(1), scale=0.5, seed=seed + 1)
        # ONE stored run per fit (burn-in = discarded leading rows):
        # the per-fit cost is jit COMPILATION of fresh closures, so one
        # program instead of a nostore + a stored one halves the test
        s.run_mcmc(240, thin=10)
        draws = s.get_samples(burn_in=16, flat=True)
        idx = np.linspace(0, draws.shape[0] - 1, L_DRAWS).astype(int)
        return draws[idx]

    ranks = sbc_ranks(prior_sample, simulate, fit_mcmc, n_sims=64, seed=3)
    stats, p = sbc_uniformity(ranks, L_DRAWS)
    assert p[0] > 0.005, f"ensemble pipeline miscalibrated: p={p[0]}"


@pytest.mark.slow
def test_sbc_model_dsl_bridge_calibrated():
    """Declare once, calibrate the whole pipeline: prior draws and
    simulated datasets come from the Model's own sites."""
    from mcmcpp_tpu import EnsembleSampler
    from mcmcpp_tpu.analysis import sbc_model
    from mcmcpp_tpu.dsl import Model, Normal

    template_y = np.zeros(N_OBS, np.float32)  # placeholder data

    def build_model(sim):
        y = template_y if sim is None else sim["y"]
        return (Model()
                .param("theta", Normal(0.0, TAU))
                .observe("y", lambda p: Normal(p["theta"], 1.0), y))

    fit_count = [0]

    def fit(key, logp, dim):
        fit_count[0] += 1
        if fit_count[0] % 16 == 0:
            jax.clear_caches()  # see fit_mcmc: per-sim closures never hit
        seed = int(jax.random.randint(key, (), 0, 2**31 - 1))
        s = EnsembleSampler(logp, n_walkers=32, n_params=dim, seed=seed)
        s.init_ball(np.zeros(dim), scale=0.5, seed=seed + 1)
        s.run_mcmc(360, thin=20)  # one program; ~3-ACT spacing
        draws = s.get_samples(burn_in=10, flat=True)
        idx = np.linspace(0, draws.shape[0] - 1, L_DRAWS).astype(int)
        return draws[idx]

    ranks, n_draws = sbc_model(build_model, fit, n_sims=64, seed=5)
    assert n_draws == L_DRAWS
    assert ranks.shape == (64, 1)
    stats, p = sbc_uniformity(ranks, n_draws)
    assert p[0] > 0.005, f"DSL SBC pipeline miscalibrated: p={p[0]}"


def test_ecdf_band_calibrated_passes_broken_fails():
    from mcmcpp_tpu.analysis import sbc_ecdf_band

    ranks = sbc_ranks(prior_sample, simulate, fit_exact, n_sims=256,
                      seed=0, vectorized=True)
    out = sbc_ecdf_band(ranks, L_DRAWS, seed=1)
    assert not out["reject"][0], (
        f"exact posterior outside ECDF band: dev={out['max_deviation'][0]}"
        f" > {out['band']}")
    # the band is tighter than binning: a mildly narrow posterior (0.7x)
    # must be caught
    def fit_narrow(key, y):
        mu, var = _posterior(y)
        return mu + 0.7 * jnp.sqrt(var) * jax.random.normal(
            key, (L_DRAWS, 1))

    ranks_bad = sbc_ranks(prior_sample, simulate, fit_narrow, n_sims=256,
                          seed=2, vectorized=True)
    out_bad = sbc_ecdf_band(ranks_bad, L_DRAWS, seed=1)
    assert out_bad["reject"][0]
    # null calibration sanity: ~alpha of simulated uniform rank sets
    # fall outside their own band
    rng = np.random.default_rng(3)
    hits = 0
    for i in range(200):
        r = rng.integers(0, L_DRAWS + 1, size=(256, 1))
        hits += int(sbc_ecdf_band(r, L_DRAWS, n_sim=1500,
                                  seed=4)["reject"][0])
    assert 1 <= hits <= 25, f"null rejection rate off: {hits}/200"


def test_uniformity_prime_levels_regression():
    """L=100 → 101 levels (prime): the old divisor-based binning collapsed
    to one bin (df=0, p=NaN); integer-edge bins with per-bin expectations
    keep the test exact for any L."""
    L = 100
    rng = np.random.default_rng(1)
    ranks = rng.integers(0, L + 1, size=(400, 1))
    stats, p = sbc_uniformity(ranks, L)
    assert np.isfinite(stats).all() and np.isfinite(p).all()
    assert p[0] > 0.01  # uniform ranks must pass
    assert "calibrated" in sbc_summary(ranks, L)
    # a broken pipeline at prime levels is still flagged
    bad = np.clip(rng.integers(0, (L + 1) // 3, size=(400, 1)), 0, L)
    stats_b, p_b = sbc_uniformity(bad, L)
    assert p_b[0] < 1e-6
