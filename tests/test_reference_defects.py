"""Regression tests: the reference's documented defects must NOT exist here.

SURVEY.md §2 lists observed defects in jmatta1/MCMCpp. Each test below pins
the corrected behavior (citations are to the defective reference code).
"""

import numpy as np
import jax
import pytest

from mcmcpp_tpu import EnsembleSampler, AutoRegressiveMove, analysis
from mcmcpp_tpu.analysis.histograms import CornerHistograms
from mcmcpp_tpu.analysis.percentiles import PercentileAndMaximumFinder


def test_all_negative_data_histogram_bounds():
    """CornerHistograms.h:411 inits the max bound with min() (smallest
    POSITIVE float) instead of lowest() — all-negative data got a bogus
    upper bound. Our auto-binning must cover all-negative samples."""
    rng = np.random.default_rng(0)
    samples = -10.0 + rng.standard_normal((2000, 2)).astype(np.float32)
    ch = CornerHistograms(n_bins=32).calculate(samples)
    for i in range(2):
        counts, edges = ch.hist1d[i]
        assert counts.sum() == 2000  # every sample landed in a bin
        assert edges[0] <= samples[:, i].min()
        assert edges[-1] >= samples[:, i].max()
        assert edges[-1] < 0  # bounds actually track the (negative) data


def test_all_negative_data_percentiles():
    """Same defect in PercentileAndMaximumFinder.h:542."""
    rng = np.random.default_rng(1)
    samples = (-5.0 + 0.5 * rng.standard_normal((5000, 1))).astype(np.float32)
    pf = PercentileAndMaximumFinder(n_bins=512).process_chain_data(samples)
    med = pf.get_value_from_percentile(0, 50.0)
    assert med == pytest.approx(-5.0, abs=0.1)
    assert pf.get_peak_location(0) == pytest.approx(-5.0, abs=0.2)


def test_act_no_cross_walker_contamination():
    """AutoCorrCalc.h:234-240 accumulates walker k's autocovariance into
    walker k-1's scratch (never zeroed). Construct walkers with WILDLY
    different AR coefficients; the pooled estimate must land between the
    per-walker truths, which only happens if each walker's series is
    processed cleanly."""
    phis = np.array([0.9])
    mover = AutoRegressiveMove(np.zeros(1), phis, np.ones(1))
    s = EnsembleSampler(lambda t: 0.0, n_walkers=64, n_params=1, seed=0,
                        mover=mover)
    s.set_initial_walker_pos(mover.initial_positions(jax.random.key(1), 64))
    s.run_mcmc(32768)
    tau = analysis.autocorr_time(s.get_samples())
    truth = (1 + 0.9) / (1 - 0.9)  # 19
    assert tau[0] == pytest.approx(truth, rel=0.1)


def test_act_walker_subset_uses_uniform_selection():
    """AutoCorrCalc.h:290-303 drew the Knuth subset from a NORMAL
    distribution (invalid). Our subset path must give estimates consistent
    with the full-ensemble estimate."""
    phis = np.array([0.8])
    mover = AutoRegressiveMove(np.zeros(1), phis, np.ones(1))
    s = EnsembleSampler(lambda t: 0.0, n_walkers=100, n_params=1, seed=2,
                        mover=mover)
    s.set_initial_walker_pos(mover.initial_positions(jax.random.key(3), 100))
    s.run_mcmc(16384)
    full = analysis.autocorr_time(s.get_samples())
    sub = analysis.autocorr_time(
        s.get_samples(), walkers_to_use=30, key=jax.random.key(4)
    )
    assert sub[0] == pytest.approx(full[0], rel=0.15)


def test_parallel_subsample_resume():
    """Both thread controllers stored `false` instead of `true` after the
    skip interval (RedBlkCtrlerSpinLock.h:297-300) — parallel thinned runs
    would save only the first step. Our sharded sampler must store exactly
    n_steps/thin steps."""
    from mcmcpp_tpu import ShardedEnsembleSampler
    from tests.targets import skewed_gaussian_logp

    s = ShardedEnsembleSampler(skewed_gaussian_logp, n_walkers=32, n_params=2,
                               seed=5)
    s.init_ball(np.zeros(2), scale=0.3, seed=6)
    s.run_mcmc(60, thin=5)
    assert s.stored_steps == 12
    # stored rows must not all be identical (i.e. saving continued)
    samples = s.get_samples()
    assert not np.allclose(samples[0], samples[-1])
