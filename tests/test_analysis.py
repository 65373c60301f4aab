"""Analysis-layer tests: the AR(1) ACT oracle (the reference's statistical
baseline, test/sequential/AcTime/src/main.cpp:16-22) plus covariance,
histogram, and percentile correctness on known data."""

from pathlib import Path

import numpy as np
import pytest

from mcmcpp_tpu import EnsembleSampler, AutoRegressiveMove, SequenceMove
from mcmcpp_tpu.analysis import (
    autocorr_time,
    normalized_autocov,
    covariance_matrix,
    correlation_matrix,
    CornerHistograms,
    PercentileAndMaximumFinder,
    effective_sample_size,
)


def _dummy_logp(theta):
    return 0.0 * theta[0]


class TestAutocorrOracle:
    """≙ test/sequential/AcTime: AR(1) ensembles with analytic τ=(1+φ)/(1−φ)."""

    @pytest.mark.slow
    def test_ar1_act_table(self):
        # φ → τ: 0.8 → 9, 0.904761904762 → 20 (reduced steps vs the
        # reference's 262143 to keep CPU CI fast; tolerance scaled to match)
        phis = [0.8, 0.904761904762]
        true_taus = [9.0, 20.0]
        mover = AutoRegressiveMove(
            offsets=[1.0, 1.0], phis=phis, variances=[1.0, 1.0]
        )
        s = EnsembleSampler(_dummy_logp, 100, 2, mover=mover, seed=0)
        import jax

        s.set_initial_walker_pos(
            mover.initial_positions(jax.random.key(0), 100)
        )
        assert s.run_mcmc(65536)
        taus = autocorr_time(s.get_samples())
        for est, true in zip(taus, true_taus):
            assert est > 0, f"window failed to close: {est}"
            assert abs(est - true) / true < 0.12, f"tau {est} vs true {true}"

    @pytest.mark.slow
    def test_geyer_matches_ar1_oracle_and_sokal(self):
        """method="geyer" (Stan's initial-monotone-sequence rule) must
        hit the same AR(1) analytic taus as the Sokal window."""
        phis = [0.8, 0.904761904762]
        true_taus = [9.0, 20.0]
        mover = AutoRegressiveMove(
            offsets=[1.0, 1.0], phis=phis, variances=[1.0, 1.0]
        )
        s = EnsembleSampler(_dummy_logp, 100, 2, mover=mover, seed=3)
        import jax

        s.set_initial_walker_pos(
            mover.initial_positions(jax.random.key(3), 100)
        )
        assert s.run_mcmc(65536)
        g = autocorr_time(s.get_samples(), method="geyer")
        sk = autocorr_time(s.get_samples())
        for est, ref, true in zip(g, sk, true_taus):
            assert abs(est - true) / true < 0.12, (est, true)
            assert abs(est - ref) / ref < 0.05, (est, ref)

    def test_geyer_white_noise_and_truncation(self):
        from mcmcpp_tpu.analysis.autocorr import _geyer_tau

        rng = np.random.default_rng(1)
        wn = rng.standard_normal((4000, 16))
        assert abs(autocorr_time(wn, method="geyer") - 1.0) < 0.05
        # monotone envelope: an artificially non-monotone positive rho
        # must be clipped, and the first nonpositive pair truncates
        rho = np.array([1.0, 0.2, 0.5, 0.1, -0.4, -0.2, 0.3, 0.3])
        # pairs: 1.2, 0.6, -0.6 -> keep [1.2, 0.6] -> tau = 2*1.8-1
        assert _geyer_tau(rho) == pytest.approx(2 * 1.8 - 1.0)
        # geyer never returns the negative never-closed flag
        assert _geyer_tau(np.ones(128)) > 0

    def test_autocorr_bad_method(self):
        with pytest.raises(ValueError, match="method"):
            autocorr_time(np.zeros((10, 4)), method="bartlett")

    def test_unconverged_returns_negative(self):
        # window that never closes must flag non-convergence with a negative
        # estimate (≙ AutoCorrCalc.h:204-206): ρ ≡ 1 ⇒ τ(m) = 2m+1 > m/c ∀m
        from mcmcpp_tpu.analysis.autocorr import _sokal_window_tau

        rho = np.ones(128)
        tau = _sokal_window_tau(rho, window_scaling=4.0)
        assert tau < 0
        assert tau == pytest.approx(-(2 * 128 - 1))

    def test_walker_subset(self):
        import jax

        mover = AutoRegressiveMove([0.0], [0.8], [1.0])
        s = EnsembleSampler(_dummy_logp, 64, 1, mover=mover, seed=0)
        s.set_initial_walker_pos(mover.initial_positions(jax.random.key(1), 64))
        s.run_mcmc(32768)
        tau_all = autocorr_time(s.get_samples())
        tau_sub = autocorr_time(
            s.get_samples(), walkers_to_use=16, key=jax.random.key(2)
        )
        assert abs(tau_sub[0] - tau_all[0]) / tau_all[0] < 0.25

    def test_chunked_matches_unchunked(self):
        rng = np.random.default_rng(0)
        x = rng.standard_normal((4096, 32, 2)).astype(np.float32)
        a = autocorr_time(x)
        b = autocorr_time(x, walker_chunk=7)
        assert np.allclose(a, b, rtol=1e-4)


class TestNormalizedAutocov:
    def test_white_noise(self):
        rng = np.random.default_rng(1)
        x = rng.standard_normal(65536)
        rho = normalized_autocov(x)
        assert rho[0] == pytest.approx(1.0)
        assert np.abs(rho[1:100]).max() < 0.05

    def test_ar1_rho_decay(self):
        rng = np.random.default_rng(2)
        phi, n = 0.9, 1 << 17
        eps = rng.standard_normal(n)
        x = np.empty(n)
        x[0] = eps[0]
        for t in range(1, n):
            x[t] = phi * x[t - 1] + eps[t]
        rho = normalized_autocov(x)
        for lag in (1, 5, 10):
            assert rho[lag] == pytest.approx(phi**lag, abs=0.03)


class TestCovariance:
    def test_known_gaussian(self):
        rng = np.random.default_rng(3)
        true = np.array([[2.0, 0.6], [0.6, 1.0]])
        l = np.linalg.cholesky(true)
        x = rng.standard_normal((200_000, 2)) @ l.T
        cov = covariance_matrix(x)
        assert np.allclose(cov, true, atol=0.03)
        corr = correlation_matrix(x)
        assert np.allclose(np.diag(corr), 1.0)
        assert corr[0, 1] == pytest.approx(0.6 / np.sqrt(2.0), abs=0.02)

    def test_thin_burn(self):
        x = np.arange(40, dtype=np.float64).reshape(10, 2, 2)
        full = covariance_matrix(x)
        sub = covariance_matrix(x, burn_in=2, thin=2)
        assert sub.shape == full.shape == (2, 2)


class TestHistograms:
    def test_counts_and_csv(self, tmp_path):
        rng = np.random.default_rng(4)
        x = rng.standard_normal((10_000, 3))
        ch = CornerHistograms(n_bins=50).calculate(x)
        assert len(ch.hist1d) == 3
        assert len(ch.hist2d) == 3  # P(P-1)/2
        assert all(c.sum() == 10_000 for c, _ in ch.hist1d)
        out = ch.save_csv(str(tmp_path))
        import os

        files = os.listdir(out)
        assert len([f for f in files if "_1d_" in f]) == 3
        assert len([f for f in files if "_2d_" in f and "edges" not in f]) == 3
        # 2-D histograms also persist their bin edges (axes recoverable)
        assert len([f for f in files if "_2d_" in f and "edges" in f]) == 3

    def test_degenerate_param(self):
        x = np.zeros((100, 2))
        x[:, 1] = np.linspace(0, 1, 100)
        ch = CornerHistograms(n_bins=10).calculate(x)
        assert ch.hist1d[0][0].sum() == 100  # constant param still binned


class TestPercentiles:
    def test_roundtrip_gaussian(self):
        rng = np.random.default_rng(5)
        x = rng.standard_normal((500_000, 1))
        pf = PercentileAndMaximumFinder(n_bins=4096).process_chain_data(x)
        # value→percentile
        assert pf.get_percentile_from_value(0, 0.0) == pytest.approx(50.0, abs=0.5)
        assert pf.get_percentile_from_value(0, 1.6449) == pytest.approx(95.0, abs=0.5)
        # percentile→value
        assert pf.get_value_from_percentile(0, 50.0) == pytest.approx(0.0, abs=0.02)
        assert pf.get_value_from_percentile(0, 97.5) == pytest.approx(1.96, abs=0.05)
        # mode
        assert pf.get_peak_location(0) == pytest.approx(0.0, abs=0.15)

    def test_all_negative_data(self):
        # the reference's min()-vs-lowest() bound bug would break this
        rng = np.random.default_rng(6)
        x = rng.standard_normal((50_000, 1)) - 100.0
        pf = PercentileAndMaximumFinder().process_chain_data(x)
        assert pf.get_value_from_percentile(0, 50.0) == pytest.approx(-100.0, abs=0.05)

    def test_csv(self, tmp_path):
        x = np.random.default_rng(7).standard_normal((1000, 2))
        pf = PercentileAndMaximumFinder(n_bins=64).process_chain_data(x)
        out = pf.save_csv(str(tmp_path))
        import os

        assert len(os.listdir(out)) == 2


class TestSequenceMove:
    def test_deterministic_sequence(self):
        # ≙ test/*/InnerBenchmark deterministic oracle (SequenceMove.h)
        mover = SequenceMove(step_sizes=[1.0, 0.5])
        s = EnsembleSampler(_dummy_logp, 8, 2, mover=mover, seed=0)
        import jax

        s.set_initial_walker_pos(mover.initial_positions(jax.random.key(0), 8))
        s.run_mcmc(10)
        samples = s.get_samples()
        for t in range(10):
            assert np.allclose(samples[t, :, 0], (t + 1) * 1.0)
            assert np.allclose(samples[t, :, 1], (t + 1) * 0.5)
        assert s.acceptance_fraction == 1.0


class TestESS:
    def test_iid_ess_near_total(self):
        rng = np.random.default_rng(8)
        x = rng.standard_normal((4096, 16, 1))
        ess = effective_sample_size(x)
        assert 0.5 * 4096 * 16 < ess[0] < 1.6 * 4096 * 16


class TestStreamingACT:
    """Step-chunked / online ACT must reproduce the batch FFT estimate."""

    @staticmethod
    def _ar1(S=20000, W=16, P=3, seed=0, offset=1000.0):
        rng = np.random.default_rng(seed)
        phi = np.array([0.5, 0.8, 0.9])[:P]
        x = np.zeros((S, W, P))
        x[0] = rng.normal(size=(W, P)) / np.sqrt(1 - phi**2)
        for t in range(1, S):
            x[t] = phi * x[t - 1] + np.sqrt(1 - phi**2) * rng.normal(
                size=(W, P)
            )
        return x + offset  # offset stresses the raw-product centering

    def test_matches_batch_fft(self):
        from mcmcpp_tpu.analysis import autocorr_time_streaming

        x = self._ar1()
        t_batch = autocorr_time(x)
        t_stream = autocorr_time_streaming(
            (x[i : i + 3000] for i in range(0, len(x), 3000)), max_lag=512
        )
        np.testing.assert_allclose(t_stream, t_batch, rtol=0.02)

    def test_rho_agreement_any_chunking(self):
        from mcmcpp_tpu.analysis import StreamingACT

        x = self._ar1(S=6000)
        acc = StreamingACT(max_lag=64)
        for i in range(0, len(x), 1234):  # ragged chunks
            acc.update(x[i : i + 1234])
        rho_s = acc.normalized_autocov()
        rho_b = np.stack([
            normalized_autocov(x[:, :, p].T).mean(axis=0)[:65]
            for p in range(x.shape[2])
        ])
        assert np.abs(rho_s - rho_b).max() < 1e-4

    def test_short_chain_and_2d_input(self):
        from mcmcpp_tpu.analysis import StreamingACT

        x = self._ar1(S=100)
        acc = StreamingACT(max_lag=256)  # max_lag > chain length
        acc.update(x)
        assert acc.autocorr_time().shape == (3,)
        acc2 = StreamingACT(max_lag=32)
        acc2.update(x[:, :, 0])  # (S, W)
        assert acc2.autocorr_time().shape == (1,)

    def test_consume_chain_online(self):
        """chunk_action wiring: online estimate == post-hoc estimate."""
        import jax
        from mcmcpp_tpu import AutoRegressiveMove, EnsembleSampler
        from mcmcpp_tpu.analysis import StreamingACT

        mover = AutoRegressiveMove(offsets=[0.0], phis=[0.8], variances=[1.0])
        s = EnsembleSampler(_dummy_logp, 64, 1, mover=mover, seed=3)
        s.set_initial_walker_pos(mover.initial_positions(jax.random.key(1), 64))
        act = StreamingACT(max_lag=256)
        assert s.run_mcmc(8192, chunk_action=act.consume_chain)
        tau_online = act.autocorr_time()
        tau_post = autocorr_time(s.get_samples())
        assert tau_online[0] > 0
        np.testing.assert_allclose(tau_online[0], tau_post, rtol=0.02)
        assert abs(tau_online[0] - 9.0) / 9.0 < 0.25  # AR(1) truth


class TestBulkTailESS:
    """Vehtari et al. (2021) rank-normalized bulk ESS and tail ESS."""

    @staticmethod
    def _iid(S=2000, W=8, P=2, seed=0, heavy=False):
        rng = np.random.default_rng(seed)
        if heavy:
            return rng.standard_cauchy(size=(S, W, P))
        return rng.normal(size=(S, W, P))

    def test_iid_bulk_tail_near_total(self):
        from mcmcpp_tpu.analysis import ess_bulk, ess_tail

        x = self._iid()
        n = x.shape[0] * x.shape[1]
        for f in (ess_bulk, ess_tail):
            e = f(x)
            assert e.shape == (2,)
            assert np.all(e > 0.5 * n) and np.all(e < 1.6 * n), (f, e)

    def test_bulk_robust_to_heavy_tails(self):
        """Cauchy iid draws: plain ESS is unstable (infinite variance);
        rank-normalized bulk ESS must stay near the total count."""
        from mcmcpp_tpu.analysis import ess_bulk

        x = self._iid(heavy=True, seed=1)
        n = x.shape[0] * x.shape[1]
        e = ess_bulk(x)
        assert np.all(e > 0.5 * n), e

    def test_correlated_chain_reduces_ess(self):
        from mcmcpp_tpu.analysis import ess_bulk, ess_tail

        rng = np.random.default_rng(2)
        phi = 0.9  # tau = 19 -> ESS ~ n/19
        S, W = 4000, 8
        x = np.zeros((S, W, 1))
        for t in range(1, S):
            x[t] = phi * x[t - 1] + np.sqrt(1 - phi**2) * rng.normal(
                size=(W, 1)
            )
        n = S * W
        eb, et = ess_bulk(x)[0], ess_tail(x)[0]
        assert n / 40 < eb < n / 10, eb  # ~n/19
        assert et < n / 5, et


def test_hdi_matches_analytic_normal_and_skew():
    from mcmcpp_tpu.analysis import hdi

    rng = np.random.default_rng(0)
    x = rng.normal(2.0, 1.5, 200_000)
    lo, hi = hdi(x, prob=0.94)
    # symmetric: HDI == central interval == mean ± 1.8808σ
    from scipy import stats as sps

    z = sps.norm.ppf(0.97)
    assert lo == pytest.approx(2.0 - z * 1.5, abs=0.03)
    assert hi == pytest.approx(2.0 + z * 1.5, abs=0.03)
    # skewed: HDI must be SHORTER than the central interval
    y = rng.gamma(2.0, 1.0, 200_000)
    lo_h, hi_h = hdi(y, prob=0.9)
    lo_c, hi_c = np.quantile(y, [0.05, 0.95])
    assert (hi_h - lo_h) < (hi_c - lo_c)
    assert lo_h < lo_c  # mass near zero pulls the HDI left
    # chain-layout and multi-parameter shapes
    chain = rng.normal(size=(100, 8, 3))
    lo3, hi3 = hdi(chain)
    assert lo3.shape == hi3.shape == (3,)
    with pytest.raises(ValueError, match="prob"):
        hdi(np.arange(5.0), prob=1.0)


def test_ppc_pvalue_flags_misfit():
    from mcmcpp_tpu.analysis import ppc_pvalue

    rng = np.random.default_rng(1)
    obs = rng.normal(0, 1, 1000)  # large n: T(y_obs) near its expectation
    rep_good = rng.normal(0, 1, (500, 1000))
    rep_bad = rng.normal(0, 0.3, (500, 1000))  # model too narrow
    p_good = ppc_pvalue(np.var, obs, rep_good)
    p_bad = ppc_pvalue(np.var, obs, rep_bad)
    assert 0.05 < p_good < 0.95
    assert p_bad < 0.01


class TestNestedRhat:
    """Nested R-hat (Margossian et al. 2023) — the many-short-chains
    diagnostic for the massively-parallel-walkers regime."""

    def test_iid_near_one(self):
        from mcmcpp_tpu.analysis import nested_rhat

        rng = np.random.default_rng(0)
        r = nested_rhat(rng.standard_normal((50, 64, 3)), 8)
        assert r.shape == (3,)
        assert (r < 1.01).all(), r

    def test_one_draw_per_chain_detects_dispersion(self):
        """The headline property: meaningful at N=1 draws/chain, where
        split-R-hat is undefined — dispersed superchain means flagged."""
        from mcmcpp_tpu.analysis import nested_rhat

        rng = np.random.default_rng(1)
        good = rng.standard_normal((1, 64))
        bad = good + np.repeat(np.arange(8), 8) * 3.0
        assert nested_rhat(good[:, :, None], 8)[0] < 1.2
        assert nested_rhat(bad, 8) > 2.0

    def test_unmixed_superchains_flagged(self):
        """Superchains stuck at distinct modes: nR >> 1 even though each
        superchain's own chains agree (W small, B large)."""
        from mcmcpp_tpu.analysis import nested_rhat

        rng = np.random.default_rng(2)
        x = 0.05 * rng.standard_normal((20, 32, 1))
        x[:, 16:, :] += 4.0  # half the superchains in another mode
        assert nested_rhat(x, 4)[0] > 3.0

    def test_sampler_end_to_end_converges(self):
        """Short ensemble run, superchains = init groups: after mixing,
        nR-hat ~ 1 on a unit Gaussian."""
        import jax.numpy as jnp

        from mcmcpp_tpu import EnsembleSampler
        from mcmcpp_tpu.analysis import nested_rhat

        s = EnsembleSampler(
            lambda t: -0.5 * jnp.sum(t * t), 64, 2, seed=4
        )
        # superchain k initialized in its own ball (overdispersion
        # ACROSS superchains, common point within — the paper's scheme)
        centers = np.repeat(np.linspace(-2, 2, 8), 8)
        init = centers[:, None] + 0.01 * np.random.default_rng(5
            ).standard_normal((64, 2))
        s.set_initial_walker_pos(init)
        s.run_mcmc(400, store=False)
        s.run_mcmc(200)
        r = nested_rhat(s.get_samples(), 8)
        assert (r < 1.05).all(), r

    def test_validation(self):
        from mcmcpp_tpu.analysis import nested_rhat

        with pytest.raises(ValueError, match="divisible"):
            nested_rhat(np.zeros((5, 10, 1)), 4)
        with pytest.raises(ValueError, match="at least 2"):
            nested_rhat(np.zeros((5, 8, 1)), 1)
        with pytest.raises(ValueError, match="steps"):
            nested_rhat(np.zeros((5,)), 2)


class TestRstar:
    """R* classifier diagnostic (Lambert & Vehtari 2022).

    The sklearn-touching calls run in a SUBPROCESS: importing sklearn's
    OpenMP runtime into a pytest worker that also drives XLA's
    in-process LLVM measured a hard `Fatal Python error: Aborted` later
    in the same worker (first full-suite run with in-process R* tests,
    2026-08-20 — the abort landed in an unrelated IF2 test). rstar()
    itself is numpy+sklearn only; isolating the import costs one
    interpreter spawn per test class.
    """

    @staticmethod
    def _rstar_subprocess(script):
        import json
        import subprocess
        import sys

        r = subprocess.run(
            [sys.executable, "-c", script], capture_output=True,
            text=True, timeout=600,
        )
        assert r.returncode == 0, r.stderr[-2000:]
        return json.loads(r.stdout.splitlines()[-1])

    @pytest.mark.slow
    def test_regimes_detected(self):
        """mixed ~1; one-chain-offset flagged; joint-only structure
        (identical marginals, split-R-hat blind) flagged too."""
        out = self._rstar_subprocess("""
import json
import numpy as np
import sys
sys.path.insert(0, {repo!r})
from mcmcpp_tpu.analysis.rstar import rstar

rng = np.random.default_rng(0)
good = rng.standard_normal((150, 4, 3))
bad = good.copy(); bad[:, 0, :] += 2.5
x = np.random.default_rng(2).standard_normal((400, 4, 2))
r1 = np.random.default_rng(1)
z = r1.standard_normal(400)
x[:, 0, 0] = z
x[:, 0, 1] = 0.95 * z + np.sqrt(1 - 0.95**2) * r1.standard_normal(400)
print(json.dumps({{
    "mixed": rstar(good, max_iter=40, n_threads=1),
    "stuck": rstar(bad, max_iter=40, n_threads=1),
    "joint": rstar(x, max_iter=60, n_threads=1),
}}))
""".format(repo=str(Path(__file__).resolve().parents[1])))
        assert 0.6 < out["mixed"] < 1.25, out
        assert out["stuck"] > 1.4, out
        assert out["joint"] > 1.15, out

    def test_validation(self):
        """Input validation raises BEFORE sklearn is imported, so it is
        safe (and fast) to exercise in-process."""
        from mcmcpp_tpu.analysis import rstar

        with pytest.raises(ValueError, match="chains"):
            rstar(np.zeros((10, 1, 2)))
        with pytest.raises(ValueError, match="test_frac"):
            rstar(np.zeros((10, 4, 2)), test_frac=1.5)
        with pytest.raises(ValueError, match="steps"):
            rstar(np.zeros((10,)))


class TestMcseQuantile:
    """mcse_quantile (Vehtari et al. 2021 §4.3 order-statistic Beta
    interval through the indicator ESS)."""

    def test_iid_matches_asymptotic(self):
        from scipy.stats import norm

        from mcmcpp_tpu.analysis import mcse_quantile

        x = np.random.default_rng(0).standard_normal((500, 32, 1))
        for q in (0.5, 0.9):
            est = mcse_quantile(x, q)[0]
            asym = (np.sqrt(q * (1 - q) / x.size)
                    / norm.pdf(norm.ppf(q)))
            assert 0.6 * asym < est < 1.6 * asym, (q, est, asym)

    def test_autocorrelation_inflates_mcse(self):
        """An AR(1) chain must report a LARGER quantile MCSE than an
        iid sample of the same size (the whole point vs the plug-in)."""
        from mcmcpp_tpu.analysis import mcse_quantile

        rng = np.random.default_rng(1)
        phi = 0.9
        e = rng.standard_normal((2000, 8))
        x = np.zeros_like(e)
        for t in range(1, 2000):
            x[t] = phi * x[t - 1] + np.sqrt(1 - phi * phi) * e[t]
        iid = rng.standard_normal((2000, 8))
        assert mcse_quantile(x, 0.5) > 2.0 * mcse_quantile(iid, 0.5)

    def test_stuck_chains_degrade_to_nan(self):
        """Per-chain-constant indicator (chains in separate modes) must
        return NaN like mcse_mean, never raise (review fix: NaN ESS
        propagated into np.quantile as an invalid quantile)."""
        from mcmcpp_tpu.analysis import mcse_quantile

        x = np.stack([np.full(500, -1.0), np.full(500, 1.0)], axis=1)
        x += 1e-3 * np.random.default_rng(3).standard_normal(x.shape)
        out = mcse_quantile(x[:, :, None], 0.5)
        assert out.shape == (1,)
        assert np.isnan(out[0])

    def test_validation_and_shapes(self):
        from mcmcpp_tpu.analysis import mcse_quantile

        x = np.random.default_rng(2).standard_normal((100, 4, 3))
        out = mcse_quantile(x, 0.25)
        assert out.shape == (3,) and (out > 0).all()
        assert isinstance(mcse_quantile(x[:, :, 0], 0.5), float)
        with pytest.raises(ValueError, match="prob"):
            mcse_quantile(x, 1.5)
        with pytest.raises(ValueError, match="steps"):
            mcse_quantile(np.zeros(5), 0.5)
