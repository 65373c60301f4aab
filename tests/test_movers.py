"""Per-mover statistical tests on the skewed Gaussian (SURVEY.md §4).

Mirrors test/sequential/SkewedGaussian/{StretchMove,WalkMove,DiffEvo,MH}:
every mover must reproduce the analytic covariance
[[1+ε, (1−ε)/2], [(1−ε)/2, (1+ε)/4]], ε = 0.13.
"""

import numpy as np
import pytest

from mcmcpp_tpu import (
    EnsembleSampler,
    StretchMove,
    WalkMove,
    DifferentialEvolutionMove,
    MetropolisHastingsMove,
)
from tests.targets import skewed_gaussian_logp, skewed_gaussian_cov


def run_mover(mover, n_steps=4000, burn=800, n_walkers=100, seed=11):
    s = EnsembleSampler(skewed_gaussian_logp, n_walkers, 2, mover=mover, seed=seed)
    s.init_ball(np.zeros(2), scale=0.5)
    s.run_mcmc(burn, store=False)
    assert s.run_mcmc(n_steps)
    return s


def check_moments(s, atol=0.12):
    flat = s.get_samples(flat=True)
    cov = np.cov(flat.T)
    true = skewed_gaussian_cov()
    assert np.allclose(cov, true, atol=atol), f"cov=\n{cov}\ntrue=\n{true}"
    assert np.allclose(flat.mean(axis=0), 0.0, atol=0.15)


class TestWalkMove:
    @pytest.mark.slow
    def test_moments(self):
        s = run_mover(WalkMove(n_samples=6))
        check_moments(s)
        assert 0.25 < s.acceptance_fraction < 0.95

    def test_bad_n_samples(self):
        with pytest.raises(ValueError):
            WalkMove(n_samples=1)

    def test_n_samples_exceeds_half(self):
        with pytest.raises(ValueError):
            run_mover(WalkMove(n_samples=60), n_steps=2, burn=0)

    def test_gather_mode_moments(self):
        """Per-walker uniform S-subsets (reference-faithful semantics,
        WalkMove.h:130-150) sample the same posterior."""
        s = run_mover(WalkMove(n_samples=6, partner_mode="gather"),
                      n_steps=4000)
        check_moments(s, atol=0.15)

    @pytest.mark.slow
    def test_gather_mode_scales_to_large_w(self):
        """The per-walker subset path is O(n·s) memory: W=2^18 must run
        (the round-1 top-k-of-uniform trick materialized an (n, m) score
        matrix — 68 GB at this size — VERDICT item 6)."""
        import jax.numpy as jnp

        w = 1 << 18
        s = EnsembleSampler(
            lambda t: -0.5 * jnp.sum(t * t), w, 2,
            mover=WalkMove(n_samples=6, partner_mode="gather"), seed=0,
        )
        s.init_ball(np.zeros(2), scale=0.5)
        s.run_mcmc(3, store=False)
        assert s.total_steps == 3 * w


class TestDifferentialEvolution:
    def test_moments(self):
        s = run_mover(DifferentialEvolutionMove(), n_steps=6000)
        check_moments(s, atol=0.15)

    def test_custom_gamma(self):
        s = run_mover(DifferentialEvolutionMove(gamma=1.0), n_steps=3000)
        check_moments(s, atol=0.2)


class TestMetropolisHastings:
    def test_ideal_covariance(self):
        # ≙ test/sequential/SkewedGaussian/MH with the ideal matrix
        s = run_mover(
            MetropolisHastingsMove(covariance=skewed_gaussian_cov(), scale=1.2),
            n_steps=6000,
        )
        check_moments(s, atol=0.15)

    def test_identity_default(self):
        s = run_mover(MetropolisHastingsMove(scale=0.8), n_steps=6000)
        check_moments(s, atol=0.15)

    def test_diagonal_covariance(self):
        s = run_mover(
            MetropolisHastingsMove(covariance=np.array([1.1, 0.3])), n_steps=6000
        )
        check_moments(s, atol=0.15)

    def test_bad_covariance_falls_back_to_identity(self):
        # ≙ the deliberately-bad matrix branch of MH/src/main.cpp:74-97
        bad = np.array([[1.0, 2.0], [2.0, 1.0]])  # symmetric but not PD
        with pytest.warns(UserWarning, match="identity"):
            mover = MetropolisHastingsMove(covariance=bad)
        assert mover.fell_back_to_identity
        s = run_mover(mover, n_steps=6000)
        check_moments(s, atol=0.15)

    def test_asymmetric_covariance_rejected(self):
        with pytest.warns(UserWarning, match="symmetric"):
            m = MetropolisHastingsMove(covariance=np.array([[1.0, 0.5], [0.2, 1.0]]))
        assert m.fell_back_to_identity


class TestMixtureMover:
    @pytest.mark.slow
    def test_moments(self):
        from mcmcpp_tpu import MixtureMover, DifferentialEvolutionMove

        mover = MixtureMover([
            (StretchMove(), 2.0),
            (DifferentialEvolutionMove(), 1.0),
            (WalkMove(n_samples=4), 1.0),
        ])
        s = run_mover(mover, n_steps=6000)
        check_moments(s, atol=0.15)
        assert 0.2 < s.acceptance_fraction < 0.95

    def test_validation(self):
        from mcmcpp_tpu import MixtureMover, AutoRegressiveMove
        import numpy as _np

        with pytest.raises(ValueError):
            MixtureMover([])
        with pytest.raises(ValueError):
            MixtureMover([(StretchMove(), -1.0)])
        with pytest.raises(ValueError):
            MixtureMover([AutoRegressiveMove(_np.zeros(1), _np.zeros(1),
                                             _np.ones(1))])


class TestDESnooker:
    def test_moments(self):
        from mcmcpp_tpu import DESnookerMove

        s = run_mover(DESnookerMove(), n_steps=6000)
        check_moments(s, atol=0.15)
        assert 0.1 < s.acceptance_fraction < 0.95

    def test_gather_mode_moments(self):
        from mcmcpp_tpu import DESnookerMove

        s = run_mover(DESnookerMove(partner_mode="gather"), n_steps=4000)
        check_moments(s, atol=0.2)

    @pytest.mark.slow
    def test_mode_hopping_beats_plain_de(self):
        """Bimodal target with well-separated modes: snooker proposals jump
        along inter-walker lines, so cross-mode transitions should occur for
        many walkers; we require both modes populated in proportion."""
        import jax.numpy as jnp
        from mcmcpp_tpu import DESnookerMove, MixtureMover

        sep = 6.0

        def bimodal(t):
            a = -0.5 * jnp.sum((t - sep / 2) ** 2)
            b = -0.5 * jnp.sum((t + sep / 2) ** 2)
            return jnp.logaddexp(a, b)

        mover = MixtureMover([
            (DifferentialEvolutionMove(), 0.7),
            (DESnookerMove(), 0.3),
        ])
        s = EnsembleSampler(bimodal, 200, 2, mover=mover, seed=7)
        # start ALL walkers in one mode; mixing requires cross-mode jumps
        s.init_ball(np.full(2, sep / 2), scale=0.5)
        s.run_mcmc(2000, store=False)
        s.run_mcmc(4000)
        flat = s.get_samples(flat=True)
        frac_neg = float(np.mean(flat[:, 0] < 0))
        assert 0.3 < frac_neg < 0.7, frac_neg


class TestEnsembleSlice:
    """zeus-style differential slice move (Karamanis & Beutler 2021)."""

    @pytest.mark.slow
    def test_moments(self):
        from mcmcpp_tpu import EnsembleSliceMove

        s = run_mover(EnsembleSliceMove(), n_steps=2000, burn=400)
        check_moments(s)
        # slice sampling always moves (barring the astronomically-rare
        # shrink-cap fallback)
        assert s.acceptance_fraction > 0.999

    @pytest.mark.slow
    def test_gather_mode_moments(self):
        from mcmcpp_tpu import EnsembleSliceMove

        s = run_mover(EnsembleSliceMove(partner_mode="gather"),
                      n_steps=2000, burn=400)
        check_moments(s, atol=0.15)

    def test_deterministic_given_seed(self):
        from mcmcpp_tpu import EnsembleSliceMove

        a = run_mover(EnsembleSliceMove(), n_steps=50, burn=10, seed=7)
        b = run_mover(EnsembleSliceMove(), n_steps=50, burn=10, seed=7)
        np.testing.assert_array_equal(a.get_samples(), b.get_samples())

    def test_mu_scales_direction(self):
        """Tiny mu still samples correctly (slice validity is mu-free),
        just with shorter steps -> higher autocorrelation."""
        from mcmcpp_tpu import EnsembleSliceMove

        s = run_mover(EnsembleSliceMove(mu=0.3), n_steps=3000, burn=600)
        check_moments(s, atol=0.15)

    def test_tempered_slice_targets_power_posterior(self):
        """beta=0.25 on N(0,1) must sample N(0, 1/0.25): the slice height
        and inclusion test are tempered while stored logp stays raw."""
        import jax
        import jax.numpy as jnp
        from mcmcpp_tpu import EnsembleSliceMove

        def logp(t):
            return -0.5 * jnp.sum(t * t)

        mover = EnsembleSliceMove()
        batched = jax.vmap(logp)
        key = jax.random.key(0)
        n = 128
        active = jax.random.normal(jax.random.key(1), (n, 2)) * 2.0
        other = jax.random.normal(jax.random.key(2), (n, 2)) * 2.0
        alp = batched(active)
        draws = []
        step = jax.jit(lambda k, a, al: mover.update_half(
            k, a, al, other, batched, (), beta=0.25
        ))
        for i in range(600):
            key, sub = jax.random.split(key)
            active, alp, _ = step(sub, active, alp)
            if i >= 100:
                draws.append(np.asarray(active))
        x = np.concatenate(draws, axis=0)
        # var = 1/beta = 4 (tolerate the frozen `other` half's influence
        # on the direction distribution only -- validity is unaffected)
        np.testing.assert_allclose(x.std(axis=0), 2.0, rtol=0.1)
        np.testing.assert_allclose(x.mean(axis=0), 0.0, atol=0.2)


class TestDRAM:
    """DRAM (movers/dram.py): delayed-rejection adaptive Metropolis —
    the completion of the reference's MH family
    (MetropolisHastings.h:138 is the single-stage special case)."""

    def test_moments_ensemble_adaptive(self):
        from mcmcpp_tpu import DRAMMove

        s = run_mover(DRAMMove(), n_steps=6000)
        check_moments(s, atol=0.15)
        assert 0.15 < s.acceptance_fraction < 0.95

    def test_moments_static_covariance(self):
        from mcmcpp_tpu import DRAMMove

        s = run_mover(
            DRAMMove(covariance=skewed_gaussian_cov(), scale=1.2,
                     adapt=None),
            n_steps=6000,
        )
        check_moments(s, atol=0.15)

    def test_reject_then_accept_path(self):
        """The delayed-rejection stage must actually rescue stage-1
        rejections: with a deliberately huge stage-1 scale, plain MH
        acceptance collapses while DRAM's shrunk second stage keeps
        the chain moving (any DRAM accept is ~surely a stage-2 accept)."""
        from mcmcpp_tpu import DRAMMove, MetropolisHastingsMove

        big = 50.0
        mh = run_mover(MetropolisHastingsMove(scale=big), n_steps=400,
                       burn=100)
        dram = run_mover(
            DRAMMove(scale=big, gamma=0.01, adapt=None), n_steps=400,
            burn=100,
        )
        assert mh.acceptance_fraction < 0.02
        assert dram.acceptance_fraction > 10 * max(
            mh.acceptance_fraction, 0.005
        )

    def test_gaussian_moments_exact(self):
        """Tight-tolerance 1-D check that the DR ratio is the correct
        one (a wrong q1 term biases the variance several percent)."""
        import jax.numpy as jnp
        from mcmcpp_tpu import DRAMMove, EnsembleSampler

        s = EnsembleSampler(
            lambda t: -0.5 * jnp.sum(t * t), 256, 1,
            mover=DRAMMove(scale=3.0, gamma=0.15, adapt=None), seed=3,
        )
        s.init_ball(np.zeros(1), scale=0.5)
        s.run_mcmc(500, store=False)
        s.run_mcmc(8000)
        x = s.get_samples(flat=True)
        assert abs(float(np.var(x)) - 1.0) < 0.05
        assert abs(float(np.mean(x))) < 0.05

    def test_tempered_targets_power_posterior(self):
        """beta=0.25 on N(0,1) must sample N(0, 4): the DR ratio's
        target terms are tempered while the proposal-density terms are
        not."""
        import jax
        import jax.numpy as jnp
        from mcmcpp_tpu import DRAMMove

        mover = DRAMMove(scale=4.0, gamma=0.2, adapt=None)
        batched = jax.vmap(lambda t: -0.5 * jnp.sum(t * t))
        state = mover.init_state(1, jnp.float32)
        key = jax.random.key(0)
        n = 256
        active = jax.random.normal(jax.random.key(1), (n, 1)) * 2.0
        other = jax.random.normal(jax.random.key(2), (n, 1)) * 2.0
        alp = batched(active)
        step = jax.jit(lambda k, a, al: mover.update_half(
            k, a, al, other, batched, state, beta=0.25
        ))
        draws = []
        for i in range(900):
            key, sub = jax.random.split(key)
            active, alp, _ = step(sub, active, alp)
            if i >= 150:
                draws.append(np.asarray(active))
        x = np.concatenate(draws, axis=0)
        np.testing.assert_allclose(x.std(), 2.0, rtol=0.08)
        np.testing.assert_allclose(x.mean(), 0.0, atol=0.2)

    def test_validation(self):
        from mcmcpp_tpu import DRAMMove

        with pytest.raises(ValueError):
            DRAMMove(gamma=0.0)
        with pytest.raises(ValueError):
            DRAMMove(adapt="history")
        with pytest.raises(ValueError):
            DRAMMove(covariance=np.array([1.0, -1.0]),
                     adapt=None).init_state(2, None)
        with pytest.raises(np.linalg.LinAlgError):
            DRAMMove(covariance=np.array([[1.0, 2.0], [2.0, 1.0]]),
                     adapt=None).init_state(2, None)
