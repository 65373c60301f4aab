"""Divergence + energy sample stats across the gradient family.

Stan-parity geometry diagnostics the reference (gradient-free,
``/root/reference/MCMCpp/Utility/UserOjbectsTest.h:144-151``) cannot have:
``diverging`` marks transitions whose energy error exceeds
DIVERGENCE_THRESHOLD; ``energy`` is the post-refresh Hamiltonian (E-BFMI).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from mcmcpp_tpu import (
    BarkerSampler, CheesHMCSampler, HMCSampler, MALASampler, MEADSSampler,
    NUTSSampler,
)
from mcmcpp_tpu.export import to_inference_dict

from tests.targets import correlated_gaussian_logp_factory


DIM = 3


def _mk(cls, **kw):
    logp, _ = correlated_gaussian_logp_factory(dim=DIM, rho=0.3)
    s = cls(logp, n_chains=16, n_params=DIM, seed=0, **kw)
    s.init_ball(np.zeros(DIM), scale=0.5, seed=1)
    return s


@pytest.mark.parametrize("cls,kw", [
    (HMCSampler, {"n_leapfrog": 8}),
    (MALASampler, {}),
    (BarkerSampler, {}),
    (NUTSSampler, {"max_depth": 6}),
    (CheesHMCSampler, {}),
    (MEADSSampler, {}),
])
class TestShapesAndCleanRuns:
    def test_stats_align_with_samples(self, cls, kw):
        s = _mk(cls, **kw)
        s.warmup(100)
        s.run(60, thin=2)
        samples = s.get_samples()
        stats = s.get_sample_stats()
        assert stats["diverging"].shape == samples.shape[:2]
        assert stats["energy"].shape == samples.shape[:2]
        assert stats["diverging"].dtype == bool
        # burn/thin slicing mirrors get_samples
        assert (
            s.get_sample_stats(burn_in=5, thin=3)["energy"].shape
            == s.get_samples(burn_in=5, thin=3).shape[:2]
        )

    def test_easy_target_has_no_divergences(self, cls, kw):
        s = _mk(cls, **kw)
        s.warmup(150)
        s.run(100)
        assert s.divergence_count.sum() == 0
        en = s.get_sample_stats()["energy"]
        assert np.all(np.isfinite(en))

    def test_export_carries_stats(self, cls, kw):
        s = _mk(cls, **kw)
        s.warmup(50)
        s.run(40)
        d = to_inference_dict(s)
        assert d["sample_stats"]["diverging"].shape == (16, 40)
        assert d["sample_stats"]["energy"].shape == (16, 40)


class TestDivergenceDetection:
    def test_absurd_step_size_flags_divergences(self):
        """A fixed 50x-too-large step makes the leapfrog explode: the
        energy-error criterion must fire (and acceptance collapse)."""
        logp, _ = correlated_gaussian_logp_factory(dim=DIM, rho=0.3)
        s = HMCSampler(logp, n_chains=16, n_params=DIM, seed=0,
                       n_leapfrog=8, step_size=50.0)
        s.init_ball(np.zeros(DIM), scale=0.5, seed=1)
        s.run(50)  # no warmup: keep the absurd step
        assert s.divergence_count.sum() > 0
        assert s.last_mean_accept < 0.1

    def test_funnel_nuts_divergences_localized_at_neck(self):
        """Neal's funnel: divergent transitions concentrate at small v —
        the standard Stan workflow signal this feature exists for."""
        def logp(t):
            v, x = t[0], t[1:]
            return (-0.5 * (v / 3.0) ** 2
                    - 0.5 * jnp.sum(x * x) * jnp.exp(-v) - 0.5 * v * (DIM - 1))

        s = NUTSSampler(logp, n_chains=32, n_params=DIM, seed=3, max_depth=6)
        s.init_ball(np.zeros(DIM), scale=1.0, seed=4)
        s.warmup(300)
        s.run(400)
        div = s.get_sample_stats()["diverging"]
        if div.sum() >= 5:  # funnel reliably produces some, but don't flake
            v_div = s.get_samples()[div][:, 0]
            v_all = s.get_samples()[:, :, 0]
            assert v_div.mean() < v_all.mean()

    def test_energy_bfmi_near_one_on_gaussian(self):
        """az.bfmi analogue: var(dE)/var(E) ~ 1 for well-tuned HMC on a
        Gaussian (no heavy-tail energy pathology)."""
        s = _mk(HMCSampler, n_leapfrog=8)
        s.warmup(200)
        s.run(400)
        en = s.get_sample_stats()["energy"]
        bfmi = (np.square(np.diff(en, axis=0)).mean(axis=0)
                / en.var(axis=0))
        assert np.all(bfmi > 0.3)

    def test_cap_truncation_keeps_alignment(self):
        logp, _ = correlated_gaussian_logp_factory(dim=DIM, rho=0.3)
        row = 16 * (DIM + 1) * 4
        s = HMCSampler(logp, n_chains=16, n_params=DIM, seed=0,
                       n_leapfrog=4, max_chain_bytes=25 * row)
        s.init_ball(np.zeros(DIM), scale=0.5, seed=1)
        assert s.run(60) is False  # EndOfChain
        samples = s.get_samples()
        stats = s.get_sample_stats()
        assert stats["diverging"].shape[0] == samples.shape[0]
