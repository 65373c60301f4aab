"""WAIC / IS-LOO model comparison (Vehtari et al. 2017).

Oracle: linear regression with a deliberately dropped covariate — the
true model must win by more than the paired difference SE; WAIC and LOO
must agree within SE on the well-specified model; p_eff must be near the
true parameter count. SURVEY.md §4 oracle pattern; the reference has no
model-comparison facilities.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from mcmcpp_tpu import NUTSSampler
from mcmcpp_tpu.analysis import compare, loo, waic
from mcmcpp_tpu.dsl import HalfNormal, Model, Normal


N_OBS = 120


@pytest.fixture(scope="module")
def fits():
    rng = np.random.default_rng(0)
    x1 = rng.standard_normal(N_OBS)
    x2 = rng.standard_normal(N_OBS)
    y = 1.5 * x1 - 2.0 * x2 + 0.5 * rng.standard_normal(N_OBS)

    def fit(use_x2):
        m = Model().param("b1", Normal(0, 5)).param("sigma", HalfNormal(2))
        if use_x2:
            m = m.param("b2", Normal(0, 5))

        def dist_fn(p):
            mu = p["b1"] * x1 + (p["b2"] * x2 if use_x2 else 0.0)
            return Normal(mu, p["sigma"])

        m = m.observe("y", dist_fn, y)
        logp, dim, _ = m.build()
        s = NUTSSampler(logp, n_chains=16, n_params=dim, seed=1, max_depth=8)
        s.init_ball(np.zeros(dim), scale=0.3)
        s.warmup(400)
        s.run(600)
        ll = m.pointwise_log_likelihood(
            s.get_samples(burn_in=100, flat=True)[::4]
        )
        return ll

    return fit(True), fit(False)


class TestElpd:
    def test_true_model_wins(self, fits):
        ll_true, ll_wrong = fits
        r_true, r_wrong = loo(ll_true), loo(ll_wrong)
        rows = compare({"true": r_true, "wrong": r_wrong})
        assert rows[0][0] == "true"
        name, elpd, se, d_elpd, d_se = rows[1]
        assert d_elpd < -2 * d_se  # decisively worse

    def test_waic_loo_agree_when_well_specified(self, fits):
        ll_true, _ = fits
        w, l = waic(ll_true), loo(ll_true)
        assert abs(w.elpd - l.elpd) < max(w.se, 2.0)
        assert np.all(l.pareto_k < 0.7)

    def test_p_eff_near_param_count(self, fits):
        ll_true, _ = fits
        w = waic(ll_true)
        assert 1.0 < w.p_eff < 9.0  # 3 true params, MC noise margin

    def test_pointwise_shapes_and_methods(self, fits):
        ll_true, _ = fits
        w, l = waic(ll_true), loo(ll_true)
        assert w.pointwise.shape == (N_OBS,) == l.pointwise.shape
        assert w.method == "waic" and l.method == "loo"
        assert np.isnan(w.pareto_k).all()

    def test_compare_validates_obs_count(self, fits):
        ll_true, _ = fits
        a = waic(ll_true)
        b = waic({"y": np.asarray(list(ll_true.values())[0])[:, :50]})
        with pytest.raises(ValueError, match="different observation"):
            compare({"a": a, "b": b})

    def test_masked_entries_dropped(self):
        rng = np.random.default_rng(1)
        y = rng.standard_normal(30)
        mask = np.ones(30, bool)
        mask[5:10] = False
        m = (Model().param("mu", Normal(0, 5))
             .observe("y", lambda p: Normal(p["mu"], 1.0), y, mask=mask))
        logp, dim, _ = m.build()
        s = NUTSSampler(logp, n_chains=8, n_params=dim, seed=2)
        s.init_ball(np.zeros(dim), scale=0.3)
        s.warmup(100)
        s.run(200)
        ll = m.pointwise_log_likelihood(s.get_samples(flat=True)[::8])
        assert np.isnan(ll["y"][:, 5:10]).all()
        w = waic(ll)
        assert w.pointwise.shape == (25,)  # masked columns dropped
