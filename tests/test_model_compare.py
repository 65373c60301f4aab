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


# --- stacking / pseudo-BMA (Yao et al. 2018; round-4 addition) -------------


def _elpd(pointwise):
    pointwise = np.asarray(pointwise, np.float64)
    from mcmcpp_tpu.analysis.model_compare import ElpdResult

    return ElpdResult(
        elpd=float(pointwise.sum()),
        se=float(np.sqrt(len(pointwise) * pointwise.var(ddof=1))),
        p_eff=0.0, pointwise=pointwise,
        pareto_k=np.full(len(pointwise), np.nan), method="loo",
    )


def test_stacking_matches_grid_oracle():
    """K=2: the SLSQP solution must match brute-force maximization of the
    exact stacking objective on a fine weight grid (closed-form oracle)."""
    from mcmcpp_tpu.analysis import stacking_weights

    rng = np.random.default_rng(0)
    n = 400
    lpd1 = rng.normal(-1.3, 0.6, n)
    lpd2 = lpd1 + rng.normal(0.1, 0.9, n)  # correlated, partially better
    w = stacking_weights({"m1": _elpd(lpd1), "m2": _elpd(lpd2)})
    grid = np.linspace(0.0, 1.0, 2001)
    scores = [
        np.sum(np.logaddexp(np.log(g + 1e-300) + lpd1,
                            np.log(1 - g + 1e-300) + lpd2))
        for g in grid
    ]
    g_star = grid[int(np.argmax(scores))]
    assert abs(w["m1"] - g_star) < 2e-3, (w, g_star)
    assert w["m1"] + w["m2"] == pytest.approx(1.0, abs=1e-9)


def test_stacking_recovers_mixture_proportion():
    """Nested simulated models: data from 0.7·N(-2,1) + 0.3·N(2,1), each
    candidate one well-separated component — the KL-optimal pooled
    predictive is the true mixture, so the weights recover (0.7, 0.3)."""
    from scipy.stats import norm

    from mcmcpp_tpu.analysis import stacking_weights

    rng = np.random.default_rng(1)
    n = 4000
    comp = rng.random(n) < 0.7
    y = np.where(comp, rng.normal(-2.0, 1.0, n), rng.normal(2.0, 1.0, n))
    res = {
        "left": _elpd(norm.logpdf(y, -2.0, 1.0)),
        "right": _elpd(norm.logpdf(y, 2.0, 1.0)),
    }
    w = stacking_weights(res)
    assert abs(w["left"] - 0.7) < 0.05, w
    assert abs(w["right"] - 0.3) < 0.05, w


def test_stacking_dominating_model_takes_all():
    from mcmcpp_tpu.analysis import stacking_weights

    rng = np.random.default_rng(2)
    n = 300
    good = rng.normal(-1.0, 0.3, n)
    bad = good - 2.0  # uniformly worse pointwise -> zero stacking value
    w = stacking_weights({"good": _elpd(good), "bad": _elpd(bad)})
    assert w["good"] > 0.999, w


def test_pseudo_bma_closed_form_and_plus():
    from mcmcpp_tpu.analysis import pseudo_bma_weights

    rng = np.random.default_rng(3)
    n = 200
    lpd1 = rng.normal(-1.0, 0.5, n)
    lpd2 = lpd1 + rng.normal(0.005, 0.8, n)  # tiny mean edge, big SE
    res = {"m1": _elpd(lpd1), "m2": _elpd(lpd2)}
    w = pseudo_bma_weights(res, bootstrap=False)
    e1, e2 = lpd1.sum(), lpd2.sum()
    expect = np.exp(e1 - max(e1, e2))
    expect = expect / (expect + np.exp(e2 - max(e1, e2)))
    assert w["m1"] == pytest.approx(expect, rel=1e-12)
    # pseudo-BMA+ (Bayesian bootstrap) regularizes toward uniform when the
    # elpd difference is within its sampling noise
    wp = pseudo_bma_weights(res, seed=0)
    assert abs(wp["m1"] - 0.5) < abs(w["m1"] - 0.5) + 1e-12
    assert wp["m1"] + wp["m2"] == pytest.approx(1.0, abs=1e-9)
    # deterministic under a fixed seed
    assert wp == pseudo_bma_weights(res, seed=0)


def test_stacking_validation():
    from mcmcpp_tpu.analysis import pseudo_bma_weights, stacking_weights

    with pytest.raises(ValueError, match="no results"):
        stacking_weights({})
    res = {"a": _elpd(np.zeros(5)), "b": _elpd(np.zeros(7))}
    with pytest.raises(ValueError, match="different observation"):
        stacking_weights(res)
    with pytest.raises(ValueError, match="different observation"):
        pseudo_bma_weights(res)
    assert stacking_weights({"only": _elpd(np.zeros(5))}) == {"only": 1.0}


def test_stacked_predictive_resample():
    from mcmcpp_tpu.analysis import stacked_predictive_resample

    rng = np.random.default_rng(0)
    draws = {"a": rng.normal(-3.0, 0.1, (4000, 2)),
             "b": rng.normal(3.0, 0.1, (6000, 2))}
    w = {"a": 0.25, "b": 0.75}
    out = stacked_predictive_resample(draws, w, seed=1)
    assert out.shape == (4000, 2)
    frac_b = (out[:, 0] > 0).mean()
    assert abs(frac_b - 0.75) < 0.03
    # mixture mean = Σ w_k μ_k
    assert out.mean() == pytest.approx(0.25 * -3 + 0.75 * 3, abs=0.1)
    with pytest.raises(ValueError, match="model keys"):
        stacked_predictive_resample(draws, {"a": 1.0})
    with pytest.raises(ValueError, match="simplex"):
        stacked_predictive_resample(draws, {"a": 0.9, "b": 0.9})
    with pytest.raises(ValueError, match="shapes"):
        stacked_predictive_resample(
            {"a": np.zeros((5, 2)), "b": np.zeros((5, 3))}, w
        )
