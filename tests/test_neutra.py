"""NeuTra flow-preconditioned sampling: flow exactness + funnel recovery."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mcmcpp_tpu import NUTSSampler
from mcmcpp_tpu.models import neal_funnel
from mcmcpp_tpu.neutra import NeuTra, RealNVP


@pytest.fixture(scope="module")
def fitted():
    t = neal_funnel(dim=5, sigma_v=3.0)
    nt = NeuTra(t.logp, t.dim,
                flow=RealNVP(t.dim, n_layers=6, hidden=48), seed=0)
    nt.fit(3000, batch=256, learning_rate=2e-3)
    return t, nt


@pytest.mark.slow
def test_flow_inverse_exact_after_training(fitted):
    """forward/inverse must be exact inverses WITH trained (non-identity)
    params, and the two logdets must cancel."""
    _, nt = fitted
    z = jax.random.normal(jax.random.key(7), (64, nt.dim))
    for zi in np.asarray(z)[:8]:
        x, ld_f = nt.flow.forward(nt.params, jnp.asarray(zi))
        z2, ld_i = nt.flow.inverse(nt.params, x)
        np.testing.assert_allclose(np.asarray(z2), zi, atol=1e-4)
        assert float(ld_f + ld_i) == pytest.approx(0.0, abs=1e-4)
        assert abs(float(ld_f)) > 1e-3  # genuinely non-identity


@pytest.mark.slow
def test_elbo_improves(fitted):
    _, nt = fitted
    h = nt.fit_result.elbo_history
    assert nt.fit_result.final_elbo > h[:50].mean() + 1.0


@pytest.mark.slow
def test_funnel_moments_via_neutra_nuts(fitted):
    """v ~ N(0, 9) marginal of Neal's funnel — the geometry a diagonal
    mass matrix cannot fix; the flow must neutralize it."""
    t, nt = fitted
    s = nt.make_sampler(NUTSSampler, n_chains=16, max_depth=8)
    s.warmup(300)
    s.run(1000)
    v = nt.transform(s.get_samples(flat=True))[:, 0]
    assert abs(v.mean()) < 0.5
    assert abs(v.std() - t.extras["sigma_v"]) < 0.5


@pytest.mark.slow
def test_sample_approximate_quality(fitted):
    """The flow alone (no MCMC) should already be a decent v-marginal."""
    t, nt = fitted
    x = nt.sample_approximate(jax.random.key(3), 8000)
    assert x.shape == (8000, t.dim)
    assert abs(x[:, 0].mean()) < 0.8
    assert 1.5 < x[:, 0].std() < 4.5


def test_dim_one_rejected():
    with pytest.raises(ValueError, match="dim >= 2"):
        RealNVP(1)


@pytest.mark.parametrize("dim", [2, 5, 7])  # odd dims exercise uneven masks
def test_flow_roundtrip_random_params(dim):
    """Inverse exactness with randomly PERTURBED params (no training)."""
    flow = RealNVP(dim, n_layers=4, hidden=16)
    params = flow.init(jax.random.key(0))
    params = jax.tree.map(
        lambda p: p + 0.3 * jax.random.normal(
            jax.random.key(int(p.size)), p.shape, p.dtype
        ),
        params,
    )
    z = jax.random.normal(jax.random.key(2), (dim,))
    x, ld_f = flow.forward(params, z)
    z2, ld_i = flow.inverse(params, x)
    np.testing.assert_allclose(np.asarray(z2), np.asarray(z), atol=1e-4)
    assert float(ld_f + ld_i) == pytest.approx(0.0, abs=1e-4)
    assert abs(float(ld_f)) > 1e-4
