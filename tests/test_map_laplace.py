"""MAP / Laplace: exactness on Gaussians, multi-start on multimodal."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mcmcpp_tpu import find_map, laplace, laplace_sample
from mcmcpp_tpu.map_laplace import laplace_summary


def _gaussian(mu, cov):
    prec = jnp.asarray(np.linalg.inv(cov), jnp.float32)
    mu = jnp.asarray(mu, jnp.float32)

    def logp(t):
        d = t - mu
        return -0.5 * d @ (prec @ d)

    return logp


def test_laplace_exact_on_gaussian():
    """On a Gaussian the Laplace approximation is exact: mean == mu,
    covariance == cov, log-evidence == log normalizing constant of the
    UNNORMALIZED logp (here logp omits the constant, so Z = (2pi)^{P/2}|cov|^{1/2})."""
    mu = np.array([1.0, -2.0, 0.5])
    a = np.array([[2.0, 0.3, 0.0], [0.3, 1.0, -0.2], [0.0, -0.2, 0.5]])
    cov = a @ a.T
    lap = laplace(_gaussian(mu, cov), x0=np.zeros(3))
    np.testing.assert_allclose(np.asarray(lap.mean), mu, atol=1e-3)
    np.testing.assert_allclose(np.asarray(lap.covariance), cov, rtol=2e-2)
    true_log_z = 0.5 * 3 * np.log(2 * np.pi) + 0.5 * np.log(np.linalg.det(cov))
    assert float(lap.log_evidence) == pytest.approx(true_log_z, abs=0.05)


def test_multi_start_finds_global_mode():
    """Two Gaussian bumps of different height: single bad start falls into
    the minor mode; multi-start must return the major one."""

    def logp(t):
        a = -0.5 * jnp.sum((t - 4.0) ** 2) + 2.0  # major
        b = -0.5 * jnp.sum((t + 4.0) ** 2)  # minor
        return jnp.logaddexp(a, b)

    minor = find_map(logp, x0=np.full(2, -4.5))
    assert np.allclose(np.asarray(minor.position), -4.0, atol=0.2)
    starts = np.array([[-4.5, -4.5], [0.5, 0.5], [4.5, 4.5]])
    best = find_map(logp, x0=starts)
    assert np.allclose(np.asarray(best.position), 4.0, atol=0.2)
    assert best.all_positions.shape == (3, 2)


def test_laplace_sampling_and_summary():
    mu = np.array([2.0, -1.0])
    cov = np.array([[1.5, 0.4], [0.4, 0.8]])
    lap = laplace(_gaussian(mu, cov), x0=np.zeros(2))
    x = np.asarray(laplace_sample(jax.random.key(0), lap, 40000))
    np.testing.assert_allclose(x.mean(axis=0), mu, atol=0.05)
    np.testing.assert_allclose(np.cov(x.T), cov, atol=0.08)
    s = laplace_summary(lap)
    np.testing.assert_allclose(s["sd"], np.sqrt(np.diag(cov)), rtol=0.05)


def test_saddle_rejected():
    def logp(t):  # saddle at 0: -x^2 + y^2
        return -t[0] ** 2 + t[1] ** 2

    # force the "mode" to the origin via a start exactly there (BFGS stays)
    from mcmcpp_tpu.map_laplace import MapResult

    mr = MapResult(
        position=jnp.zeros(2), logp=jnp.asarray(0.0),
        converged=jnp.asarray(True),
        all_positions=jnp.zeros((1, 2)), all_logps=jnp.zeros(1),
    )
    with pytest.raises(ValueError, match="saddle|positive definite"):
        laplace(logp, map_result=mr)


def test_bad_args():
    with pytest.raises(ValueError, match="x0 or map_result"):
        laplace(lambda t: -t @ t)
