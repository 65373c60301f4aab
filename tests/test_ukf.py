"""UKF + unscented RTS: exact-Kalman degeneracy oracles, nonlinear
agreement with a dense particle filter, differentiability.

Särkkä (2013, Bayesian Filtering and Smoothing) conventions; the linear
case must reproduce models/lgss.kalman_filter (initial="state") and
rts_smoother to float tolerance — the UKF moment match is EXACT for
linear maps.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mcmcpp_tpu.models.lgss import kalman_filter, lgss_params, rts_smoother
from mcmcpp_tpu.ukf import (
    UKFModel,
    unscented_kalman_filter,
    unscented_rts_smoother,
)

A2 = np.array([[0.9, 0.1], [0.0, 0.8]], np.float32)
H2 = np.array([[1.0, 0.0]], np.float32)
Q2 = 0.3 * np.eye(2, dtype=np.float32)
R2 = np.array([[0.25]], np.float32)


def _linear_model():
    return UKFModel(
        f=lambda x, t: x @ jnp.asarray(A2).T,
        h=lambda x, t: x @ jnp.asarray(H2).T,
        Q=jnp.asarray(Q2), R=jnp.asarray(R2),
        m0=jnp.zeros(2), P0=jnp.eye(2),
    )


def _linear_data(t_n=60, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal(2)
    ys = np.empty((t_n, 1), np.float32)
    for t in range(t_n):
        if t > 0:
            x = A2 @ x + rng.multivariate_normal(np.zeros(2), Q2)
        ys[t] = H2 @ x + np.sqrt(R2[0, 0]) * rng.standard_normal()
    return ys


@pytest.fixture(scope="module")
def linear_case():
    ys = _linear_data()
    exact = kalman_filter(
        lgss_params(A=A2, b=np.zeros(2), Q=Q2, H=H2, c=np.zeros(1),
                    R=R2, m0=np.zeros(2), P0=np.eye(2)),
        ys, method="sequential", initial="state",
    )
    return ys, exact


class TestLinearDegeneracy:
    def test_filter_matches_exact_kalman(self, linear_case):
        ys, exact = linear_case
        r = unscented_kalman_filter(_linear_model(), ys)
        np.testing.assert_allclose(r.loglik, exact.loglik, rtol=1e-4)
        np.testing.assert_allclose(r.means, exact.means, atol=2e-4)
        np.testing.assert_allclose(r.covs, exact.covs, atol=2e-4)

    def test_smoother_matches_exact_rts(self, linear_case):
        ys, _ = linear_case
        ms, ps = unscented_rts_smoother(_linear_model(), ys)
        ems, eps = rts_smoother(
            lgss_params(A=A2, b=np.zeros(2), Q=Q2, H=H2, c=np.zeros(1),
                        R=R2, m0=np.zeros(2), P0=np.eye(2)),
            ys, method="sequential", initial="state",
        )
        np.testing.assert_allclose(ms, ems, atol=5e-4)
        np.testing.assert_allclose(ps, eps, atol=5e-4)
        # smoothing must not increase uncertainty anywhere
        r = unscented_kalman_filter(_linear_model(), ys)
        assert np.all(np.diagonal(ps, axis1=1, axis2=2)
                      <= np.diagonal(np.asarray(r.covs), axis1=1,
                                     axis2=2) + 1e-5)


class TestNonlinear:
    """Mildly nonlinear scalar model vs a dense bootstrap PF."""

    def _model(self):
        return UKFModel(
            f=lambda x, t: 0.8 * x + 0.5 * jnp.sin(x),
            h=lambda x, t: x + 0.2 * x**2,
            Q=0.09 * jnp.eye(1), R=0.25 * jnp.eye(1),
            m0=jnp.zeros(1), P0=jnp.eye(1),
        )

    def _data(self, t_n=50, seed=3):
        rng = np.random.default_rng(seed)
        x = rng.standard_normal()
        ys = np.empty((t_n, 1), np.float32)
        for t in range(t_n):
            if t > 0:
                x = 0.8 * x + 0.5 * np.sin(x) + 0.3 * rng.standard_normal()
            ys[t] = x + 0.2 * x**2 + 0.5 * rng.standard_normal()
        return ys

    @pytest.mark.slow
    def test_tracks_dense_particle_filter(self):
        from mcmcpp_tpu import StateSpaceModel, particle_filter

        ys = self._data()
        ukf = unscented_kalman_filter(self._model(), ys)
        ssm = StateSpaceModel(
            init_sample=lambda key, n, th: jax.random.normal(key, (n, 1)),
            trans_sample=lambda key, x, t, th: 0.8 * x + 0.5 * jnp.sin(x)
            + 0.3 * jax.random.normal(key, x.shape),
            obs_logpdf=lambda y, x, t, th: -0.5 * jnp.square(
                (y[0] - x[:, 0] - 0.2 * x[:, 0] ** 2) / 0.5
            ) - np.log(0.5) - 0.5 * np.log(2 * np.pi),
        )
        pf = particle_filter(jax.random.key(0), ssm, None, ys, 100_000)
        # filtered means agree to the PF's own MC error scale
        np.testing.assert_allclose(
            np.asarray(ukf.means[:, 0]), np.asarray(pf.filter_means[:, 0]),
            atol=0.12,
        )
        assert abs(float(ukf.loglik) - float(pf.loglik)) < 1.0

    def test_loglik_differentiable_in_hyperparameters(self):
        ys = self._data(t_n=25)

        def nll(log_q):
            m = UKFModel(
                f=lambda x, t: 0.8 * x + 0.5 * jnp.sin(x),
                h=lambda x, t: x + 0.2 * x**2,
                Q=jnp.exp(log_q) * jnp.eye(1), R=0.25 * jnp.eye(1),
                m0=jnp.zeros(1), P0=jnp.eye(1),
            )
            return -unscented_kalman_filter(m, ys).loglik

        g = jax.grad(nll)(jnp.asarray(-2.0))
        assert np.isfinite(float(g))
        # the exact MLE-gradient sanity: nll decreases toward truth
        assert nll(jnp.log(0.09)) < nll(jnp.asarray(-6.0))

    def test_shapes_and_vector_promotion(self):
        ys = self._data(t_n=12)[:, 0]  # (T,) promoted to (T, 1)
        r = unscented_kalman_filter(self._model(), ys)
        assert r.means.shape == (12, 1)
        assert r.covs.shape == (12, 1, 1)
        assert r.pred_means.shape == (12, 1)
        assert np.isfinite(float(r.loglik))
        ms, ps = unscented_rts_smoother(self._model(), filtered=r)
        assert ms.shape == (12, 1) and ps.shape == (12, 1, 1)
        with pytest.raises(ValueError, match="ys"):
            unscented_rts_smoother(self._model())
