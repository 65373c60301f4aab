"""IF2 iterated filtering: Kalman-MLE oracle on LGSS, swarm
concentration, cooling behavior, mesh sharding.

Ionides et al. (2015); oracle = exact maximum of the collapsed
linear-Gaussian likelihood (models/lgss.py kalman filter), maximized by
direct search — the ground truth IF2's swarm must concentrate on.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mcmcpp_tpu import StateSpaceModel, if2
from mcmcpp_tpu.models.lgss import lgss_loglik, lgss_params

A_TRUE, Q_TRUE, LOG_SR_TRUE = 0.8, 0.3, np.log(0.5)
T_N = 150


def _data():
    rng = np.random.default_rng(7)
    x = 0.0
    ys = np.empty(T_N, np.float32)
    for t in range(T_N):
        x = A_TRUE * x + np.sqrt(Q_TRUE) * rng.standard_normal()
        ys[t] = x + np.exp(LOG_SR_TRUE) * rng.standard_normal()
    return ys


def _exact_loglik(theta, ys):
    a, log_sr = float(theta[0]), float(theta[1])
    # data convention: x_1 = a*0 + w ~ N(0, Q)  <=>  m0=0, P0=0 with the
    # first filter step running predict-from-prior
    p = lgss_params(A=a, b=0.0, Q=Q_TRUE, H=1.0, c=0.0,
                    R=float(np.exp(2 * log_sr)), m0=0.0, P0=0.0)
    return float(lgss_loglik(p, ys, method="sequential", initial="prior"))


@pytest.fixture(scope="module")
def mle(ys_data):
    """Kalman MLE by direct search over (a, log_sr)."""
    from scipy.optimize import minimize

    res = minimize(
        lambda th: -_exact_loglik(th, ys_data), x0=[0.5, 0.0],
        method="Nelder-Mead", options={"xatol": 1e-5, "fatol": 1e-8},
    )
    assert res.success
    return res.x


@pytest.fixture(scope="module")
def ys_data():
    return _data()


def _ssm():
    """Per-particle-θ hooks (θ = [a, log_sr]; see if2.py contract)."""
    sq = np.sqrt(Q_TRUE).astype(np.float32)
    c0 = 0.5 * np.log(2 * np.pi)

    return StateSpaceModel(
        init_sample=lambda key, n, th: sq * jax.random.normal(key, (n, 1)),
        trans_sample=lambda key, x, t, th: th[:, 0:1] * x
        + sq * jax.random.normal(key, x.shape),
        obs_logpdf=lambda y, x, t, th: (
            -0.5 * jnp.square((y[0] - x[:, 0]) / jnp.exp(th[:, 1]))
            - th[:, 1] - c0
        ),
    )


@pytest.fixture(scope="module")
def fitted(ys_data):
    return if2(
        jax.random.key(0), _ssm(), ys_data, n_particles=2000,
        theta0=np.array([0.5, 0.0], np.float32), sigma0=0.05,
        n_iters=40, cooling=0.9,
    )


@pytest.mark.slow
class TestIF2Oracle:
    def test_recovers_kalman_mle(self, fitted, mle):
        """The swarm mean must land on the exact-likelihood MLE (both
        parameters), well inside the sampling noise of the oracle."""
        est = np.asarray(fitted.theta)
        assert abs(est[0] - mle[0]) < 0.05, (est, mle)
        assert abs(est[1] - mle[1]) < 0.10, (est, mle)
        # and strictly closer to the MLE than the start point was
        assert np.linalg.norm(est - mle) < 0.3 * np.linalg.norm(
            np.array([0.5, 0.0]) - mle
        )

    def test_swarm_concentrates(self, fitted):
        """Cooling must shrink the swarm: final sd << first-pass sd."""
        sd = np.asarray(fitted.theta_sd_trace)
        assert (sd[-1] < sd[0] / 5.0).all(), sd[[0, -1]]

    def test_loglik_trace_improves(self, fitted, ys_data, mle):
        """The per-pass PF loglik must climb toward the exact maximum."""
        ll = np.asarray(fitted.loglik_trace)
        assert ll[-5:].mean() > ll[0] + 1.0
        assert ll[-5:].mean() == pytest.approx(
            _exact_loglik(mle, ys_data), abs=3.0
        )


def test_shapes_and_trace(ys_data):
    r = if2(
        jax.random.key(1), _ssm(), ys_data[:40], n_particles=256,
        theta0=np.array([0.5, 0.0], np.float32), sigma0=[0.05, 0.08],
        n_iters=3,
    )
    assert r.theta.shape == (2,)
    assert r.swarm.shape == (256, 2)
    assert r.theta_trace.shape == (3, 2)
    assert r.theta_sd_trace.shape == (3, 2)
    assert r.loglik_trace.shape == (3,)
    assert np.isfinite(np.asarray(r.loglik_trace)).all()


def test_mesh_sharded_executes_and_agrees(ys_data):
    """Particle-axis sharding: same estimate class as unsharded (not
    bitwise — the logsumexp reduction order changes over the mesh)."""
    from mcmcpp_tpu.parallel.mesh import make_walker_mesh

    kw = dict(
        ys=ys_data[:80], n_particles=512,
        theta0=np.array([0.5, 0.0], np.float32), sigma0=0.05,
        n_iters=10, cooling=0.85,
    )
    a = if2(jax.random.key(2), _ssm(), mesh=make_walker_mesh(), **kw)
    b = if2(jax.random.key(2), _ssm(), **kw)
    assert np.isfinite(np.asarray(a.theta)).all()
    np.testing.assert_allclose(
        np.asarray(a.theta), np.asarray(b.theta), atol=0.15
    )
