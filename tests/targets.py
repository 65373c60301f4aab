"""Shared test targets with analytically known moments.

The 2-D skewed Gaussian mirrors the reference's main statistical test model
(``test/sequential/SkewedGaussian/Common/SkewedGaussian.h:52-57``):

    logp(x, y) = -1/2 · [ (x/2 − y)²/ε + (x/2 + y)² ]

whose true covariance is [[1+ε, (1−ε)/2], [(1−ε)/2, (1+ε)/4]]
(cf. test/sequential/SkewedGaussian/MH/src/main.cpp:73-74), with ε = 0.13
in the reference tests.
"""

import numpy as np
import jax.numpy as jnp

EPSILON = 0.13


def skewed_gaussian_logp(theta, eps=EPSILON):
    t1 = theta[0] / 2.0 - theta[1]
    t2 = theta[0] / 2.0 + theta[1]
    return -0.5 * (t1 * t1 / eps + t2 * t2)


def skewed_gaussian_cov(eps=EPSILON):
    return np.array(
        [[1.0 + eps, (1.0 - eps) / 2.0], [(1.0 - eps) / 2.0, (1.0 + eps) / 4.0]]
    )


def correlated_gaussian_logp_factory(dim=10, rho=0.5, dtype=jnp.float32):
    """Standardized correlated Gaussian: Σ_ij = rho^|i-j| (AR(1) structure).

    Returns (logp, true_cov). The precision of an AR(1)-correlated Gaussian
    is tridiagonal, so logp is O(P) — the benchmark's 10-D target.
    """
    idx = np.arange(dim)
    cov = rho ** np.abs(idx[:, None] - idx[None, :])
    prec = np.linalg.inv(cov)
    prec_j = jnp.asarray(prec, dtype)

    def logp(theta):
        return -0.5 * theta @ (prec_j @ theta)

    return logp, cov
