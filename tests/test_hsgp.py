"""Hilbert-space GP oracles: the reduced-rank approximation is checked
against the EXACT GP machinery in models/gp.py (Gram matrices, marginal
likelihood, posterior predictive), the weight-space identities are
checked exactly against dense MVN algebra, and the DSL bridge is fit
end-to-end (MAP recovery of a smooth function)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mcmcpp_tpu.dsl import HalfNormal, LogNormal, Model, Normal
from mcmcpp_tpu.map_laplace import find_map
from mcmcpp_tpu.models.gp import (
    RBF, Matern12, Matern32, Matern52, gp_log_marginal, gp_predict,
)
from mcmcpp_tpu.models.hsgp import (
    HSGP, hsgp_log_marginal, hsgp_predict, spectral_density,
)

XS = jnp.linspace(-1.0, 1.0, 40)
ELL, SIG2 = 0.45, 1.3

EXACT = {
    "rbf": RBF, "matern12": Matern12,
    "matern32": Matern32, "matern52": Matern52,
}


def test_spectral_density_matches_numeric_fourier_transform():
    # S(w) = ∫ k(r) e^{-iwr} dr: check against trapezoid quadrature of
    # the closed-form kernels (even integrand -> cosine transform)
    r = np.linspace(0, 20.0, 200001)
    x = jnp.array([0.0])
    trapz = getattr(np, "trapezoid", np.trapz)
    for name, cls in EXACT.items():
        k = np.asarray(
            cls(ELL, SIG2)(jnp.asarray(r), x)[:, 0], np.float64)
        for w in (0.0, 0.8, 2.5):
            want = 2.0 * trapz(k * np.cos(w * r), r)
            got = float(spectral_density(
                name, jnp.array([[w]]), ELL, SIG2)[0])
            assert got == pytest.approx(want, rel=2e-3), (name, w)


@pytest.mark.parametrize("name", ["rbf", "matern32", "matern52"])
def test_gram_matches_exact_kernel(name):
    basis = HSGP(XS, m=160, c=2.5, kernel=name)
    approx = np.asarray(basis.gram(ELL, SIG2), np.float64)
    exact = np.asarray(EXACT[name](ELL, SIG2)(XS, XS), np.float64)
    assert np.abs(approx - exact).max() < 6e-3 * SIG2


def test_matern12_gram_converges_slowly_but_surely():
    # OU spectra decay like w^-2 — convergence in m is slow; assert the
    # error SHRINKS with m rather than a tight absolute bound
    exact = np.asarray(Matern12(ELL, SIG2)(XS, XS), np.float64)
    errs = []
    for m in (32, 128, 512):
        g = np.asarray(HSGP(XS, m=m, c=2.5, kernel="matern12")
                       .gram(ELL, SIG2), np.float64)
        errs.append(np.abs(g - exact).max())
    assert errs[2] < errs[1] < errs[0]
    assert errs[2] < 0.08 * SIG2


def test_log_marginal_weight_space_identity_is_exact():
    # hsgp_log_marginal must equal the dense MVN density under ITS OWN
    # low-rank covariance (Woodbury/determinant identities, not an
    # approximation) — tight tolerance
    rng = np.random.default_rng(0)
    y = rng.standard_normal(40)
    noise = 0.3
    basis = HSGP(XS, m=24, c=1.5, kernel="rbf")
    got = float(hsgp_log_marginal(
        basis, ELL, SIG2, jnp.asarray(y, jnp.float32), noise))
    jit = 1e-6
    s = np.asarray(basis.spectral(ELL, SIG2), np.float64) + jit
    phi = np.asarray(basis.phi, np.float64)
    cov = (phi * s) @ phi.T + (noise**2 + jit) * np.eye(40)
    sign, logdet = np.linalg.slogdet(cov)
    want = -0.5 * (y @ np.linalg.solve(cov, y) + logdet
                   + 40 * np.log(2 * np.pi))
    assert got == pytest.approx(want, rel=1e-4)


def test_log_marginal_and_predict_match_exact_gp():
    rng = np.random.default_rng(1)
    y = jnp.asarray(
        np.sin(3.0 * np.asarray(XS)) + 0.1 * rng.standard_normal(40),
        jnp.float32)
    noise = 0.25
    basis = HSGP(XS, m=200, c=2.5, kernel="matern52")
    k = Matern52(ELL, SIG2)
    got_ml = float(hsgp_log_marginal(basis, ELL, SIG2, y, noise))
    want_ml = float(gp_log_marginal(k, XS, y, noise))
    assert got_ml == pytest.approx(want_ml, abs=0.15)

    x_new = jnp.linspace(-0.9, 0.9, 17)
    mean, var = hsgp_predict(basis, ELL, SIG2, y, noise, x_new)
    mean_x, var_x = gp_predict(k, XS, y, x_new, noise)
    np.testing.assert_allclose(
        np.asarray(mean), np.asarray(mean_x), atol=2e-2)
    np.testing.assert_allclose(
        np.asarray(var), np.asarray(var_x), atol=2e-2)


def test_prior_function_covariance_mc():
    # f = Phi (sqrt(S) . beta), beta ~ N(0, I)  =>  cov(f) = gram
    basis = HSGP(XS, m=64, c=1.5, kernel="rbf")
    n = 60000
    beta = jax.random.normal(jax.random.key(0), (n, basis.num_basis))
    f = np.asarray(basis(ELL, SIG2, beta), np.float64)  # (n, 40)
    emp = f.T @ f / n
    want = np.asarray(basis.gram(ELL, SIG2), np.float64)
    assert np.abs(emp - want).max() < 0.05 * SIG2


def test_ard_2d_gram_matches_exact_rbf():
    rng = np.random.default_rng(2)
    x = rng.uniform(-1, 1, size=(30, 2))
    ells = np.array([0.6, 1.1])
    # exact ARD RBF via coordinate scaling of the isotropic kernel
    k = np.asarray(RBF(1.0, SIG2)(
        jnp.asarray(x / ells), jnp.asarray(x / ells)), np.float64)
    # 2-D needs a generous basis: boundary error ~ k(2(L - max|x|))
    # enters from BOTH dims, so c=3 with m scaled to the short ell
    basis = HSGP(x, m=(80, 80), c=3.0, kernel="rbf")
    approx = np.asarray(basis.gram(jnp.asarray(ells), SIG2), np.float64)
    assert np.abs(approx - k).max() < 2e-2 * SIG2


def test_basis_batching_and_new_inputs():
    basis = HSGP(XS, m=16, c=1.5, kernel="matern32")
    beta = jax.random.normal(jax.random.key(1), (3, 5, basis.num_basis))
    f = basis(ELL, SIG2, beta)
    assert f.shape == (3, 5, 40)
    f_new = basis(ELL, SIG2, beta, x=jnp.linspace(-0.5, 0.5, 7))
    assert f_new.shape == (3, 5, 7)
    with pytest.raises(ValueError):
        HSGP(XS, m=8, kernel="cosine")
    with pytest.raises(ValueError):
        HSGP(XS, m=8, L=0.5)  # box must contain the data


def test_dsl_hsgp_regression_map_recovers_function():
    # declarative HSGP regression: MAP of (ell, sigma, beta) recovers a
    # smooth truth within the noise floor
    rng = np.random.default_rng(3)
    x = np.linspace(-1, 1, 60)
    truth = np.sin(2.5 * x) * np.exp(-x)
    y = truth + 0.1 * rng.standard_normal(60)
    basis = HSGP(jnp.asarray(x), m=32, c=1.5, kernel="matern52")

    model = (
        Model()
        .param("ell", LogNormal(-0.5, 0.5))
        .param("sigma", HalfNormal(1.0))
        .param("beta", Normal(0, 1), shape=(basis.num_basis,))
        .deterministic(
            "f", lambda p: basis(p["ell"], p["sigma"], p["beta"]))
        .observe("y", lambda p: Normal(p["f"], 0.1),
                 jnp.asarray(y, jnp.float32))
    )
    logp, dim, constrain = model.build()
    # multistart: BFGS from the all-zeros point stalls in a line-search
    # plateau (beta=0 ⇒ f=0 is nearly stationary in the hyperparameters);
    # the vmapped multi-start path is find_map's intended usage here
    x0 = 0.5 * jax.random.normal(jax.random.key(0), (8, dim))
    res = find_map(logp, x0, maxiter=1500)
    f_hat = constrain(res.position[None, :])["f"][0]
    rmse = float(np.sqrt(np.mean((f_hat - truth) ** 2)))
    assert rmse < 0.08, rmse
