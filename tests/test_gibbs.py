"""Blocked Gibbs: kernel-level moment oracles, a conjugate hierarchical
oracle, and hyperparameter-dependent prior structure (the GP use case)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mcmcpp_tpu.gibbs import (
    BlockedGibbsSampler,
    EllipticalSliceKernel,
    HMCKernel,
    MALAKernel,
    RWMKernel,
)


def _std_normal(x, others):
    return -0.5 * jnp.sum(x * x)


@pytest.mark.parametrize(
    "kernel",
    [
        MALAKernel(_std_normal, step_size=0.9),
        HMCKernel(_std_normal, step_size=0.4, n_leapfrog=8),
        RWMKernel(_std_normal, scale=1.2),
        EllipticalSliceKernel(
            lambda x, o: jnp.zeros(()), prior_scale=jnp.ones(3)
        ),  # flat likelihood: posterior IS the N(0,1) prior
    ],
    ids=["mala", "hmc", "rwm", "ess"],
)
def test_single_block_recovers_standard_normal(kernel):
    s = BlockedGibbsSampler(
        [("x", 3, kernel)], n_chains=64, seed=0,
        logp_fn=lambda v: -0.5 * jnp.sum(v["x"] ** 2),
    )
    s.init({"x": np.zeros(3)})
    s.run(300, thin=300)  # burn
    s.chain.clear()
    s.run(3000, thin=3)
    x = s.get_samples(flat=True)
    np.testing.assert_allclose(x.mean(0), 0.0, atol=0.11)
    np.testing.assert_allclose(x.var(0), 1.0, atol=0.12)


def test_hierarchical_conjugate_oracle():
    """mu ~ N(0, tau^2); e ~ N(0, I_N); y = mu + e + eps, eps ~ N(0, s^2).
    Marginally y ~ N(mu 1, (1+s^2) I), so the mu posterior is conjugate
    Gaussian — an exact oracle for the two-block sweep."""
    tau, sig = 2.0, 0.5
    rng = np.random.default_rng(0)
    n = 12
    y = jnp.asarray((1.2 + rng.normal(0, np.sqrt(1 + sig**2), n))
                    .astype(np.float32))

    def mu_logp(mu, others):
        e = others["e"]
        return (-0.5 * mu[0] ** 2 / tau**2
                - 0.5 * jnp.sum((y - mu[0] - e) ** 2) / sig**2)

    def e_loglike(e, others):
        mu = others["mu"][0]
        return -0.5 * jnp.sum((y - mu - e) ** 2) / sig**2

    s = BlockedGibbsSampler(
        [
            ("mu", 1, MALAKernel(mu_logp, step_size=0.15)),
            ("e", n, EllipticalSliceKernel(
                e_loglike, prior_scale=jnp.ones(n))),
        ],
        n_chains=64, seed=1,
    )
    s.init({"mu": np.zeros(1), "e": np.zeros(n)})
    s.run(500, thin=500)  # burn
    s.chain.clear()
    s.run(4000, thin=4)
    mu_draws = s.get_block("mu", flat=True)[:, 0]
    prec = 1.0 / tau**2 + n / (1.0 + sig**2)
    mean_true = float(jnp.sum(y)) / (1.0 + sig**2) / prec
    sd_true = prec**-0.5
    assert mu_draws.mean() == pytest.approx(mean_true, abs=4 * sd_true / 30)
    assert mu_draws.std() == pytest.approx(sd_true, rel=0.12)
    # latent reconstruction: posterior mean of mu + e_i tracks y_i shrunk
    # toward the chain mean by the 1/(1+s^2) factor
    z = mu_draws[:, None] + s.get_block("e", flat=True)
    expected = (np.asarray(y) / sig**2 + mean_true) / (1 / sig**2 + 1)
    np.testing.assert_allclose(z.mean(0), expected, atol=0.15)


@pytest.mark.slow
def test_gp_lengthscale_learning():
    """The headline use case: ESS over the GP latent with a covariance
    Cholesky computed LIVE from the hyperparameter block, HMC over the
    log-lengthscale. The posterior for log(l) must concentrate near truth."""
    n = 24
    xs = jnp.linspace(0.0, 4.0, n)
    true_l = 1.0
    rng = np.random.default_rng(3)

    def k_chol(log_l):
        d2 = (xs[:, None] - xs[None, :]) ** 2
        k = jnp.exp(-0.5 * d2 / jnp.exp(2.0 * log_l))
        return jnp.linalg.cholesky(k + 1e-5 * jnp.eye(n))

    f_true = np.asarray(k_chol(jnp.log(true_l))) @ rng.standard_normal(n)
    sig = 0.15
    y = jnp.asarray((f_true + sig * rng.standard_normal(n))
                    .astype(np.float32))

    def f_loglike(f, others):
        return -0.5 * jnp.sum((y - f) ** 2) / sig**2

    def hyper_logp(h, others):
        # p(log l) = N(0, 1); p(f | log l) via the live Cholesky
        f = others["f"]
        chol = k_chol(h[0])
        w = jax.scipy.linalg.solve_triangular(chol, f, lower=True)
        return (-0.5 * h[0] ** 2
                - 0.5 * jnp.sum(w * w)
                - jnp.sum(jnp.log(jnp.diagonal(chol))))

    s = BlockedGibbsSampler(
        [
            ("f", n, EllipticalSliceKernel(
                f_loglike,
                prior_chol=lambda others: k_chol(others["h"][0]))),
            ("h", 1, HMCKernel(hyper_logp, step_size=0.02, n_leapfrog=8)),
        ],
        n_chains=32, seed=2,
    )
    s.init({"f": np.zeros(n), "h": np.zeros(1)})
    s.run(400, thin=400)  # burn
    s.chain.clear()
    s.run(1200, thin=4)
    log_l = s.get_block("h", flat=True)[:, 0]
    l_mean = float(np.exp(log_l).mean())
    assert 0.5 < l_mean < 2.0, f"lengthscale not recovered: {l_mean:.3f}"
    # the latent must track the data where it is well-determined
    f_mean = s.get_block("f", flat=True).mean(0)
    assert float(np.mean((f_mean - np.asarray(y)) ** 2)) < 4 * sig**2


def test_validation_and_block_slicing():
    k = RWMKernel(_std_normal, scale=1.0)
    with pytest.raises(ValueError, match="duplicate"):
        BlockedGibbsSampler([("a", 1, k), ("a", 2, k)], n_chains=4)
    with pytest.raises(ValueError, match="at least one"):
        BlockedGibbsSampler([], n_chains=4)
    s = BlockedGibbsSampler([("a", 2, k), ("b", 3, k)], n_chains=4)
    with pytest.raises(ValueError, match="missing init"):
        s.init({"a": np.zeros(2)})
    s.init({"a": np.zeros(2), "b": np.ones(3)})
    s.run(4)
    assert s.get_samples().shape == (4, 4, 5)
    assert s.get_block("b").shape == (4, 4, 3)
    with pytest.raises(KeyError):
        s.get_block("nope")


def test_mesh_bitwise_identical():
    from mcmcpp_tpu import make_walker_mesh

    def run(mesh):
        s = BlockedGibbsSampler(
            [
                ("x", 2, MALAKernel(_std_normal, step_size=0.5)),
                ("z", 3, EllipticalSliceKernel(
                    lambda x, o: -0.5 * jnp.sum((x - o["x"].sum()) ** 2),
                    prior_scale=jnp.ones(3))),
            ],
            n_chains=16, seed=5, mesh=mesh,
        )
        s.init({"x": np.zeros(2), "z": np.zeros(3)})
        s.run(60, thin=3)
        return s.get_samples()

    np.testing.assert_array_equal(run(None), run(make_walker_mesh()))


def test_joint_block_validation_and_layout():
    from mcmcpp_tpu.gibbs import GaussianInterweaveKernel

    k = RWMKernel(_std_normal, scale=1.0)
    gk = GaussianInterweaveKernel(
        lambda f: -0.5 * jnp.sum(f * f),
        lambda h: jnp.exp(h[0]) * jnp.eye(3),
        lambda h: -0.5 * jnp.sum(h * h),
        lambda logp: RWMKernel(logp, 0.3),
    )
    with pytest.raises(ValueError, match="matching tuple"):
        BlockedGibbsSampler([(("h", "e"), 5, gk)], n_chains=4)
    with pytest.raises(ValueError, match="duplicate"):
        BlockedGibbsSampler(
            [(("h", "e"), (1, 3), gk), ("h", 1, k)], n_chains=4
        )
    s = BlockedGibbsSampler(
        [(("h", "e"), (1, 3), gk), ("x", 2, k)], n_chains=4, seed=0
    )
    s.init({"h": np.zeros(1), "e": np.zeros(3), "x": np.zeros(2)})
    s.run(6, thin=2)
    assert s.get_samples().shape == (3, 4, 6)
    assert s.get_block("e").shape == (3, 4, 3)
    assert s.get_block("x").shape == (3, 4, 2)


def test_interweave_matches_exact_marginal():
    """Tiny Gaussian-latent model with an analytic hyper marginal:
    h ~ N(0,1), e ~ N(0, I_2), y = exp(h)·e + noise. ASIS must recover
    the quadrature posterior of h."""
    from mcmcpp_tpu.gibbs import GaussianInterweaveKernel

    sig = 0.3
    y = jnp.asarray(np.array([1.1, -0.7], np.float32))

    def loglike(f):
        return -0.5 * jnp.sum((y - f) ** 2) / sig**2

    def chol(h):
        return jnp.exp(h[0]) * jnp.eye(2)

    gk = GaussianInterweaveKernel(
        loglike, chol, lambda h: -0.5 * jnp.sum(h * h),
        lambda logp: RWMKernel(logp, 0.4),
    )
    s = BlockedGibbsSampler([(("h", "e"), (1, 2), gk)], n_chains=64,
                            seed=0)
    s.init({"h": np.zeros(1), "e": np.zeros(2)})
    s.run(300, thin=300)
    s.chain.clear()
    s.run(2000, thin=4)
    h = s.get_block("h", flat=True)[:, 0]
    # quadrature: y | h ~ N(0, (e^{2h} + sig^2) I)
    g = np.linspace(-4, 4, 20001)
    v = np.exp(2 * g) + sig**2
    lp = (-0.5 * g**2
          - float(np.sum(np.asarray(y) ** 2)) / (2 * v) - np.log(v))
    w = np.exp(lp - lp.max()); w /= w.sum()
    m = float((w * g).sum())
    sd = float(np.sqrt((w * (g - m) ** 2).sum()))
    assert h.mean() == pytest.approx(m, abs=0.4 * sd)
    assert h.std() == pytest.approx(sd, rel=0.25)


def test_general_interweave_nonlinear_coupling():
    """General ASIS contract on a NON-linear, non-Gaussian coupling
    (beyond GaussianInterweaveKernel's f = chol(h) @ e):
    h ~ N(0,1), e ~ N(0, I_2), f = exp(h)·sinh(e), y = f + noise.
    The hyper marginal has a 2-D quadrature oracle (coordinates of e are
    independent given h, so p(y|h) factorizes into 1-D integrals)."""
    from mcmcpp_tpu.gibbs import InterweaveKernel

    sig = 0.3
    y = jnp.asarray(np.array([1.1, -0.7], np.float32))

    def forward(h, e):
        return jnp.exp(h[0]) * jnp.sinh(e)

    def inverse(h, f):
        return jnp.arcsinh(f * jnp.exp(-h[0]))

    def log_det_inverse(h, f):
        # d/df asinh(f·c) = c/sqrt(1+(f·c)^2), c = e^{-h}
        c2 = (f * jnp.exp(-h[0])) ** 2
        return jnp.sum(-h[0] - 0.5 * jnp.log1p(c2))

    def loglike(f):
        return -0.5 * jnp.sum((y - f) ** 2) / sig**2

    ik = InterweaveKernel(
        forward, inverse,
        anc_logpdf=lambda e: -0.5 * jnp.sum(e * e),
        loglike=loglike,
        hyper_logprior=lambda h: -0.5 * jnp.sum(h * h),
        make_hyper_kernel=lambda logp: RWMKernel(logp, 0.4),
        log_det_inverse=log_det_inverse,
    )
    s = BlockedGibbsSampler([(("h", "e"), (1, 2), ik)], n_chains=64,
                            seed=0)
    s.init({"h": np.zeros(1), "e": np.zeros(2)})
    s.run(300, thin=300)
    s.chain.clear()
    s.run(2000, thin=4)
    h = s.get_block("h", flat=True)[:, 0]
    # quadrature oracle: p(y_i|h) = ∫ N(y_i; e^h sinh(e), sig²) φ(e) de
    hg = np.linspace(-4.0, 4.0, 1601)
    eg = np.linspace(-7.0, 7.0, 2801)
    de = eg[1] - eg[0]
    phi_e = np.exp(-0.5 * eg**2) / np.sqrt(2 * np.pi)
    lp = -0.5 * hg**2
    for yi in np.asarray(y):
        fz = np.exp(hg)[:, None] * np.sinh(eg)[None, :]
        like = np.exp(-0.5 * (yi - fz) ** 2 / sig**2)
        lp += np.log((like * phi_e[None, :]).sum(axis=1) * de + 1e-300)
    w = np.exp(lp - lp.max()); w /= w.sum()
    m = float((w * hg).sum())
    sd = float(np.sqrt((w * (hg - m) ** 2).sum()))
    assert h.mean() == pytest.approx(m, abs=0.4 * sd)
    assert h.std() == pytest.approx(sd, rel=0.25)


def test_interweave_autodiff_jacobian_fallback():
    """log_det_inverse=None must reproduce the analytic-Jacobian kernel
    bitwise (same keys → same trajectory) via jacfwd + slogdet."""
    from mcmcpp_tpu.gibbs import InterweaveKernel

    y = jnp.asarray(np.array([0.4, -1.2, 0.9], np.float32))

    def forward(h, e):
        return jnp.exp(h[0]) * jnp.sinh(e)

    def inverse(h, f):
        return jnp.arcsinh(f * jnp.exp(-h[0]))

    def log_det_inverse(h, f):
        c2 = (f * jnp.exp(-h[0])) ** 2
        return jnp.sum(-h[0] - 0.5 * jnp.log1p(c2))

    common = dict(
        anc_logpdf=lambda e: -0.5 * jnp.sum(e * e),
        loglike=lambda f: -0.5 * jnp.sum((y - f) ** 2),
        hyper_logprior=lambda h: -0.5 * jnp.sum(h * h),
        make_hyper_kernel=lambda logp: RWMKernel(logp, 0.3),
    )
    ka = InterweaveKernel(forward, inverse,
                          log_det_inverse=log_det_inverse, **common)
    kb = InterweaveKernel(forward, inverse, **common)
    key = jax.random.PRNGKey(7)
    va = (jnp.asarray([0.2]), jnp.asarray([0.1, -0.3, 0.5]))
    for i in range(5):
        k = jax.random.fold_in(key, i)
        va_a = jax.jit(ka.step)(k, va, {})
        va_b = jax.jit(kb.step)(k, va, {})
        np.testing.assert_allclose(np.asarray(va_a[0]),
                                   np.asarray(va_b[0]), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(va_a[1]),
                                   np.asarray(va_b[1]), rtol=1e-5)
        va = va_a


def test_exact_gibbs_kernel_conjugate_block():
    """ExactGibbsKernel sampling the conjugate Normal-mean conditional:
    the chain IS the posterior from step one."""
    from mcmcpp_tpu.gibbs import ExactGibbsKernel

    tau, sig = 2.0, 0.8
    y = np.array([1.3, 0.9, 1.7, 1.1], np.float32)
    prec = 1.0 / tau**2 + y.size / sig**2
    mean_post = float(y.sum()) / sig**2 / prec

    def sample_mu(key, others):
        return (mean_post
                + prec**-0.5 * jax.random.normal(key, (1,)))

    s = BlockedGibbsSampler(
        [("mu", 1, ExactGibbsKernel(sample_mu))], n_chains=64, seed=0
    )
    s.init({"mu": np.zeros(1)})
    s.run(200, thin=2)
    mu = s.get_block("mu", flat=True)[:, 0]
    assert mu.mean() == pytest.approx(mean_post, abs=0.02)
    assert mu.std() == pytest.approx(prec**-0.5, rel=0.05)


def test_mixture_assignments_data_augmentation():
    """Two-component Gaussian mixture with EXPLICIT assignments: a
    categorical z-block (exact conditional) alternating with an exact
    conjugate mean-block — the model no other engine here can express
    without marginalizing the discrete latent."""
    from mcmcpp_tpu.gibbs import CategoricalGibbsKernel, ExactGibbsKernel

    rng = np.random.default_rng(0)
    sig, tau = 0.7, 5.0
    n0, n1 = 35, 45
    y = np.concatenate([
        rng.normal(-2.0, sig, n0), rng.normal(2.0, sig, n1)
    ]).astype(np.float32)
    n = y.size
    yj = jnp.asarray(y)

    def z_logits(others):
        mu = others["mu"]  # (2,)
        return -0.5 * ((yj[:, None] - mu[None, :]) / sig) ** 2  # (n, 2)

    def sample_mu(key, others):
        z = others["z"]  # (n,) float in {0, 1}
        onehot = jnp.stack([1.0 - z, z], axis=1)  # (n, 2)
        n_k = jnp.sum(onehot, axis=0)
        s_k = jnp.sum(onehot * yj[:, None], axis=0)
        prec = 1.0 / tau**2 + n_k / sig**2
        mean = (s_k / sig**2) / prec
        return mean + prec**-0.5 * jax.random.normal(key, (2,))

    s = BlockedGibbsSampler(
        [
            ("z", n, CategoricalGibbsKernel(z_logits)),
            ("mu", 2, ExactGibbsKernel(sample_mu)),
        ],
        n_chains=32, seed=1,
    )
    s.init({"z": np.zeros(n), "mu": np.array([-1.0, 1.0])})
    s.run(100, thin=100)  # burn
    s.chain.clear()
    s.run(400, thin=2)
    mu = s.get_block("mu", flat=True)
    truth = np.array([y[:n0].mean(), y[n0:].mean()])  # sep >> sig
    np.testing.assert_allclose(mu.mean(0), truth, atol=3 * sig / 5.0)
    # assignments recovered
    z_mean = s.get_block("z", flat=True).mean(0)
    accuracy = np.mean((z_mean > 0.5) == (np.arange(n) >= n0))
    assert accuracy > 0.95, f"assignment accuracy {accuracy:.3f}"
    # posterior sd of each mean ~ sig/sqrt(n_k)
    assert mu[:, 0].std() == pytest.approx(sig / np.sqrt(n0), rel=0.35)
    assert mu[:, 1].std() == pytest.approx(sig / np.sqrt(n1), rel=0.35)


def test_poisson_changepoint_exact_gibbs():
    """Coal-mining-style changepoint: y_t ~ Poisson(l1) before k,
    Poisson(l2) after; Gamma priors on rates. Fully conjugate Gibbs:
    rates via ExactGibbsKernel, the changepoint as ONE categorical site
    over n positions (its exact conditional). Oracle: the marginal
    posterior of k by direct enumeration (rates integrate out
    analytically under Gamma priors)."""
    from scipy.special import gammaln
    from mcmcpp_tpu.gibbs import CategoricalGibbsKernel, ExactGibbsKernel

    rng = np.random.default_rng(0)
    n, k_true = 60, 24
    y = np.concatenate([
        rng.poisson(4.0, k_true), rng.poisson(1.0, n - k_true)
    ]).astype(np.float32)
    yj = jnp.asarray(y)
    a, b = 2.0, 0.5  # Gamma(shape, rate) prior on both rates
    cumsum = jnp.concatenate([jnp.zeros(1), jnp.cumsum(yj)])
    total = float(y.sum())

    def k_logits(others):
        # p(k | l1, l2, y) ∝ exp(s_k log l1 + (S-s_k) log l2
        #                        - k l1 - (n-k) l2), k = 1..n-1
        l1, l2 = others["rates"]
        ks = jnp.arange(1, n)  # changepoint AFTER position k
        s_k = cumsum[ks]
        lg = (s_k * jnp.log(l1) + (total - s_k) * jnp.log(l2)
              - ks * l1 - (n - ks) * l2)
        return lg[None, :]  # one site, n-1 categories

    def sample_rates(key, others):
        k = others["k"][0].astype(jnp.int32) + 1  # category c -> k=c+1
        k1, k2 = jax.random.split(key)
        s1 = cumsum[k]
        l1 = jax.random.gamma(k1, a + s1) / (b + k)
        l2 = jax.random.gamma(k2, a + (total - s1)) / (b + (n - k))
        return jnp.stack([l1, l2])

    s = BlockedGibbsSampler(
        [
            ("k", 1, CategoricalGibbsKernel(k_logits)),
            ("rates", 2, ExactGibbsKernel(sample_rates)),
        ],
        n_chains=32, seed=1,
    )
    s.init({"k": np.full(1, float(n // 2 - 1)), "rates": np.array([2.0, 2.0])})
    s.run(100, thin=100)  # burn
    s.chain.clear()
    s.run(600, thin=2)
    k_draws = s.get_block("k", flat=True)[:, 0].astype(int) + 1

    # enumeration oracle: p(k | y) ∝ B(k) with rates integrated out
    ks = np.arange(1, n)
    s_k = np.concatenate([[0.0], np.cumsum(y)])[ks]
    lp = (gammaln(a + s_k) - (a + s_k) * np.log(b + ks)
          + gammaln(a + total - s_k) - (a + total - s_k) * np.log(b + n - ks))
    w = np.exp(lp - lp.max()); w /= w.sum()
    mean_true = float((w * ks).sum())
    sd_true = float(np.sqrt((w * (ks - mean_true) ** 2).sum()))
    assert k_draws.mean() == pytest.approx(mean_true, abs=0.5 * max(sd_true, 0.5))
    # the posterior mode matches enumeration
    mode_true = int(ks[np.argmax(w)])
    vals, counts = np.unique(k_draws, return_counts=True)
    assert abs(int(vals[np.argmax(counts)]) - mode_true) <= 1
    rates = s.get_block("rates", flat=True)
    assert rates[:, 0].mean() > 2.5 > rates[:, 1].mean()
