"""Nested sampling oracles: analytic/quadrature evidence, posterior
moments, multimodality, hard likelihood constraints.

Beyond-reference subsystem (SURVEY.md §2 — the reference has no evidence
machinery); oracle pattern per SURVEY.md §4.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mcmcpp_tpu.nested import NestedSampler

DIM = 2
# prior N(0, 4 I), likelihood N(1, I): Z = Π_d N(1; 0, sqrt(5))
LOGZ_TRUE = DIM * (-0.5 * np.log(2 * np.pi * 5.0) - 0.5 / 5.0)


def log_prior(t):
    return -0.5 * jnp.sum(t**2) / 4.0 - DIM / 2 * jnp.log(2 * jnp.pi * 4.0)


def log_like(t):
    return -0.5 * jnp.sum((t - 1.0) ** 2) - DIM / 2 * jnp.log(2 * jnp.pi)


def prior_sample(key, n):
    return 2.0 * jax.random.normal(key, (n, DIM))


def test_gaussian_evidence_and_posterior():
    ns = NestedSampler(log_prior, log_like, prior_sample, n_params=DIM,
                       n_live=500, batch=125, n_mcmc=25, seed=0)
    r = ns.run(dlogz=0.01)
    tol = max(3.0 * r.logz_err, 0.15)
    assert r.logz == pytest.approx(LOGZ_TRUE, abs=tol)
    assert ns.log_evidence == r.logz
    # conjugate posterior: N(0.8, 0.8 I)
    post = ns.posterior_samples(4000, seed=1)
    s2 = 1.0 / (1.0 / 4.0 + 1.0)
    np.testing.assert_allclose(post.mean(0), [s2, s2], atol=0.1)
    np.testing.assert_allclose(post.var(0), [s2, s2], atol=0.15)
    # ledger sanity: weights normalized, ESS positive, H ≈ KL(post||prior)
    assert np.exp(r.logw).sum() == pytest.approx(1.0, abs=1e-6)
    assert 0 < r.ess <= r.samples.shape[0]
    assert r.h > 0
    assert r.n_calls == 500 + r.n_iters * 125 * 25


@pytest.mark.slow
def test_multimodal_evidence_counts_both_modes():
    """Two well-separated likelihood modes: an annealed ladder can drop a
    mode (and its evidence share); the shell decomposition must not."""
    c = 4.0

    def ll_bimodal(t):
        one = -0.5 * jnp.sum((t - c) ** 2) - DIM / 2 * jnp.log(2 * jnp.pi)
        two = -0.5 * jnp.sum((t + c) ** 2) - DIM / 2 * jnp.log(2 * jnp.pi)
        return jnp.logaddexp(one, two) + jnp.log(0.5)

    # Z = 0.5 Π N(c;0,√5) + 0.5 Π N(-c;0,√5) (symmetric: = Π N(c;0,√5))
    logz_true = DIM * (-0.5 * np.log(2 * np.pi * 5.0) - 0.5 * c**2 / 5.0)
    ns = NestedSampler(log_prior, ll_bimodal, prior_sample, n_params=DIM,
                       n_live=800, batch=100, n_mcmc=40, seed=2)
    r = ns.run(dlogz=0.01)
    tol = max(3.0 * r.logz_err, 0.25)
    assert r.logz == pytest.approx(logz_true, abs=tol)
    # both modes must survive in the posterior draws
    post = ns.posterior_samples(4000, seed=3)
    side = post[:, 0] > 0
    frac = side.mean()
    assert 0.15 < frac < 0.85, f"mode collapse: {frac:.3f} in +c mode"


def test_hard_constraint_halfspace():
    """log L = -inf on half the prior mass (t0 < 0): evidence by quadrature."""

    def ll_gated(t):
        return jnp.where(
            t[0] < 0.0,
            -jnp.inf,
            -0.5 * jnp.sum((t - 1.0) ** 2) - DIM / 2 * jnp.log(2 * jnp.pi),
        )

    # Z = [∫_0^∞ N(x;0,2)N(x;1,1) dx] · [∫ N(y;0,2)N(y;1,1) dy]
    g = np.linspace(0, 20, 200001)
    f = (np.exp(-0.5 * g**2 / 4.0) / np.sqrt(2 * np.pi * 4.0)
         * np.exp(-0.5 * (g - 1.0) ** 2) / np.sqrt(2 * np.pi))
    z0 = np.trapezoid(f, g)
    g2 = np.linspace(-20, 20, 400001)
    f2 = (np.exp(-0.5 * g2**2 / 4.0) / np.sqrt(2 * np.pi * 4.0)
          * np.exp(-0.5 * (g2 - 1.0) ** 2) / np.sqrt(2 * np.pi))
    logz_true = np.log(z0) + np.log(np.trapezoid(f2, g2))

    ns = NestedSampler(log_prior, ll_gated, prior_sample, n_params=DIM,
                       n_live=500, batch=100, n_mcmc=30, seed=4)
    r = ns.run(dlogz=0.01)
    tol = max(3.0 * r.logz_err, 0.2)
    assert r.logz == pytest.approx(logz_true, abs=tol)
    post = ns.posterior_samples(2000, seed=5)
    assert (post[:, 0] >= 0).all()


def test_mesh_sharded_matches_unsharded():
    """Live set sharded over the 8-device CPU mesh: the iterate kernel's
    math has no cross-walker float reductions (the sort is a permutation,
    accept counts are exact int sums), so the mesh run must reproduce the
    unsharded run's dead points and ledger to float tolerance."""
    from mcmcpp_tpu.parallel.mesh import make_walker_mesh

    kw = dict(n_params=DIM, n_live=64, batch=16, n_mcmc=10, seed=3)
    ra = NestedSampler(log_prior, log_like, prior_sample, **kw).run(dlogz=0.05)
    ns = NestedSampler(log_prior, log_like, prior_sample,
                       mesh=make_walker_mesh(), **kw)
    rb = ns.run(dlogz=0.05)
    assert rb.n_iters == ra.n_iters
    assert rb.logz == pytest.approx(ra.logz, abs=1e-5)
    np.testing.assert_allclose(rb.samples, ra.samples, rtol=2e-6, atol=2e-6)


def test_mesh_sharded_slice_kernel_runs():
    from mcmcpp_tpu.parallel.mesh import make_walker_mesh

    ns = NestedSampler(log_prior, log_like, prior_sample, n_params=DIM,
                       n_live=64, batch=16, n_mcmc=4, seed=4,
                       kernel="slice", mesh=make_walker_mesh())
    r = ns.run(dlogz=0.05, max_iters=300)
    assert np.isfinite(r.logz)
    assert r.logz == pytest.approx(LOGZ_TRUE, abs=max(3 * r.logz_err, 0.4))


def test_validation():
    with pytest.raises(ValueError, match="batch"):
        NestedSampler(log_prior, log_like, prior_sample, n_params=DIM,
                      n_live=100, batch=100)
    ns = NestedSampler(log_prior, log_like,
                       lambda key, n: jnp.zeros((n, DIM + 1)),
                       n_params=DIM, n_live=50, batch=10)
    with pytest.raises(ValueError, match="prior_sample returned"):
        ns.run(max_iters=1)
    ns2 = NestedSampler(log_prior, log_like, prior_sample, n_params=DIM,
                        n_live=50, batch=10)
    with pytest.raises(RuntimeError, match="run"):
        _ = ns2.log_evidence
    with pytest.raises(RuntimeError, match="run"):
        ns2.posterior_samples(10)


def test_evidence_triad_agreement():
    """NS, SMC, and power-posterior PT must agree on the same model —
    three independent evidence engines, one analytic answer."""
    from mcmcpp_tpu.smc import SMCSampler

    smc = SMCSampler(log_prior, log_like, prior_sample,
                     n_particles=2048, n_params=DIM, n_mcmc=5, seed=0)
    smc.run()
    ns = NestedSampler(log_prior, log_like, prior_sample, n_params=DIM,
                       n_live=400, batch=100, n_mcmc=25, seed=1)
    r = ns.run()
    assert r.logz == pytest.approx(LOGZ_TRUE, abs=0.2)
    assert smc.log_evidence == pytest.approx(LOGZ_TRUE, abs=0.15)
    assert r.logz == pytest.approx(smc.log_evidence, abs=0.35)


def test_slice_kernel_gaussian_evidence():
    """PolyChord-style slice kernel on the same analytic target."""
    ns = NestedSampler(log_prior, log_like, prior_sample, n_params=DIM,
                       n_live=500, batch=125, n_mcmc=4, seed=0,
                       kernel="slice")
    r = ns.run(dlogz=0.01)
    tol = max(3.0 * r.logz_err, 0.15)
    assert r.logz == pytest.approx(LOGZ_TRUE, abs=tol)
    assert r.n_calls > 500  # honest eval accounting through the loops
    post = ns.posterior_samples(4000, seed=1)
    s2 = 1.0 / (1.0 / 4.0 + 1.0)
    np.testing.assert_allclose(post.mean(0), [s2, s2], atol=0.1)


@pytest.mark.slow
def test_slice_kernel_higher_dim():
    """P=8: stretch acceptance degrades with dimension; the slice kernel
    must still hit the analytic evidence."""
    dim = 8
    logz_true = dim * (-0.5 * np.log(2 * np.pi * 5.0) - 0.5 / 5.0)

    def lp(t):
        return (-0.5 * jnp.sum(t**2) / 4.0
                - dim / 2 * jnp.log(2 * jnp.pi * 4.0))

    def ll(t):
        return (-0.5 * jnp.sum((t - 1.0) ** 2)
                - dim / 2 * jnp.log(2 * jnp.pi))

    def ps(key, n):
        return 2.0 * jax.random.normal(key, (n, dim))

    ns = NestedSampler(lp, ll, ps, n_params=dim, n_live=800, batch=200,
                       n_mcmc=6, seed=1, kernel="slice")
    r = ns.run(dlogz=0.01)
    tol = max(3.0 * r.logz_err, 0.35)
    assert r.logz == pytest.approx(logz_true, abs=tol)


def test_unknown_kernel_rejected():
    with pytest.raises(ValueError, match="unknown kernel"):
        NestedSampler(log_prior, log_like, prior_sample, n_params=DIM,
                      n_live=100, kernel="walk")
