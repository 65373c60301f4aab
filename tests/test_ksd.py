"""Kernelized Stein discrepancy: algebra oracle + bias-detection power.

Oracle pattern per SURVEY.md §4: the Stein-kernel algebra is checked
against a direct O(n²) loop, detection against distributions with a KNOWN
discrepancy ordering, and the integration test ties KSD to its purpose —
ranking SGLD step sizes by invariant-measure bias, which ESS/R-hat are
blind to by construction.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mcmcpp_tpu.analysis.ksd import _ksd_sum, ksd, ksd_curve


def _brute(x, s, c=1.0, beta=-0.5):
    n, p = x.shape
    tot = 0.0
    for i in range(n):
        for j in range(n):
            if i == j:
                continue
            d = x[i] - x[j]
            r2 = d @ d
            u = c * c + r2
            tot += (u**beta * (s[i] @ s[j])
                    + 2 * beta * u ** (beta - 1) * (d @ (s[j] - s[i]))
                    - 4 * beta * (beta - 1) * u ** (beta - 2) * r2
                    - 2 * beta * p * u ** (beta - 1))
    return tot


def test_stein_kernel_matches_bruteforce():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((37, 2)).astype(np.float32)
    s = (0.7 * rng.standard_normal((37, 2)) - x).astype(np.float32)
    got = float(_ksd_sum(jnp.asarray(x), jnp.asarray(s),
                         jnp.asarray(np.float32(1.0)), -0.5, True))
    want = _brute(x.astype(np.float64), s.astype(np.float64))
    assert got == pytest.approx(want, rel=1e-4)


def test_blocked_padding_path_matches_dense():
    # n > block forces padding + multi-block accumulation
    rng = np.random.default_rng(2)
    n, p = 2050, 3
    x = rng.standard_normal((n, p)).astype(np.float32)
    s = -x
    X = x.astype(np.float64)
    r2 = ((X[:, None, :] - X[None, :, :]) ** 2).sum(-1)
    u = 1.0 + r2
    beta = -0.5
    ss = -X @ -X.T
    d = X[:, None, :] - X[None, :, :]
    dds = np.einsum("ijk,jk->ij", d, -X) - np.einsum("ijk,ik->ij", d, -X)
    k0 = (u**beta * ss + 2 * beta * u ** (beta - 1) * dds
          - 4 * beta * (beta - 1) * u ** (beta - 2) * r2
          - 2 * beta * p * u ** (beta - 1))
    np.fill_diagonal(k0, 0.0)
    got = float(_ksd_sum(jnp.asarray(x), jnp.asarray(s),
                         jnp.asarray(np.float32(1.0)), -0.5, True))
    assert got == pytest.approx(k0.sum(), rel=1e-4)


def test_detects_mean_and_scale_bias():
    logp = lambda t: -0.5 * jnp.sum(t * t)
    rng = np.random.default_rng(0)
    exact = rng.standard_normal((2000, 3)).astype(np.float32)
    k_exact = ksd(exact, score_fn=logp)
    k_shift = ksd(exact + 0.3, score_fn=logp)
    k_wide = ksd(1.3 * exact, score_fn=logp)
    assert k_shift > 5 * k_exact
    assert k_wide > 5 * k_exact


def test_scores_shape_validated():
    with pytest.raises(ValueError):
        ksd(np.zeros((10, 2)), scores=np.zeros((10, 3)))
    with pytest.raises(ValueError):
        ksd(np.zeros((10, 2)))


def test_ksd_curve_matched_subsampling():
    logp = lambda t: -0.5 * jnp.sum(t * t)
    rng = np.random.default_rng(4)
    out = ksd_curve(
        {"good": rng.standard_normal((3000, 2)),
         "bad": rng.standard_normal((5000, 2)) + 0.5},
        score_fn=logp, n=1500,
    )
    assert set(out) == {"good", "bad"}
    assert out["bad"] > out["good"]


@pytest.mark.slow
def test_ranks_sgld_step_sizes():
    # SGLD's invariant measure has O(eps) bias: KSD at matched n must
    # rank a 50x-too-large step below a sane one. Conjugate Gaussian
    # target (same setup as test_sgmcmc.py) so the true score is exact.
    from mcmcpp_tpu import SGLDSampler

    rng = np.random.default_rng(0)
    dim, n_data = 3, 2048
    y = (0.5 + rng.standard_normal((n_data, dim))).astype(np.float32)
    prec = 1.0 + n_data
    post_mean = y.sum(axis=0) / prec

    logprior = lambda t: -0.5 * jnp.sum(t * t)
    loglike = lambda t, batch: -0.5 * jnp.sum((batch - t[None, :]) ** 2)
    score = lambda t: (-0.5 * prec
                       * jnp.sum((t - jnp.asarray(post_mean)) ** 2))

    draws = {}
    for name, eps in [("good", 2e-5), ("biased", 1e-3)]:
        s = SGLDSampler(logprior, loglike, y, n_chains=16, n_params=dim,
                        batch_size=256, seed=1, step_size=eps)
        s.init_ball(post_mean, scale=0.02, seed=2)
        s.run(1500)
        draws[name] = s.get_samples(burn_in=500, flat=True)
    out = ksd_curve(draws, score_fn=score, n=2000, seed=0)
    # eps=1e-3 sits at the ULA stability edge (eps*prec ~ 2) and
    # roughly doubles the stationary variance; fixed seeds make
    # the 1.5x margin deterministic
    assert out["biased"] > 1.5 * out["good"], out
