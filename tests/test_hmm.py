"""HMM oracles: for T=6, K=3 the full path space (3^6 = 729) enumerates
in float64 numpy, giving EXACT loglik / filtered / smoothed marginals /
path-posterior truths (SURVEY.md §4 oracle pattern). The parallel
associative-scan path must match the sequential one; FFBS draw
frequencies must match exact conditionals; the Gibbs kernel runs
end-to-end with conjugate Dirichlet transition rows.
"""

import itertools

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mcmcpp_tpu.models.hmm import (
    HMMKernel,
    gaussian_emission_logpdf,
    hmm_forward,
    hmm_loglik,
    hmm_sample_posterior,
    hmm_smoother,
    transition_counts,
    viterbi,
)

K, T = 3, 6


def _model():
    rng = np.random.default_rng(0)
    pi = rng.dirichlet(np.ones(K))
    gamma = rng.dirichlet(np.ones(K), size=K)
    log_obs = np.log(rng.uniform(0.05, 1.0, (T, K)))
    return (np.log(pi).astype(np.float32),
            np.log(gamma).astype(np.float32),
            log_obs.astype(np.float32))


def _enumerate(log_pi, log_gamma, log_obs):
    """float64 exact: joint log-prob of every path, (3^T, T) paths."""
    lp = np.asarray(log_pi, np.float64)
    lg = np.asarray(log_gamma, np.float64)
    lo = np.asarray(log_obs, np.float64)
    paths = np.array(list(itertools.product(range(K), repeat=T)))
    joint = lp[paths[:, 0]] + lo[0, paths[:, 0]]
    for t in range(1, T):
        joint += lg[paths[:, t - 1], paths[:, t]] + lo[t, paths[:, t]]
    return paths, joint


def test_loglik_and_filter_vs_enumeration():
    log_pi, log_gamma, log_obs = _model()
    paths, joint = _enumerate(log_pi, log_gamma, log_obs)
    from scipy.special import logsumexp as lse

    exact_ll = lse(joint)
    for method in ("sequential", "parallel"):
        fwd = hmm_forward(log_pi, log_gamma, log_obs, method=method)
        np.testing.assert_allclose(float(fwd.loglik), exact_ll, rtol=2e-5)
        # filtered marginals at each t: condition on y_{1:t} only
        for t in range(T):
            pre = np.asarray(log_pi, np.float64)[None]  # recompute prefix
            # prefix joint over paths of length t+1
            sub_paths = np.array(
                list(itertools.product(range(K), repeat=t + 1))
            )
            j = (np.asarray(log_pi, np.float64)[sub_paths[:, 0]]
                 + np.asarray(log_obs, np.float64)[0, sub_paths[:, 0]])
            for s in range(1, t + 1):
                j += (np.asarray(log_gamma, np.float64)[
                          sub_paths[:, s - 1], sub_paths[:, s]]
                      + np.asarray(log_obs, np.float64)[s, sub_paths[:, s]])
            marg = np.array([
                lse(j[sub_paths[:, t] == k2]) for k2 in range(K)
            ])
            marg -= lse(marg)
            np.testing.assert_allclose(
                np.asarray(fwd.log_alpha[t]), marg, rtol=2e-4, atol=2e-4
            )


def test_smoother_vs_enumeration():
    log_pi, log_gamma, log_obs = _model()
    paths, joint = _enumerate(log_pi, log_gamma, log_obs)
    from scipy.special import logsumexp as lse

    for method in ("sequential", "parallel"):
        post, ll = hmm_smoother(log_pi, log_gamma, log_obs, method=method)
        for t in range(T):
            marg = np.array([
                lse(joint[paths[:, t] == k2]) for k2 in range(K)
            ])
            marg -= lse(marg)
            np.testing.assert_allclose(
                np.asarray(post[t]), marg, rtol=2e-4, atol=2e-4
            )


def test_ffbs_draw_frequencies_match_posterior():
    log_pi, log_gamma, log_obs = _model()
    paths, joint = _enumerate(log_pi, log_gamma, log_obs)
    w = np.exp(joint - joint.max())
    w /= w.sum()
    n = 20000
    draws = np.asarray(hmm_sample_posterior(
        jax.random.key(1), log_pi, log_gamma, log_obs, n_paths=n
    ))
    assert draws.shape == (n, T)
    # joint path frequencies vs exact posterior over ALL 729 paths
    codes = draws @ (K ** np.arange(T - 1, -1, -1))
    path_codes = paths @ (K ** np.arange(T - 1, -1, -1))
    freq = np.bincount(codes, minlength=K**T) / n
    exact = np.zeros(K**T)
    exact[path_codes] = w
    # chi^2-ish band: 5 sigma on each cell with p(1-p)/n variance
    se = np.sqrt(exact * (1 - exact) / n)
    assert (np.abs(freq - exact) < 5 * se + 3e-4).all()
    # pairwise transition frequencies (catches backward-kernel index bugs)
    t = T // 2
    emp = np.zeros((K, K))
    for a, b in zip(draws[:, t], draws[:, t + 1]):
        emp[a, b] += 1
    emp /= n
    exact_pair = np.zeros((K, K))
    for a in range(K):
        for b in range(K):
            m = (paths[:, t] == a) & (paths[:, t + 1] == b)
            exact_pair[a, b] = w[m].sum()
    assert (np.abs(emp - exact_pair) < 5 * np.sqrt(
        exact_pair * (1 - exact_pair) / n
    ) + 3e-4).all()


def test_viterbi_vs_enumeration():
    log_pi, log_gamma, log_obs = _model()
    paths, joint = _enumerate(log_pi, log_gamma, log_obs)
    path, score = viterbi(log_pi, log_gamma, log_obs)
    best = paths[np.argmax(joint)]
    np.testing.assert_array_equal(np.asarray(path), best)
    np.testing.assert_allclose(float(score), joint.max(), rtol=2e-5)


def test_parallel_matches_sequential_long():
    rng = np.random.default_rng(4)
    k2, t2 = 5, 257  # odd length exercises the scan's ragged tail
    log_pi = np.log(rng.dirichlet(np.ones(k2))).astype(np.float32)
    log_gamma = np.log(rng.dirichlet(np.ones(k2), size=k2)).astype(
        np.float32
    )
    log_obs = np.log(rng.uniform(0.05, 1.0, (t2, k2))).astype(np.float32)
    fs = hmm_forward(log_pi, log_gamma, log_obs, method="sequential")
    fp = hmm_forward(log_pi, log_gamma, log_obs, method="parallel")
    np.testing.assert_allclose(fp.loglik, fs.loglik, rtol=3e-4)
    np.testing.assert_allclose(fp.log_alpha, fs.log_alpha, rtol=2e-3,
                               atol=2e-3)


def test_transition_counts():
    path = jnp.asarray([0, 1, 1, 2, 0, 0], jnp.int32)
    c = np.asarray(transition_counts(path, 3))
    expect = np.array([[1, 1, 0], [0, 1, 1], [1, 0, 0]])
    np.testing.assert_array_equal(c, expect)


def test_grad_flows_through_loglik():
    log_pi, log_gamma, log_obs = _model()

    def f(lg):
        lgn = lg - jax.scipy.special.logsumexp(lg, 1, keepdims=True)
        return hmm_loglik(log_pi, lgn, log_obs)

    g = jax.grad(f)(jnp.asarray(log_gamma))
    assert np.isfinite(np.asarray(g)).all()


@pytest.mark.slow
def test_gibbs_recovers_states_and_transitions():
    """2-state Gaussian-emission HMM: z block by HMMKernel, transition
    rows by their exact Dirichlet conjugate (via transition_counts).
    Decoded states must match the truth and the sticky diagonal must be
    recovered."""
    rng = np.random.default_rng(7)
    t_n = 200
    gamma_true = np.array([[0.95, 0.05], [0.10, 0.90]])
    mus = np.array([-1.5, 1.5])
    z = np.zeros(t_n, int)
    for t in range(1, t_n):
        z[t] = rng.choice(2, p=gamma_true[z[t - 1]])
    ys = (mus[z] + 0.7 * rng.standard_normal(t_n)).astype(np.float32)

    log_obs = gaussian_emission_logpdf(ys, mus, np.array([0.7, 0.7]))
    log_pi = np.log(np.array([0.5, 0.5], np.float32))

    from mcmcpp_tpu import BlockedGibbsSampler, ExactGibbsKernel

    def log_gamma_fn(others):
        return others["lgam"].reshape(2, 2)

    def sample_rows(key, others):
        counts = transition_counts(
            others["z"].astype(jnp.int32), 2
        ).astype(jnp.float32)
        # Dirichlet(1 + counts) per row via normalized gammas
        g = jax.random.gamma(key, counts + 1.0)
        rows = g / jnp.sum(g, axis=1, keepdims=True)
        return jnp.log(rows).reshape(-1)

    gb = BlockedGibbsSampler(
        [
            ("z", t_n, HMMKernel(log_obs, log_pi, log_gamma_fn)),
            ("lgam", 4, ExactGibbsKernel(sample_rows)),
        ],
        n_chains=8, seed=0,
    )
    gb.init({
        "z": rng.integers(0, 2, t_n).astype(np.float32),
        "lgam": np.log(np.full((2, 2), 0.5)).reshape(-1).astype(
            np.float32
        ),
    })
    gb.run(250)
    zs = np.asarray(gb.get_block("z"))[50:]
    lgs = np.asarray(gb.get_block("lgam"))[50:].reshape(-1, 2, 2)
    z_hat = (zs.mean((0, 1)) > 0.5).astype(int)
    assert (z_hat == z).mean() > 0.9, (z_hat == z).mean()
    diag = np.exp(lgs)[:, [0, 1], [0, 1]].mean(0)
    assert abs(diag[0] - 0.95) < 0.08, diag
    assert abs(diag[1] - 0.90) < 0.12, diag


def test_forecast_vs_enumeration():
    """p(z_{T+k} | y_{1:T}) by brute force over 3^(T+h) extended paths
    (transition factors throughout, obs factors only for t < T)."""
    from scipy.special import logsumexp as lse

    from mcmcpp_tpu.models.hmm import hmm_forecast

    log_pi, log_gamma, log_obs = _model()
    h = 2
    preds = np.asarray(hmm_forecast(log_pi, log_gamma, log_obs, horizon=h))
    lp = np.asarray(log_pi, np.float64)
    lg = np.asarray(log_gamma, np.float64)
    lo = np.asarray(log_obs, np.float64)
    paths = np.array(list(itertools.product(range(K), repeat=T + h)))
    joint = lp[paths[:, 0]] + lo[0, paths[:, 0]]
    for t in range(1, T + h):
        joint += lg[paths[:, t - 1], paths[:, t]]
        if t < T:
            joint += lo[t, paths[:, t]]
    for k in range(h):
        marg = np.array([
            lse(joint[paths[:, T + k] == s]) for s in range(K)
        ])
        marg -= lse(marg)
        np.testing.assert_allclose(preds[k], marg, rtol=2e-4, atol=2e-4)


def test_hmm_kernel_mesh_sharded_bitwise():
    """HMMKernel inside a sharded BlockedGibbs sweep: chain-axis sharding
    over the 8-device mesh must not change a bit (round-3 verdict item 4;
    same contract as test_pmmh_mesh_sharded_bitwise)."""
    from mcmcpp_tpu import BlockedGibbsSampler, ExactGibbsKernel
    from mcmcpp_tpu.parallel.mesh import make_walker_mesh

    rng = np.random.default_rng(3)
    t_n = 24
    ys = rng.standard_normal(t_n).astype(np.float32)
    log_obs = gaussian_emission_logpdf(
        ys, np.array([-1.0, 1.0]), np.array([0.8, 0.8])
    )
    log_pi = np.log(np.array([0.5, 0.5], np.float32))

    def log_gamma_fn(others):
        return others["lgam"].reshape(2, 2)

    def sample_rows(key, others):
        counts = transition_counts(
            others["z"].astype(jnp.int32), 2
        ).astype(jnp.float32)
        g = jax.random.gamma(key, counts + 1.0)
        rows = g / jnp.sum(g, axis=1, keepdims=True)
        return jnp.log(rows).reshape(-1)

    def build(mesh):
        gb = BlockedGibbsSampler(
            [
                ("z", t_n, HMMKernel(log_obs, log_pi, log_gamma_fn)),
                ("lgam", 4, ExactGibbsKernel(sample_rows)),
            ],
            n_chains=16, seed=0, mesh=mesh,
        )
        gb.init({
            "z": np.zeros(t_n, np.float32),
            "lgam": np.log(np.full((2, 2), 0.5)).reshape(-1).astype(
                np.float32
            ),
        })
        gb.run(10)
        return np.asarray(gb.get_samples())

    a = build(None)
    b = build(make_walker_mesh())
    np.testing.assert_array_equal(a, b)
