"""Linear-Gaussian state-space oracles.

Strategy (SURVEY.md §4 pattern): the parallel associative-scan paths must
match their sequential ``lax.scan`` twins to float tolerance, and BOTH
must match a dense joint-Gaussian brute force computed with numpy in
float64 (for small T the whole (x_{1:T}, y_{1:T}) joint is one Gaussian,
so filtering/smoothing/likelihood have closed forms by conditioning).
FFBS draws are validated against the smoother moments, and the Gibbs
kernel end-to-end on a conjugate local-level model.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mcmcpp_tpu.models.lgss import (
    LGSSKernel,
    ffbs_sample,
    forecast,
    kalman_filter,
    lgss_loglik,
    lgss_params,
    rts_smoother,
)

D, E, T = 2, 1, 7


def _params():
    rng = np.random.default_rng(3)
    A = np.array([[0.9, 0.2], [-0.1, 0.7]])
    b = np.array([0.1, -0.2])
    q = rng.standard_normal((D, D)) * 0.3
    Q = q @ q.T + 0.05 * np.eye(D)
    H = np.array([[1.0, 0.5]])
    c = np.array([0.3])
    R = np.array([[0.4]])
    m0 = np.array([0.5, -0.5])
    P0 = np.array([[0.8, 0.1], [0.1, 0.6]])
    return lgss_params(A, b, Q, H, c, R, m0, P0), (A, b, Q, H, c, R, m0, P0)


def _ys():
    rng = np.random.default_rng(7)
    return rng.standard_normal((T, E)).astype(np.float32)


def _dense_joint(A, b, Q, H, c, R, m0, P0, initial="state"):
    """float64 mean/cov of the stacked (x_{1:T}, y_{1:T}) joint."""
    mx = np.zeros((T, D))
    # cross-covariances via the linear map x = F eps + const with
    # eps = (x1-noise-chain); easier: build recursively
    cov = np.zeros((T * D, T * D))
    if initial == "state":
        mx[0] = m0
        cov[:D, :D] = P0
    else:
        mx[0] = A @ m0 + b
        cov[:D, :D] = A @ P0 @ A.T + Q
    for t in range(1, T):
        mx[t] = A @ mx[t - 1] + b
        # Cov(x_t, x_s) = A Cov(x_{t-1}, x_s) for s < t
        for s in range(t):
            blk = A @ cov[(t - 1) * D:t * D, s * D:(s + 1) * D]
            cov[t * D:(t + 1) * D, s * D:(s + 1) * D] = blk
            cov[s * D:(s + 1) * D, t * D:(t + 1) * D] = blk.T
        cov[t * D:(t + 1) * D, t * D:(t + 1) * D] = (
            A @ cov[(t - 1) * D:t * D, (t - 1) * D:t * D] @ A.T + Q
        )
    Hbig = np.kron(np.eye(T), H)
    my = (Hbig @ mx.reshape(-1)).reshape(T, E) + c
    cov_yy = Hbig @ cov @ Hbig.T + np.kron(np.eye(T), R)
    cov_xy = cov @ Hbig.T
    return mx.reshape(-1), cov, my.reshape(-1), cov_yy, cov_xy


def _dense_condition(mx, cov, my, cov_yy, cov_xy, y_obs):
    sol = np.linalg.solve(cov_yy, (y_obs - my))
    mean_post = mx + cov_xy @ sol
    cov_post = cov - cov_xy @ np.linalg.solve(cov_yy, cov_xy.T)
    return mean_post.reshape(T, D), cov_post


@pytest.mark.parametrize("initial", ["state", "prior"])
def test_parallel_matches_sequential(initial):
    p, _ = _params()
    ys = _ys()
    fp = kalman_filter(p, ys, method="parallel", initial=initial)
    fs = kalman_filter(p, ys, method="sequential", initial=initial)
    np.testing.assert_allclose(fp.means, fs.means, rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(fp.covs, fs.covs, rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(fp.loglik, fs.loglik, rtol=2e-5)


@pytest.mark.parametrize("initial", ["state", "prior"])
def test_filter_vs_dense_joint(initial):
    p, raw = _params()
    ys = _ys()
    f = kalman_filter(p, ys, method="parallel", initial=initial)
    for t in range(T):
        # condition the dense joint on y_{1:t+1} only (filtering)
        mx, cov, my, cov_yy, cov_xy = _dense_joint(*raw, initial=initial)
        k = (t + 1) * E
        sub = np.ix_(range(k), range(k))
        sol = np.linalg.solve(cov_yy[sub], ys[: t + 1].reshape(-1) - my[:k])
        mean_t = (mx + cov_xy[:, :k] @ sol).reshape(T, D)[t]
        cov_full = cov - cov_xy[:, :k] @ np.linalg.solve(
            cov_yy[sub], cov_xy[:, :k].T
        )
        cov_t = cov_full[t * D:(t + 1) * D, t * D:(t + 1) * D]
        np.testing.assert_allclose(f.means[t], mean_t, rtol=2e-3, atol=2e-4)
        np.testing.assert_allclose(f.covs[t], cov_t, rtol=2e-3, atol=2e-4)


def test_loglik_vs_dense_gaussian():
    p, raw = _params()
    ys = _ys()
    _, _, my, cov_yy, _ = _dense_joint(*raw)
    resid = ys.reshape(-1) - my
    sign, logdet = np.linalg.slogdet(cov_yy)
    ll_dense = -0.5 * (
        T * E * np.log(2 * np.pi) + logdet
        + resid @ np.linalg.solve(cov_yy, resid)
    )
    for method in ("parallel", "sequential"):
        ll = float(lgss_loglik(p, ys, method=method))
        np.testing.assert_allclose(ll, ll_dense, rtol=2e-4)


def test_smoother_vs_dense_joint():
    p, raw = _params()
    ys = _ys()
    means, covs = rts_smoother(p, ys)
    mx, cov, my, cov_yy, cov_xy = _dense_joint(*raw)
    mean_post, cov_post = _dense_condition(mx, cov, my, cov_yy, cov_xy,
                                           ys.reshape(-1))
    np.testing.assert_allclose(means, mean_post, rtol=2e-3, atol=3e-4)
    for t in range(T):
        np.testing.assert_allclose(
            covs[t], cov_post[t * D:(t + 1) * D, t * D:(t + 1) * D],
            rtol=2e-3, atol=3e-4,
        )


def test_ffbs_parallel_matches_sequential_bitwise_inputs():
    """Same key, same filtered input: the two FFBS paths draw the same
    trajectory up to float reassociation."""
    p, _ = _params()
    ys = _ys()
    f = kalman_filter(p, ys)
    key = jax.random.key(0)
    xp = ffbs_sample(key, p, filtered=f, method="parallel")
    xs = ffbs_sample(key, p, filtered=f, method="sequential")
    np.testing.assert_allclose(xp, xs, rtol=3e-4, atol=3e-5)


def test_ffbs_moments_match_smoother():
    """Mean/variance/lag-1 cross-cov of many FFBS draws = RTS smoother /
    dense-joint truth (the draw is from the exact joint conditional)."""
    p, raw = _params()
    ys = _ys()
    f = kalman_filter(p, ys)
    n = 4000
    keys = jax.random.split(jax.random.key(1), n)
    draws = jax.vmap(
        lambda k: ffbs_sample(k, p, filtered=f, method="parallel")
    )(keys)  # (n, T, D)
    draws = np.asarray(draws, np.float64)
    means, covs = rts_smoother(p, ys, filtered=f)
    np.testing.assert_allclose(draws.mean(0), np.asarray(means),
                               atol=4.5 * np.sqrt(
                                   np.asarray(covs).max() / n) + 1e-3)
    emp_var = draws.var(0)
    np.testing.assert_allclose(
        emp_var, np.asarray([np.diag(c) for c in covs]), rtol=0.15,
        atol=5e-3,
    )
    # joint structure: lag-1 cross-covariance vs the dense conditional
    mx, cov, my, cov_yy, cov_xy = _dense_joint(*raw)
    _, cov_post = _dense_condition(mx, cov, my, cov_yy, cov_xy,
                                   ys.reshape(-1))
    t = T // 2
    c01 = np.zeros((D, D))
    d0 = draws[:, t, :] - draws[:, t, :].mean(0)
    d1 = draws[:, t + 1, :] - draws[:, t + 1, :].mean(0)
    c01 = d0.T @ d1 / (n - 1)
    truth = cov_post[t * D:(t + 1) * D, (t + 1) * D:(t + 2) * D]
    np.testing.assert_allclose(c01, truth, atol=6.0 / np.sqrt(n))


def test_kernel_in_blocked_gibbs_conjugate_local_level():
    """End-to-end: local-level model with unknown obs variance.

    x block by FFBS (LGSSKernel), sigma2_r by its exact conjugate
    inverse-gamma conditional (ExactGibbsKernel). The posterior mean of
    sigma2_r must land near the value implied by the data (generous MC
    tolerance; fixed seeds)."""
    from mcmcpp_tpu import BlockedGibbsSampler, ExactGibbsKernel

    rng = np.random.default_rng(11)
    t_n = 60
    sig_q, sig_r = 0.25, 0.7
    x_true = np.cumsum(rng.normal(0, sig_q, t_n)) + 1.0
    ys = (x_true + rng.normal(0, sig_r, t_n)).astype(np.float32)

    a0, b0 = 2.0, 1.0  # IG prior on sigma2_r

    def params_fn(others):
        return lgss_params(
            A=1.0, b=0.0, Q=sig_q**2, H=1.0, c=0.0,
            R=others["s2r"][0], m0=1.0, P0=4.0,
        )

    def sample_s2r(key, others):
        x = others["x"]
        resid = jnp.asarray(ys) - x
        a_n = a0 + 0.5 * t_n
        b_n = b0 + 0.5 * jnp.sum(resid * resid)
        return (b_n / jax.random.gamma(key, a_n))[None]

    gb = BlockedGibbsSampler(
        [
            ("x", t_n, LGSSKernel(ys, params_fn)),
            ("s2r", 1, ExactGibbsKernel(sample_s2r)),
        ],
        n_chains=8, seed=0,
    )
    gb.init({"x": np.zeros(t_n, np.float32),
             "s2r": np.ones(1, np.float32)})
    gb.run(400)
    s2r = np.asarray(gb.get_block("s2r"))[100:].reshape(-1)
    x_draws = np.asarray(gb.get_block("x"))[100:]  # (S, C, T)
    # posterior concentrates near the truth (few-hundred-draw MC bands)
    assert 0.2 < s2r.mean() < 1.2, s2r.mean()
    # the sampled trajectories must track the latent truth much more
    # tightly than the raw observations' noise level
    rmse = np.sqrt(((x_draws.mean((0, 1)) - x_true) ** 2).mean())
    assert rmse < sig_r, rmse


def test_kernel_step_shapes_and_dtype():
    p, _ = _params()
    ys = _ys()
    kern = LGSSKernel(ys, p)
    x0 = jnp.zeros(T * D, jnp.float32)
    out = jax.jit(lambda k, x: kern.step(k, x, {}))(jax.random.key(2), x0)
    assert out.shape == (T * D,)
    assert out.dtype == jnp.float32
    assert np.isfinite(np.asarray(out)).all()


def test_forecast_vs_dense_joint():
    """k-step-ahead predictive = dense joint over T+h states conditioned
    on the first T observations only."""
    from mcmcpp_tpu.models.lgss import forecast

    p, raw = _params()
    ys = _ys()
    h = 3
    ms, Ps, om, oP = forecast(p, ys, horizon=h)
    A, b, Q, H, c, R, m0, P0 = raw

    # dense joint over T+h states, conditioning on y_{1:T}
    tt = T + h
    mx = np.zeros((tt, D))
    cov = np.zeros((tt * D, tt * D))
    mx[0] = m0
    cov[:D, :D] = P0
    for t in range(1, tt):
        mx[t] = A @ mx[t - 1] + b
        for s in range(t):
            blk = A @ cov[(t - 1) * D:t * D, s * D:(s + 1) * D]
            cov[t * D:(t + 1) * D, s * D:(s + 1) * D] = blk
            cov[s * D:(s + 1) * D, t * D:(t + 1) * D] = blk.T
        cov[t * D:(t + 1) * D, t * D:(t + 1) * D] = (
            A @ cov[(t - 1) * D:t * D, (t - 1) * D:t * D] @ A.T + Q
        )
    Hobs = np.kron(np.eye(tt)[:T], H)  # observe only the first T states
    my = (Hobs @ mx.reshape(-1)).reshape(T, 1) + c
    cov_yy = Hobs @ cov @ Hobs.T + np.kron(np.eye(T), R)
    cov_xy = cov @ Hobs.T
    sol = np.linalg.solve(cov_yy, ys.reshape(-1) - my.reshape(-1))
    mean_post = (mx.reshape(-1) + cov_xy @ sol).reshape(tt, D)
    cov_post = cov - cov_xy @ np.linalg.solve(cov_yy, cov_xy.T)
    for k in range(h):
        t = T + k
        np.testing.assert_allclose(np.asarray(ms[k]), mean_post[t],
                                   rtol=2e-3, atol=3e-4)
        Pk = cov_post[t * D:(t + 1) * D, t * D:(t + 1) * D]
        np.testing.assert_allclose(np.asarray(Ps[k]), Pk, rtol=2e-3,
                                   atol=3e-4)
        np.testing.assert_allclose(np.asarray(om[k]), H @ mean_post[t] + c,
                                   rtol=2e-3, atol=3e-4)
        np.testing.assert_allclose(np.asarray(oP[k]), H @ Pk @ H.T + R,
                                   rtol=2e-3, atol=3e-4)


@pytest.mark.parametrize("method", ["parallel", "sequential"])
def test_missing_observations_vs_dense_joint(method):
    """NaN rows are skipped: filter/loglik must equal the dense joint
    conditioned on the OBSERVED subset only, for both scan paths."""
    p, raw = _params()
    ys = _ys().copy()
    missing = [1, 2, 5]
    obs = np.array([t not in missing for t in range(T)])
    ys[missing] = np.nan
    f = kalman_filter(p, ys, method=method)

    mx, cov, my, cov_yy, cov_xy = _dense_joint(*raw)
    keep = np.repeat(obs, E)
    y_o = _ys()[obs].reshape(-1)
    sub = np.ix_(keep, keep)
    sol = np.linalg.solve(cov_yy[sub], y_o - my[keep])
    # loglik on the observed subset
    sign, logdet = np.linalg.slogdet(cov_yy[sub])
    ll_dense = -0.5 * (
        obs.sum() * E * np.log(2 * np.pi) + logdet
        + (y_o - my[keep]) @ sol
    )
    np.testing.assert_allclose(float(f.loglik), ll_dense, rtol=3e-4)
    # filtered moments at each t: condition on observed rows with s <= t
    for t in range(T):
        k = np.repeat(obs & (np.arange(T) <= t), E)
        if not k.any():
            mean_t = mx.reshape(T, D)[t]
            cov_full = cov
        else:
            sub_k = np.ix_(k, k)
            sol_k = np.linalg.solve(cov_yy[sub_k],
                                    _ys().reshape(-1)[k] - my[k])
            mean_t = (mx + cov_xy[:, k] @ sol_k).reshape(T, D)[t]
            cov_full = cov - cov_xy[:, k] @ np.linalg.solve(
                cov_yy[sub_k], cov_xy[:, k].T
            )
        cov_t = cov_full[t * D:(t + 1) * D, t * D:(t + 1) * D]
        np.testing.assert_allclose(f.means[t], mean_t, rtol=3e-3,
                                   atol=3e-4)
        np.testing.assert_allclose(f.covs[t], cov_t, rtol=3e-3, atol=3e-4)


def test_missing_observations_ffbs_and_smoother():
    """FFBS draws through a gap match the smoother moments conditioned
    on the observed subset (the draw imputes the gap exactly)."""
    p, raw = _params()
    ys = _ys().copy()
    ys[3] = np.nan
    f = kalman_filter(p, ys)
    means, covs = rts_smoother(p, filtered=f)
    n = 3000
    keys = jax.random.split(jax.random.key(5), n)
    draws = np.asarray(jax.vmap(
        lambda k: ffbs_sample(k, p, filtered=f)
    )(keys), np.float64)
    sds = np.sqrt(np.asarray([np.diag(c) for c in covs]))
    np.testing.assert_allclose(
        draws.mean(0), np.asarray(means),
        atol=5.0 * sds.max() / np.sqrt(n) + 2e-3,
    )
    np.testing.assert_allclose(draws.std(0), sds, rtol=0.15, atol=5e-3)


@pytest.mark.parametrize("t_n,seed", [(1, 0), (2, 1), (3, 2), (5, 3),
                                      (17, 4)])
def test_fuzz_mask_patterns_parallel_equals_sequential(t_n, seed):
    """Random missing patterns (incl. all-missing / all-observed) over
    odd lengths: the two scan paths must agree and stay finite."""
    p, _ = _params()
    rng = np.random.default_rng(seed)
    ys = rng.standard_normal((t_n, E)).astype(np.float32)
    masks = [np.ones(t_n, bool), np.zeros(t_n, bool),
             rng.random(t_n) < 0.5]
    for mask in masks:
        fp = kalman_filter(p, ys, method="parallel", mask=mask)
        fs = kalman_filter(p, ys, method="sequential", mask=mask)
        np.testing.assert_allclose(fp.means, fs.means, rtol=3e-4,
                                   atol=3e-5)
        np.testing.assert_allclose(fp.covs, fs.covs, rtol=3e-4,
                                   atol=3e-5)
        np.testing.assert_allclose(fp.loglik, fs.loglik, rtol=3e-5,
                                   atol=1e-5)
        assert np.isfinite(np.asarray(fp.means)).all()
        if not mask.any():
            # no data: zero log-likelihood, moments = prior predictions
            np.testing.assert_allclose(float(fp.loglik), 0.0, atol=1e-6)


def test_lgss_kernel_mesh_sharded_bitwise():
    """LGSSKernel inside a sharded BlockedGibbs sweep: chain-axis
    sharding over the 8-device mesh reproduces the unsharded run to
    float32 ULPs (round-3 verdict item 4). Unlike the discrete HMM path
    (bitwise, see test_hmm.py) the Kalman/FFBS matmul chain compiles to
    differently-fused kernels under the partitioned layout — measured
    ≤6e-8 absolute on O(1) values, pure ULP reassociation, no
    cross-chain reductions involved."""
    from mcmcpp_tpu import BlockedGibbsSampler, ExactGibbsKernel
    from mcmcpp_tpu.parallel.mesh import make_walker_mesh

    rng = np.random.default_rng(5)
    t_n = 12
    ys = np.cumsum(rng.normal(0, 0.3, t_n)).astype(np.float32)
    a0, b0 = 2.0, 1.0

    def params_fn(others):
        return lgss_params(
            A=1.0, b=0.0, Q=0.09, H=1.0, c=0.0,
            R=others["s2r"][0], m0=0.0, P0=4.0,
        )

    def sample_s2r(key, others):
        resid = jnp.asarray(ys) - others["x"]
        b_n = b0 + 0.5 * jnp.sum(resid * resid)
        return (b_n / jax.random.gamma(key, a0 + 0.5 * t_n))[None]

    def build(mesh):
        gb = BlockedGibbsSampler(
            [
                ("x", t_n, LGSSKernel(ys, params_fn)),
                ("s2r", 1, ExactGibbsKernel(sample_s2r)),
            ],
            n_chains=16, seed=0, mesh=mesh,
        )
        gb.init({"x": np.zeros(t_n, np.float32),
                 "s2r": np.ones(1, np.float32)})
        gb.run(10)
        return np.asarray(gb.get_samples())

    a = build(None)
    b = build(make_walker_mesh())
    np.testing.assert_allclose(a, b, rtol=2e-6, atol=2e-6)


# --- time-varying observation model (dynamic regression; round 4) ----------


def _tv_case(seed=21):
    rng = np.random.default_rng(seed)
    Hs = rng.standard_normal((T, E, D)).astype(np.float32)
    cs = rng.standard_normal((T, E)).astype(np.float32) * 0.3
    _, (A, b, Q, _, _, R, m0, P0) = _params()
    p = lgss_params(A, b, Q, Hs, cs, R, m0, P0)
    ys = _ys()
    return p, (A, b, Q, Hs, cs, R, m0, P0), ys


def _tv_dense_obs(mx, cov, Hs, cs, R):
    from scipy.linalg import block_diag

    Hbig = block_diag(*[np.asarray(h, np.float64) for h in Hs])
    my = Hbig @ mx + np.asarray(cs, np.float64).reshape(-1)
    cov_yy = Hbig @ cov @ Hbig.T + np.kron(np.eye(T), R)
    return my, cov_yy, cov @ Hbig.T


def test_tv_parallel_matches_sequential():
    p, _, ys = _tv_case()
    fp = kalman_filter(p, ys, method="parallel")
    fs = kalman_filter(p, ys, method="sequential")
    np.testing.assert_allclose(fp.means, fs.means, rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(fp.covs, fs.covs, rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(fp.loglik, fs.loglik, rtol=2e-5)


def test_tv_loglik_and_smoother_vs_dense_joint():
    p, (A, b, Q, Hs, cs, R, m0, P0), ys = _tv_case()
    # state-chain moments are H-independent: reuse the invariant builder
    mx, cov, _, _, _ = _dense_joint(A, b, Q, np.zeros((E, D)), np.zeros(E),
                                    R, m0, P0)
    my, cov_yy, cov_xy = _tv_dense_obs(mx, cov, Hs, cs, R)
    resid = ys.reshape(-1) - my
    sign, logdet = np.linalg.slogdet(cov_yy)
    ll_dense = -0.5 * (
        T * E * np.log(2 * np.pi) + logdet
        + resid @ np.linalg.solve(cov_yy, resid)
    )
    for method in ("parallel", "sequential"):
        np.testing.assert_allclose(
            float(lgss_loglik(p, ys, method=method)), ll_dense, rtol=2e-4
        )
    # smoothing == conditioning the dense joint on ALL observations
    # (exercises the H-free backward pass over the tv filter)
    mean_post, cov_post = _dense_condition(
        mx, cov, my, cov_yy, cov_xy, ys.reshape(-1)
    )
    ms, Ps = rts_smoother(p, ys)
    np.testing.assert_allclose(ms, mean_post, rtol=3e-3, atol=3e-4)
    for t in range(T):
        np.testing.assert_allclose(
            Ps[t], cov_post[t * D:(t + 1) * D, t * D:(t + 1) * D],
            rtol=3e-3, atol=3e-4,
        )


def test_tv_ffbs_moments():
    """Vmapped FFBS draws under time-varying H match the smoothed
    moments (the exact-conditional contract)."""
    p, _, ys = _tv_case(seed=5)
    ms, Ps = rts_smoother(p, ys)
    keys = jax.random.split(jax.random.key(0), 3000)
    draws = jax.vmap(lambda k: ffbs_sample(k, p, ys))(keys)
    np.testing.assert_allclose(
        np.asarray(draws).mean(axis=0), ms, atol=0.08
    )
    emp_var = np.asarray(draws).var(axis=0)
    np.testing.assert_allclose(
        emp_var, np.asarray(Ps)[:, np.arange(D), np.arange(D)],
        rtol=0.25, atol=0.01,
    )


def test_dynamic_regression_recovers_coefficients():
    """y_t = x_t · β_t + noise with slowly-drifting β (the canonical
    time-varying-H model): the smoothed state tracks the true path."""
    rng = np.random.default_rng(9)
    t_n, k = 150, 2
    X = rng.standard_normal((t_n, k)).astype(np.float32)
    beta = np.cumsum(rng.normal(0, 0.08, (t_n, k)), axis=0) + [1.0, -0.5]
    y = (np.sum(X * beta, axis=1) + 0.3 * rng.standard_normal(t_n)
         ).astype(np.float32)
    p = lgss_params(
        A=np.eye(k), b=np.zeros(k), Q=0.08**2 * np.eye(k),
        H=X[:, None, :], c=0.0, R=np.array([[0.09]]),
        m0=np.zeros(k), P0=4.0 * np.eye(k),
    )
    ms, _ = rts_smoother(p, y[:, None])
    rmse = float(np.sqrt(((np.asarray(ms) - beta) ** 2).mean()))
    assert rmse < 0.25, rmse
    corr = np.corrcoef(np.asarray(ms)[:, 0], beta[:, 0])[0, 1]
    assert corr > 0.8, corr


def test_tv_forecast_via_masked_future_rows():
    """The documented tv forecasting recipe is EXACT: broadcast an
    invariant H to (T+h, E, D), append NaN rows, and the filtered
    moments at the future rows equal forecast() on the invariant model."""
    p, raw = _params()
    ys = _ys()
    h = 3
    A, b, Q, H, c, R, m0, P0 = raw
    Hs = np.broadcast_to(H, (T + h, E, D))
    p_tv = lgss_params(A, b, Q, Hs, c, R, m0, P0)
    ys_ext = np.concatenate([ys, np.full((h, E), np.nan, np.float32)])
    f = kalman_filter(p_tv, ys_ext)
    sm, sP, _, _ = forecast(p, ys, horizon=h)
    np.testing.assert_allclose(f.means[T:], sm, rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(f.covs[T:], sP, rtol=2e-4, atol=2e-5)
    with pytest.raises(ValueError, match="FUTURE steps"):
        forecast(p_tv, ys_ext, horizon=2)


def test_tv_validation():
    _, (A, b, Q, Hs, cs, R, m0, P0), ys = _tv_case()
    p_bad = lgss_params(A, b, Q, Hs[:3], cs[:3], R, m0, P0)
    with pytest.raises(ValueError, match="time-varying H has shape"):
        kalman_filter(p_bad, ys)


# --- fully time-varying dynamics (switching SSMs; round 4) -----------------


def _full_tv_case(seed=33):
    rng = np.random.default_rng(seed)
    As = np.stack([
        0.8 * _rot(rng.uniform(-0.4, 0.4)) for _ in range(T)
    ]).astype(np.float32)
    bs = rng.standard_normal((T, D)).astype(np.float32) * 0.2
    Qs = np.stack([
        (lambda q: q @ q.T + 0.05 * np.eye(D))(
            rng.standard_normal((D, D)) * 0.25
        ) for _ in range(T)
    ]).astype(np.float32)
    Hs = rng.standard_normal((T, E, D)).astype(np.float32)
    cs = rng.standard_normal((T, E)).astype(np.float32) * 0.3
    Rs = np.stack([
        np.array([[0.2 + rng.uniform(0, 0.5)]]) for _ in range(T)
    ]).astype(np.float32)
    m0 = np.array([0.5, -0.5])
    P0 = np.array([[0.8, 0.1], [0.1, 0.6]])
    p = lgss_params(As, bs, Qs, Hs, cs, Rs, m0, P0)
    return p, (As, bs, Qs, Hs, cs, Rs, m0, P0), _ys()


def _rot(theta):
    c, s = np.cos(theta), np.sin(theta)
    return np.array([[c, -s], [s, c]])


def _dense_joint_full_tv(As, bs, Qs, Hs, cs, Rs, m0, P0, initial="state"):
    """float64 joint with per-step matrices (A_t transitions INTO t)."""
    from scipy.linalg import block_diag

    mx = np.zeros((T, D))
    cov = np.zeros((T * D, T * D))
    if initial == "state":
        mx[0] = m0
        cov[:D, :D] = P0
    else:
        mx[0] = As[0] @ m0 + bs[0]
        cov[:D, :D] = As[0] @ P0 @ As[0].T + Qs[0]
    for t in range(1, T):
        a = np.asarray(As[t], np.float64)
        mx[t] = a @ mx[t - 1] + bs[t]
        for s in range(t):
            blk = a @ cov[(t - 1) * D:t * D, s * D:(s + 1) * D]
            cov[t * D:(t + 1) * D, s * D:(s + 1) * D] = blk
            cov[s * D:(s + 1) * D, t * D:(t + 1) * D] = blk.T
        cov[t * D:(t + 1) * D, t * D:(t + 1) * D] = (
            a @ cov[(t - 1) * D:t * D, (t - 1) * D:t * D] @ a.T + Qs[t]
        )
    Hbig = block_diag(*[np.asarray(h, np.float64) for h in Hs])
    my = Hbig @ mx.reshape(-1) + np.asarray(cs, np.float64).reshape(-1)
    cov_yy = Hbig @ cov @ Hbig.T + block_diag(
        *[np.asarray(r, np.float64) for r in Rs]
    )
    return mx.reshape(-1), cov, my, cov_yy, cov @ Hbig.T


@pytest.mark.parametrize("initial", ["state", "prior"])
def test_full_tv_filter_loglik_smoother_vs_dense(initial):
    p, raw, ys = _full_tv_case()
    fp = kalman_filter(p, ys, method="parallel", initial=initial)
    fs = kalman_filter(p, ys, method="sequential", initial=initial)
    np.testing.assert_allclose(fp.means, fs.means, rtol=3e-4, atol=3e-5)
    np.testing.assert_allclose(fp.loglik, fs.loglik, rtol=2e-5)
    mx, cov, my, cov_yy, cov_xy = _dense_joint_full_tv(*raw,
                                                       initial=initial)
    resid = ys.reshape(-1) - my
    _, logdet = np.linalg.slogdet(cov_yy)
    ll_dense = -0.5 * (
        T * E * np.log(2 * np.pi) + logdet
        + resid @ np.linalg.solve(cov_yy, resid)
    )
    np.testing.assert_allclose(float(fp.loglik), ll_dense, rtol=2e-4)
    mean_post, cov_post = _dense_condition(
        mx, cov, my, cov_yy, cov_xy, ys.reshape(-1)
    )
    ms, Ps = rts_smoother(p, ys, initial=initial)
    np.testing.assert_allclose(ms, mean_post, rtol=4e-3, atol=4e-4)
    for t in range(T):
        np.testing.assert_allclose(
            Ps[t], cov_post[t * D:(t + 1) * D, t * D:(t + 1) * D],
            rtol=4e-3, atol=4e-4,
        )


def test_full_tv_ffbs_moments():
    p, _, ys = _full_tv_case(seed=4)
    ms, Ps = rts_smoother(p, ys)
    keys = jax.random.split(jax.random.key(2), 3000)
    draws = np.asarray(jax.vmap(lambda k: ffbs_sample(k, p, ys))(keys))
    np.testing.assert_allclose(draws.mean(axis=0), ms, atol=0.08)


def test_switching_ssm_gibbs_recovers_regimes():
    """Flagship composition: switching linear dynamics as BlockedGibbs of
    an HMMKernel regime path + an LGSSKernel whose per-step A_t/Q_t are
    built FROM the sampled path (time-varying-params bridge). The
    sticky 2-regime AR(1) truth must be decoded from noisy observations.
    """
    from mcmcpp_tpu import BlockedGibbsSampler
    from mcmcpp_tpu.models.hmm import HMMKernel

    rng = np.random.default_rng(17)
    t_n = 120
    a_reg = np.array([0.98, 0.45])     # persistent vs mean-reverting
    q_reg = np.array([0.05**2, 0.4**2])
    gam = np.array([[0.97, 0.03], [0.05, 0.95]])
    z = np.zeros(t_n, int)
    x = np.zeros(t_n)
    for t in range(1, t_n):
        z[t] = rng.choice(2, p=gam[z[t - 1]])
        x[t] = a_reg[z[t]] * x[t - 1] + np.sqrt(q_reg[z[t]]) * rng.normal()
    ys = (x + 0.15 * rng.standard_normal(t_n)).astype(np.float32)

    a_j = jnp.asarray(a_reg, jnp.float32)
    q_j = jnp.asarray(q_reg, jnp.float32)

    def params_fn(others):
        zi = others["z"].astype(jnp.int32)
        return lgss_params(
            A=a_j[zi][:, None, None], b=jnp.zeros((t_n, 1)),
            Q=q_j[zi][:, None, None],
            H=jnp.ones((1, 1)), c=0.0, R=np.array([[0.15**2]]),
            m0=np.zeros(1), P0=np.array([[1.0]]),
        )

    def log_obs_fn(others):
        # z_t's emission: p(x_t | x_{t-1}, z_t) under each regime
        xs = others["x"]
        prev = jnp.concatenate([jnp.zeros(1), xs[:-1]])
        resid = xs[:, None] - a_j[None, :] * prev[:, None]  # (T, K)
        return (-0.5 * resid * resid / q_j[None, :]
                - 0.5 * jnp.log(2 * jnp.pi * q_j)[None, :])

    gb = BlockedGibbsSampler(
        [
            ("x", t_n, LGSSKernel(ys, params_fn)),
            ("z", t_n, HMMKernel(
                log_obs_fn, np.log(np.array([0.5, 0.5], np.float32)),
                jnp.asarray(np.log(gam), jnp.float32))),
        ],
        n_chains=8, seed=0,
    )
    gb.init({"x": np.zeros(t_n, np.float32),
             "z": np.zeros(t_n, np.float32)})
    gb.run(150)
    z_draws = np.asarray(gb.get_block("z"))[50:]
    z_hat = (z_draws.mean((0, 1)) > 0.5).astype(int)
    acc = (z_hat == z).mean()
    assert acc > 0.8, acc
    x_draws = np.asarray(gb.get_block("x"))[50:]
    rmse = float(np.sqrt(((x_draws.mean((0, 1)) - x) ** 2).mean()))
    assert rmse < 0.15, rmse
