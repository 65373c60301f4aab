"""IBIS (data-tempered SMC): conjugate Normal-Normal oracles.

θ ~ N(0, τ²), y_i | θ ~ N(θ, σ²): every partial posterior and the full
marginal likelihood are closed-form, so the online trajectory, the
prequential evidence decomposition, and the final posterior all have
exact truths (SURVEY.md §4 oracle pattern; fixed seeds, MC tolerances).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from scipy.stats import norm

from mcmcpp_tpu import IBISSampler

TAU, SIG = 2.0, 1.0
N_DATA = 60


def _data(seed=0, n=N_DATA, theta=0.8):
    rng = np.random.default_rng(seed)
    return (theta + SIG * rng.standard_normal(n)).astype(np.float32)


def _posterior_moments(ys):
    prec = 1.0 / TAU**2 + len(ys) / SIG**2
    mean = (np.sum(ys) / SIG**2) / prec
    return mean, 1.0 / prec


def _log_marginal(ys):
    """log N(y; 0, σ²I + τ²11ᵀ) via the matrix-determinant lemma."""
    n = len(ys)
    s = float(np.sum(ys))
    ss = float(np.sum(np.asarray(ys, np.float64) ** 2))
    # Σ = σ²I + τ²J: |Σ| = σ^{2n}(1 + nτ²/σ²); Σ⁻¹ = I/σ² − (τ²/σ⁴)J/(1+nτ²/σ²)
    c = 1.0 + n * TAU**2 / SIG**2
    quad = ss / SIG**2 - (TAU**2 / SIG**4) * s**2 / c
    return -0.5 * (n * np.log(2 * np.pi) + n * np.log(SIG**2)
                   + np.log(c) + quad)


def _sampler(seed=0, **kw):
    kw.setdefault("n_particles", 2048)
    kw.setdefault("batch_size", 4)
    return IBISSampler(
        log_prior_fn=lambda t: -0.5 * t[0] ** 2 / TAU**2,
        loglike_point_fn=lambda t, y: -0.5 * (y - t[0]) ** 2 / SIG**2
        - 0.5 * np.log(2 * np.pi * SIG**2),
        prior_sample_fn=lambda key, n: TAU * jax.random.normal(key, (n, 1)),
        n_params=1, seed=seed, **kw,
    )


def test_online_posterior_and_evidence():
    ys = _data()
    s = _sampler()
    # absorb the first half, snapshot, absorb the rest — ONLINE property
    s.update(ys[:30])
    m_half, v_half = s.moments()
    mean_t, var_t = _posterior_moments(ys[:30])
    assert m_half[0] == pytest.approx(mean_t, abs=0.05)
    assert v_half[0, 0] == pytest.approx(var_t, rel=0.2)
    lz_half = s.log_evidence
    assert lz_half == pytest.approx(_log_marginal(ys[:30]), abs=0.1)

    s.update(ys[30:])
    m, v = s.moments()
    mean_t, var_t = _posterior_moments(ys)
    assert m[0] == pytest.approx(mean_t, abs=0.04)
    assert v[0, 0] == pytest.approx(var_t, rel=0.2)
    assert s.log_evidence == pytest.approx(_log_marginal(ys), abs=0.15)
    assert s.n_resamples >= 1  # the ESS trigger fired along the way
    draws = s.posterior(4000, seed=1)
    assert draws.shape == (4000, 1)
    assert draws.mean() == pytest.approx(mean_t, abs=0.05)


def test_prequential_decomposition():
    """Σ stage increments == total log evidence, and each increment
    matches the analytic one-step-ahead predictive log p(y_t | y_{<t})."""
    ys = _data(seed=3, n=24)
    s = _sampler(seed=1, batch_size=1)
    s.update(ys)
    assert len(s.log_evidence_trace) == 24
    assert sum(s.log_evidence_trace) == pytest.approx(
        s.log_evidence, abs=1e-3
    )
    for t in (0, 5, 15, 23):
        if t == 0:
            pred_mean, pred_var = 0.0, TAU**2 + SIG**2
        else:
            m, v = _posterior_moments(ys[:t])
            pred_mean, pred_var = m, v + SIG**2
        truth = norm.logpdf(ys[t], pred_mean, np.sqrt(pred_var))
        assert s.log_evidence_trace[t] == pytest.approx(truth, abs=0.1), t


def test_agreement_with_tempered_smc():
    from mcmcpp_tpu import SMCSampler

    ys = _data(seed=5)
    yj = jnp.asarray(ys)

    smc = SMCSampler(
        log_prior_fn=lambda t: -0.5 * t[0] ** 2 / TAU**2
        - 0.5 * np.log(2 * np.pi * TAU**2),
        log_like_fn=lambda t: jnp.sum(
            -0.5 * (yj - t[0]) ** 2 / SIG**2
            - 0.5 * np.log(2 * np.pi * SIG**2)
        ),
        prior_sample_fn=lambda key, n: TAU * jax.random.normal(key, (n, 1)),
        n_particles=2048, n_params=1, n_mcmc=5, seed=0,
    )
    smc.run()
    s = _sampler(seed=2)
    s.update(ys)
    # two independent evidence engines, one analytic answer
    truth = _log_marginal(ys)
    assert smc.log_evidence == pytest.approx(truth, abs=0.2)
    assert s.log_evidence == pytest.approx(truth, abs=0.15)


def test_mesh_sharded_runs():
    from mcmcpp_tpu.parallel.mesh import make_walker_mesh

    ys = _data(seed=7, n=20)
    s = _sampler(seed=3, n_particles=1024, mesh=make_walker_mesh())
    s.update(ys)
    assert s.log_evidence == pytest.approx(_log_marginal(ys), abs=0.2)
    assert s.state.particles.shape == (1024, 1)


def test_multidim_regression():
    """2-d Bayesian linear regression absorbed online: coefficients
    recovered against the conjugate posterior mean."""
    rng = np.random.default_rng(11)
    n = 80
    X = rng.standard_normal((n, 2)).astype(np.float32)
    beta_true = np.array([1.0, -0.5])
    y = (X @ beta_true + 0.5 * rng.standard_normal(n)).astype(np.float32)
    sig2, tau2 = 0.25, 4.0
    # conjugate: post cov = (XᵀX/σ² + I/τ²)⁻¹
    prec = X.T @ X / sig2 + np.eye(2) / tau2
    post_mean = np.linalg.solve(prec, X.T @ y / sig2)

    s = IBISSampler(
        log_prior_fn=lambda t: -0.5 * jnp.sum(t * t) / tau2,
        loglike_point_fn=lambda t, row: -0.5 * (
            row["y"] - jnp.dot(row["x"], t)
        ) ** 2 / sig2,
        prior_sample_fn=lambda key, m: np.sqrt(tau2)
        * jax.random.normal(key, (m, 2)),
        n_particles=2048, n_params=2, batch_size=8, seed=4,
    )
    s.update({"x": X, "y": y})
    m, v = s.moments()
    np.testing.assert_allclose(m, post_mean, atol=0.05)
    np.testing.assert_allclose(
        v, np.linalg.inv(prec), rtol=0.35, atol=5e-4
    )


def test_validation():
    s = _sampler()
    with pytest.raises(RuntimeError, match="update"):
        _ = s.log_evidence
    with pytest.raises(RuntimeError, match="update"):
        s.moments()
    with pytest.raises(ValueError, match="batch_size"):
        _sampler(batch_size=0)
    bad = IBISSampler(
        log_prior_fn=lambda t: 0.0,
        loglike_point_fn=lambda t, y: 0.0,
        prior_sample_fn=lambda key, n: jnp.zeros((n, 3)),
        n_particles=64, n_params=2,
    )
    with pytest.raises(ValueError, match="prior_sample"):
        bad.update(np.zeros(4, np.float32))


def test_checkpoint_resume_bitwise(tmp_path):
    """Mid-stream save -> fresh-sampler load -> absorb the rest ==
    the uninterrupted run, bit for bit (the engine-family contract)."""
    from mcmcpp_tpu.io.checkpoint import load_checkpoint, save_checkpoint

    ys = _data(seed=9, n=40)
    a = _sampler(seed=0, n_particles=512)
    a.update(ys[:20])
    ck = save_checkpoint(a, tmp_path / "ib.npz")
    a.update(ys[20:])

    b = _sampler(seed=7, n_particles=512)
    load_checkpoint(b, ck)
    b.update(ys[20:])

    np.testing.assert_array_equal(
        np.asarray(a.state.particles), np.asarray(b.state.particles)
    )
    np.testing.assert_array_equal(
        np.asarray(a.state.log_w), np.asarray(b.state.log_w)
    )
    assert a.log_evidence == b.log_evidence
    assert a.log_evidence_trace == b.log_evidence_trace
    assert a.n_resamples == b.n_resamples

    wrong = _sampler(seed=0, n_particles=256)
    with pytest.raises(ValueError, match="particle count"):
        load_checkpoint(wrong, ck)


def test_checkpoint_dict_data_roundtrip(tmp_path):
    from mcmcpp_tpu.io.checkpoint import load_checkpoint, save_checkpoint

    rng = np.random.default_rng(2)
    X = rng.standard_normal((20, 2)).astype(np.float32)
    y = (X @ np.array([1.0, -0.5]) + 0.1 * rng.standard_normal(20)
         ).astype(np.float32)

    def build(seed):
        return IBISSampler(
            log_prior_fn=lambda t: -0.5 * jnp.sum(t * t),
            loglike_point_fn=lambda t, row: -0.5 * (
                row["y"] - jnp.dot(row["x"], t)
            ) ** 2 / 0.25,
            prior_sample_fn=lambda key, m: jax.random.normal(key, (m, 2)),
            n_particles=256, n_params=2, batch_size=4, seed=seed,
        )

    a = build(0)
    a.update({"x": X[:12], "y": y[:12]})
    ck = save_checkpoint(a, tmp_path / "ib2.npz")
    a.update({"x": X[12:], "y": y[12:]})
    b = build(5)
    load_checkpoint(b, ck)
    b.update({"x": X[12:], "y": y[12:]})
    np.testing.assert_array_equal(
        np.asarray(a.state.particles), np.asarray(b.state.particles)
    )
    assert a.log_evidence == b.log_evidence


def test_stream_compiles_o_log_t_programs():
    """Many small updates must trace per CAPACITY (power-of-two padded
    buffer), not per buffer length — the online use case would otherwise
    accumulate one executable per chunk (round-4 review)."""
    ys = _data(seed=13, n=60)
    s = _sampler(seed=5, n_particles=256, batch_size=3)
    for i in range(0, 60, 6):
        s.update(ys[i:i + 6])
    # lengths 6,12,...,60 -> capacities {8,16,32,64}: at most 4 programs
    assert len(s._stage_cache) <= 4, sorted(s._stage_cache)
    assert s.log_evidence == pytest.approx(_log_marginal(ys), abs=0.2)


def test_chunked_launch_equals_per_stage_bitwise():
    """The fused chunk program replays the host key chain exactly, so
    chunked and per-stage execution must agree bitwise (pure perf
    knob — the SMC2 chunking contract)."""
    ys = _data(seed=21, n=70)
    a = _sampler(seed=4, n_particles=128, batch_size=1)
    b = _sampler(seed=4, n_particles=128, batch_size=1,
                 max_chunk_steps=None)
    a.update(ys)
    b.update(ys)
    np.testing.assert_array_equal(
        np.asarray(a.state.particles), np.asarray(b.state.particles)
    )
    assert a.n_resamples == b.n_resamples
    assert a.log_evidence_trace == pytest.approx(b.log_evidence_trace,
                                                 abs=1e-6)
    assert len(a.log_evidence_trace) == 70
