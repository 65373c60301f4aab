"""SMC² oracles (Chopin, Jacob & Papaspiliopoulos 2013).

Strategy (SURVEY.md §4 pattern): the local-level linear-Gaussian SSM
gives EXACT truths through the Kalman machinery — the θ-posterior and
the evidence are grid integrations of the exact collapsed likelihood,
and the marginal filtered state is exact via the filter. Plus the
internal-exactness properties the algorithm guarantees by construction:
the prequential trace sums to the running evidence, and absorbing a
stream in many update() calls equals absorbing it in one. Fixed seeds,
generous MC tolerances.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mcmcpp_tpu import SMC2Sampler, StateSpaceModel
from mcmcpp_tpu.models.lgss import kalman_filter, lgss_loglik, lgss_params

SIG_Q, SIG_R, M0, P0 = 0.35, 0.6, 1.0, 2.0


def _ssm(sig_r=None):
    """theta = (log sig_r,) if sig_r is None else fixed known noise."""

    def init_sample(key, n, theta):
        return M0 + jnp.sqrt(P0) * jax.random.normal(key, (n, 1))

    def trans_sample(key, x, t, theta):
        return x + SIG_Q * jax.random.normal(key, x.shape)

    def obs_logpdf(y, x, t, theta):
        s = jnp.exp(theta[0]) if sig_r is None else sig_r
        z = (y[0] - x[:, 0]) / s
        return -0.5 * z * z - jnp.log(s) - 0.5 * np.log(2 * np.pi)

    return StateSpaceModel(init_sample, trans_sample, obs_logpdf)


def _data(t_n, seed=0):
    rng = np.random.default_rng(seed)
    x = np.empty(t_n)
    x[0] = M0 + np.sqrt(P0) * rng.standard_normal()
    for t in range(1, t_n):
        x[t] = x[t - 1] + SIG_Q * rng.standard_normal()
    ys = x + SIG_R * rng.standard_normal(t_n)
    return x, ys.astype(np.float32)


def _lgss(sig_r=SIG_R):
    return lgss_params(A=1.0, b=0.0, Q=SIG_Q**2, H=1.0, c=0.0,
                       R=sig_r**2, m0=M0, P0=P0)


def _prior_sample(key, n):
    return jax.random.normal(key, (n, 1))


def _log_prior(th):
    return -0.5 * th[0] * th[0] - 0.5 * np.log(2 * np.pi)


def _grid_truth(ys):
    """Exact grid posterior over theta = log sig_r + exact log-evidence
    under the standard-normal prior (Kalman collapsed likelihood)."""
    grid = np.linspace(-2.5, 1.5, 401)

    def exact_ll(th):
        return lgss_loglik(_lgss(sig_r=np.exp(th)), ys)

    ll = np.array([float(exact_ll(float(g))) for g in grid], np.float64)
    logpost = ll + np.array([_log_prior(np.array([g])) for g in grid])
    dg = grid[1] - grid[0]
    from scipy.special import logsumexp

    logz = logsumexp(logpost) + np.log(dg)
    w = np.exp(logpost - logpost.max())
    w /= w.sum()
    mean = float(w @ grid)
    sd = float(np.sqrt(w @ (grid - mean) ** 2))
    return mean, sd, float(logz)


def _sampler(ys=None, seed=0, m=512, nx=64, **kw):
    s = SMC2Sampler(
        _ssm(sig_r=None), _log_prior, _prior_sample,
        n_theta=m, n_params=1, n_particles=nx, seed=seed, **kw,
    )
    if ys is not None:
        s.update(ys)
    return s


def test_smc2_matches_exact_grid_posterior_and_evidence():
    _, ys = _data(40, seed=11)
    mean_true, sd_true, logz_true = _grid_truth(ys)
    s = _sampler(ys, seed=3)
    mean, cov = s.moments()
    # SMC resampling-noise tolerance: a few posterior SDs over sqrt(M_eff)
    assert abs(mean[0] - mean_true) < 6.0 * sd_true / np.sqrt(64.0) + 0.05, (
        mean[0], mean_true,
    )
    assert 0.6 * sd_true < np.sqrt(cov[0, 0]) < 1.6 * sd_true, (
        np.sqrt(cov[0, 0]), sd_true,
    )
    assert abs(s.log_evidence - logz_true) < 1.0, (
        s.log_evidence, logz_true,
    )
    assert s.n_resamples > 0  # rejuvenation actually exercised


def test_prequential_trace_sums_to_evidence():
    _, ys = _data(25, seed=2)
    s = _sampler(ys, seed=1, m=256, nx=32)
    assert len(s.log_evidence_trace) == 25
    assert s.log_evidence == pytest.approx(
        float(np.sum(s.log_evidence_trace)), abs=1e-4
    )


def test_online_equals_batch():
    """Absorbing the stream in several update() calls must equal one
    batch call: the per-row key sequence and every per-row program input
    are grouping-independent (the capacity padding is masked out)."""
    _, ys = _data(24, seed=7)
    a = _sampler(ys, seed=9, m=128, nx=32)
    b = _sampler(None, seed=9, m=128, nx=32)
    for i in range(0, 24, 5):
        b.update(ys[i:i + 5])
    np.testing.assert_allclose(
        np.asarray(a.state.theta), np.asarray(b.state.theta), rtol=2e-6,
        atol=1e-6,
    )
    assert a.log_evidence == pytest.approx(b.log_evidence, abs=1e-4)
    # lengths 5,10,15,20,24 -> capacities {8, 16, 32}: O(log T) programs
    assert len(b._stage_cache) <= 3, sorted(b._stage_cache)


def test_state_estimate_tracks_kalman():
    """Known-parameter model (theta unused): the doubly-weighted state
    estimate must track the exact Kalman filtered mean at final time."""
    _, ys = _data(30, seed=5)

    def prior(key, n):  # tight pseudo-prior; theta plays no role
        return jnp.zeros((n, 1)) + 0.01 * jax.random.normal(key, (n, 1))

    s = SMC2Sampler(
        _ssm(sig_r=SIG_R), lambda th: jnp.zeros(()), prior,
        n_theta=64, n_params=1, n_particles=256, seed=0,
    )
    s.update(ys)
    f = kalman_filter(_lgss(), ys)
    m_true = float(np.asarray(f.means)[-1, 0])
    sd_true = float(np.sqrt(np.asarray(f.covs)[-1, 0, 0]))
    est = s.state_estimate()
    assert abs(est[0] - m_true) < 6.0 * sd_true / np.sqrt(256.0) + 0.05, (
        est[0], m_true,
    )


def test_posterior_tightens_with_data():
    _, ys = _data(60, seed=13)
    s = _sampler(None, seed=2, m=256, nx=32)
    s.update(ys[:10])
    _, cov_early = s.moments()
    s.update(ys[10:])
    _, cov_late = s.moments()
    assert cov_late[0, 0] < cov_early[0, 0]


def test_mesh_sharded_parity():
    """θ-axis sharding over the 8-device mesh must not change results
    (same keys, same arithmetic — the engine-wide determinism contract)."""
    from mcmcpp_tpu.parallel.mesh import make_walker_mesh

    _, ys = _data(16, seed=21)

    def build(mesh):
        s = _sampler(None, seed=4, m=64, nx=16, mesh=mesh)
        s.update(ys)
        return np.asarray(s.state.theta), s.log_evidence

    a_th, a_z = build(None)
    b_th, b_z = build(make_walker_mesh())
    np.testing.assert_allclose(a_th, b_th, rtol=2e-6, atol=1e-6)
    assert a_z == pytest.approx(b_z, abs=1e-4)


def test_checkpoint_resume_continues_identically(tmp_path):
    """Save mid-stream, restore into a FRESH sampler, absorb the rest of
    the stream on both — state, evidence, and trace must agree (the
    rejuvenation buffer travels with the checkpoint)."""
    from mcmcpp_tpu.io.checkpoint import load_checkpoint, save_checkpoint

    _, ys = _data(30, seed=31)
    a = _sampler(None, seed=6, m=128, nx=32)
    a.update(ys[:14])
    ck = save_checkpoint(a, tmp_path / "smc2.npz")
    b = _sampler(None, seed=999, m=128, nx=32)  # seed overwritten by load
    load_checkpoint(b, ck)
    a.update(ys[14:])
    b.update(ys[14:])
    np.testing.assert_allclose(
        np.asarray(a.state.theta), np.asarray(b.state.theta),
        rtol=2e-6, atol=1e-6,
    )
    assert a.log_evidence == pytest.approx(b.log_evidence, abs=1e-4)
    assert a.log_evidence_trace == pytest.approx(b.log_evidence_trace)

    with pytest.raises(ValueError, match="count mismatch"):
        load_checkpoint(_sampler(None, m=64, nx=32), ck)


def test_validation_errors():
    with pytest.raises(ValueError, match="prior_sample"):
        SMC2Sampler(
            _ssm(sig_r=None), _log_prior,
            lambda k, n: jax.random.normal(k, (n, 2)),
            n_theta=16, n_params=1, n_particles=8,
        ).init()
    with pytest.raises(RuntimeError, match="update"):
        _sampler(None).log_evidence
    from mcmcpp_tpu.parallel.mesh import make_walker_mesh

    with pytest.raises(ValueError, match="divisible"):
        SMC2Sampler(
            _ssm(sig_r=None), _log_prior, _prior_sample,
            n_theta=13, n_params=1, n_particles=8,
            mesh=make_walker_mesh(),
        )


def test_smc2_arviz_export_shapes():
    from mcmcpp_tpu import smc2_to_inference_dict

    _, ys = _data(12, seed=1)
    s = _sampler(ys, seed=0, m=64, nx=16)
    d = smc2_to_inference_dict(s, n_draws=100)
    assert d["posterior"]["theta"].shape == (1, 100, 1)
    assert d["sample_stats"]["log_evidence"].shape == (1, 100)
    assert np.isfinite(d["sample_stats"]["prequential_logp"][0, :12]).all()
    assert d["sample_stats"]["filtered_state_0"].shape == (1, 100)
    with pytest.raises(TypeError, match="SMC2Sampler"):
        smc2_to_inference_dict(object())


def test_checkpoint_before_update_raises(tmp_path):
    """init() sets state but no observation buffer; saving then would
    write a pickled object array the loader rejects (round-4 review) —
    must raise the actionable error instead."""
    from mcmcpp_tpu.io.checkpoint import save_checkpoint

    s = _sampler(None, m=32, nx=8)
    s.init()
    with pytest.raises(RuntimeError, match="before update"):
        save_checkpoint(s, tmp_path / "early.npz")


def test_particle_growth_exchange_step(tmp_path):
    """grow_particles: starting from a hopelessly small Nx=2, low
    rejuvenation acceptance must trigger the Chopin §3.5 exchange step
    (fresh filters at 2Nx + importance-corrected θ-weights) until
    acceptance recovers or the cap binds — and the posterior must stay
    consistent with the exact grid truth."""
    from mcmcpp_tpu.io.checkpoint import load_checkpoint, save_checkpoint

    _, ys = _data(40, seed=11)
    mean_true, sd_true, _ = _grid_truth(ys)
    s = _sampler(None, seed=5, m=256, nx=2, grow_particles=True,
                 grow_threshold=0.4, max_particles=64)
    s.update(ys)
    assert s.n_growths >= 1, s.last_rejuvenation_accept
    assert s.n_x == 2 * 2 ** s.n_growths and s.n_x <= 64
    assert np.asarray(s.state.xs).shape[1] == s.n_x
    assert np.isfinite(s.log_evidence)
    mean, _ = s.moments()
    assert abs(mean[0] - mean_true) < 8.0 * sd_true / np.sqrt(32.0) + 0.1

    # grown n_x survives checkpoint/resume (adopted, not validated)
    ck = save_checkpoint(s, tmp_path / "grown.npz")
    b = _sampler(None, seed=1, m=256, nx=2, grow_particles=True,
                 grow_threshold=0.4, max_particles=64)
    load_checkpoint(b, ck)
    assert b.n_x == s.n_x and b.n_growths == s.n_growths
    b.update(_data(50, seed=12)[1][:5])  # stream continues at grown size
    assert np.isfinite(b.log_evidence)


def test_no_growth_when_disabled():
    _, ys = _data(30, seed=11)
    s = _sampler(None, seed=5, m=128, nx=4)
    s.update(ys)
    assert s.n_growths == 0 and s.n_x == 4


def test_degenerate_cloud_guard_keeps_rejuvenation_alive():
    """A collapsed θ-cloud (here: a deterministic prior_sample, so ALL
    particles identical) would make the proposal covariance ~zero and
    rejuvenation a permanent no-op; the floor must let the cloud
    re-spread through the PMMH moves."""
    _, ys = _data(20, seed=3)
    s = SMC2Sampler(
        _ssm(sig_r=None), _log_prior,
        lambda key, n: jnp.zeros((n, 1)),   # degenerate prior draws
        n_theta=64, n_params=1, n_particles=32, seed=0,
        target_ess=1.0, n_mcmc=5,           # rejuvenate every step
    )
    s.update(ys)
    spread = float(np.std(np.asarray(s.state.theta)))
    assert spread > 1e-3, spread


def test_pf_loglik_gradient_matches_kalman_score():
    """The PF evidence estimate is differentiable in theta (gradients
    flow through the weights; resampling indices are int-valued and
    contribute none): on the linear-Gaussian model, grad of the PF
    loglik at the truth must approximate the EXACT Kalman score
    d/d(log sig_r) lgss_loglik. Certifies the differentiable-PF path
    for gradient-based SSM fitting."""
    from mcmcpp_tpu import particle_filter

    _, ys = _data(30, seed=5)

    def exact(th):
        return lgss_loglik(lgss_params(
            A=1.0, b=0.0, Q=SIG_Q**2, H=1.0, c=0.0,
            R=jnp.exp(2.0 * th), m0=M0, P0=P0,
        ), ys)

    score_true = float(jax.grad(exact)(jnp.float32(np.log(SIG_R))))

    def pf_ll(th, key):
        return particle_filter(
            key, _ssm(sig_r=None), jnp.asarray([th]), ys, 512,
        ).loglik

    g = jax.vmap(
        jax.grad(pf_ll), in_axes=(None, 0)
    )(jnp.float32(np.log(SIG_R)), jax.random.split(jax.random.key(2), 32))
    g = np.asarray(g, np.float64)
    assert np.isfinite(g).all()
    se = g.std(ddof=1) / np.sqrt(32.0)
    assert abs(g.mean() - score_true) < max(6.0 * se, 0.15 * abs(
        score_true
    ) + 0.3), (g.mean(), score_true, se)


def test_chunked_launch_equals_per_row_bitwise():
    """The fused chunk program replays the host loop's key-split chain
    exactly, so chunked and per-row execution must agree BITWISE (the
    determinism contract that lets max_chunk_steps be a pure perf
    knob)."""
    _, ys = _data(70, seed=17)
    a = _sampler(None, seed=8, m=64, nx=16, max_chunk_steps=32)
    b = _sampler(None, seed=8, m=64, nx=16, max_chunk_steps=None)
    a.update(ys)
    b.update(ys)
    np.testing.assert_array_equal(
        np.asarray(a.state.theta), np.asarray(b.state.theta)
    )
    assert a.n_resamples == b.n_resamples
    assert a.log_evidence_trace == pytest.approx(b.log_evidence_trace,
                                                 abs=1e-6)
    # 70 rows at chunk=32: 2 fused launches + 6 per-row stages
    assert len(a.log_evidence_trace) == 70
