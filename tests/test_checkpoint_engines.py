"""Checkpoint/resume bitwise tests for the round-3 engine additions:
PMMH, BlockedGibbsSampler, EllipticalSliceSampler (resume == the
uninterrupted run, bit for bit — same contract as every other engine in
tests/test_io.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mcmcpp_tpu import (
    BlockedGibbsSampler,
    EllipticalSliceSampler,
    ExactGibbsKernel,
    PMMHSampler,
    RWMKernel,
    StateSpaceModel,
)
from mcmcpp_tpu.io.checkpoint import load_checkpoint, save_checkpoint


def _ssm():
    return StateSpaceModel(
        init_sample=lambda key, n, th: jax.random.normal(key, (n, 1)),
        trans_sample=lambda key, x, t, th: 0.9 * x
        + 0.3 * jax.random.normal(key, x.shape),
        obs_logpdf=lambda y, x, t, th: -0.5 * jnp.square(
            (y[0] - x[:, 0]) / jnp.exp(th[0])
        ) - th[0],
    )


def _pmmh(seed=0):
    rng = np.random.default_rng(1)
    ys = rng.standard_normal(20).astype(np.float32)
    return PMMHSampler(
        _ssm(), ys, log_prior=lambda th: -0.5 * th[0] ** 2, n_params=1,
        n_particles=32, proposal_scale=0.4, n_chains=8, seed=seed,
    )


def test_checkpoint_resume_pmmh_bitwise(tmp_path):
    a = _pmmh()
    a.init(np.zeros((8, 1), np.float32))
    a.run(15)
    ckpt = save_checkpoint(a, tmp_path / "pm.npz")
    a.run(15)

    b = _pmmh(seed=7)  # different seed/state; all overwritten by load
    b.init(np.full((8, 1), 0.5, np.float32))
    load_checkpoint(b, ckpt)
    b.run(15)

    np.testing.assert_array_equal(a.get_samples(), b.get_samples())
    np.testing.assert_array_equal(
        np.asarray(a.state.position), np.asarray(b.state.position)
    )
    np.testing.assert_array_equal(a.acceptance_fraction,
                                  b.acceptance_fraction)


def _gibbs(seed=0):
    def logp(x, others):
        return -0.5 * jnp.sum(x * x)

    def samp(key, others):
        return jax.random.normal(key, (2,)) + others["a"][:2]

    return BlockedGibbsSampler(
        [
            ("a", 3, RWMKernel(logp, scale=0.5)),
            ("b", 2, ExactGibbsKernel(samp)),
        ],
        n_chains=8, seed=seed,
    )


def test_checkpoint_resume_gibbs_bitwise(tmp_path):
    a = _gibbs()
    a.init({"a": np.zeros(3, np.float32), "b": np.zeros(2, np.float32)})
    a.run(20)
    ckpt = save_checkpoint(a, tmp_path / "gb.npz")
    a.run(20)

    b = _gibbs(seed=5)
    b.init({"a": np.ones(3, np.float32), "b": np.ones(2, np.float32)})
    load_checkpoint(b, ckpt)
    b.run(20)

    np.testing.assert_array_equal(
        np.asarray(a.get_block("a")), np.asarray(b.get_block("a"))
    )
    np.testing.assert_array_equal(
        np.asarray(a.get_block("b")), np.asarray(b.get_block("b"))
    )


def test_checkpoint_gibbs_layout_mismatch_rejected(tmp_path):
    a = _gibbs()
    a.init({"a": np.zeros(3, np.float32), "b": np.zeros(2, np.float32)})
    a.run(2)
    ckpt = save_checkpoint(a, tmp_path / "gb.npz")

    def logp(x, others):
        return -0.5 * jnp.sum(x * x)

    c = BlockedGibbsSampler(
        [("a", 5, RWMKernel(logp, scale=0.5))], n_chains=8, seed=0
    )
    c.init({"a": np.zeros(5, np.float32)})
    with pytest.raises(ValueError, match="layout|n_params"):
        load_checkpoint(c, ckpt)


def _ess(seed=0):
    return EllipticalSliceSampler(
        lambda f: -0.5 * jnp.sum((f - 1.0) ** 2),
        prior_mean=np.zeros(4), prior_scale=np.ones(4, np.float32),
        n_chains=8, seed=seed,
    )


def test_checkpoint_resume_elliptical_bitwise(tmp_path):
    a = _ess()
    a.init_prior(seed=3)
    a.run(25)
    ckpt = save_checkpoint(a, tmp_path / "es.npz")
    a.run(25)

    b = _ess(seed=9)
    b.init_prior(seed=4)
    load_checkpoint(b, ckpt)
    b.run(25)

    np.testing.assert_array_equal(a.get_samples(), b.get_samples())
    np.testing.assert_array_equal(a.get_log_likes(), b.get_log_likes())


# --- round-4 additions: nested, NeuTra, ADVI (VERDICT r3 item 2) -----------

DIM_NS = 2


def _ns_logprior(t):
    return -0.5 * jnp.sum(t * t) - DIM_NS * 0.5 * np.log(2 * np.pi)


def _ns_loglike(t):
    return -0.5 * jnp.sum((t - 0.5) ** 2) / 0.25


def _ns_prior_sample(key, n):
    return jax.random.normal(key, (n, DIM_NS))


def _nested(seed=0):
    from mcmcpp_tpu import NestedSampler

    return NestedSampler(_ns_logprior, _ns_loglike, _ns_prior_sample,
                         n_params=DIM_NS, n_live=64, batch=16, n_mcmc=8,
                         seed=seed)


def test_nested_run_is_resumable_uninterrupted_parity():
    """run(max_iters=k); run() must equal one uninterrupted run() bitwise
    (the key sequence and ledger continue exactly)."""
    a = _nested()
    ra = a.run(dlogz=0.05)
    b = _nested()
    b.run(dlogz=0.05, max_iters=3)  # budget-capped partial run
    rb = b.run(dlogz=0.05)          # continue to convergence
    assert rb.n_iters == ra.n_iters
    assert rb.logz == ra.logz
    assert rb.n_calls == ra.n_calls
    np.testing.assert_array_equal(rb.samples, ra.samples)
    np.testing.assert_array_equal(rb.logw, ra.logw)


def test_checkpoint_resume_nested_bitwise(tmp_path):
    a = _nested()
    a.run(dlogz=0.05, max_iters=4)
    ckpt = save_checkpoint(a, tmp_path / "ns.npz")
    ra = a.run(dlogz=0.05)

    b = _nested(seed=9)  # different key state; overwritten by load
    load_checkpoint(b, ckpt)
    rb = b.run(dlogz=0.05)

    assert rb.n_iters == ra.n_iters
    assert rb.logz == ra.logz
    assert rb.n_calls == ra.n_calls
    np.testing.assert_array_equal(rb.samples, ra.samples)
    np.testing.assert_array_equal(rb.logl, ra.logl)
    np.testing.assert_array_equal(rb.logw, ra.logw)


def test_checkpoint_nested_validation(tmp_path):
    from mcmcpp_tpu import NestedSampler

    a = _nested()
    with pytest.raises(RuntimeError, match="before run"):
        save_checkpoint(a, tmp_path / "early.npz")
    a.run(dlogz=0.05, max_iters=2)
    ckpt = save_checkpoint(a, tmp_path / "ns.npz")
    wrong = NestedSampler(_ns_logprior, _ns_loglike, _ns_prior_sample,
                          n_params=DIM_NS, n_live=32, batch=8)
    with pytest.raises(ValueError, match="n_live mismatch"):
        load_checkpoint(wrong, ckpt)


def _neutra(seed=0, n_layers=2, hidden=8):
    from mcmcpp_tpu.neutra import NeuTra, RealNVP

    def logp(t):
        return -0.5 * jnp.sum(t * t)

    return NeuTra(logp, dim=2, seed=seed,
                  flow=RealNVP(2, n_layers=n_layers, hidden=hidden))


def test_checkpoint_resume_neutra_bitwise(tmp_path):
    """Segmented fit with a save/load at the boundary == segmented fit
    without it (params, Adam moments, and key all travel)."""
    a = _neutra()
    a.fit(n_steps=30, batch=16)
    ckpt = save_checkpoint(a, tmp_path / "nt.npz")
    a.fit(n_steps=30, batch=16, resume=True)

    b = _neutra(seed=5)
    load_checkpoint(b, ckpt)
    b.fit(n_steps=30, batch=16, resume=True)

    for la, lb in zip(jax.tree_util.tree_leaves(a.params),
                      jax.tree_util.tree_leaves(b.params)):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))
    np.testing.assert_array_equal(a.fit_result.elbo_history,
                                  b.fit_result.elbo_history)
    # the restored transport reproduces the saved-time map without refitting
    c = _neutra(seed=6)
    load_checkpoint(c, ckpt)
    z = np.linspace(-1, 1, 6).reshape(3, 2).astype(np.float32)
    d = _neutra(seed=7)
    load_checkpoint(d, ckpt)
    np.testing.assert_array_equal(c.transform(z), d.transform(z))


def test_checkpoint_neutra_flow_mismatch_rejected(tmp_path):
    a = _neutra()
    a.fit(n_steps=5, batch=8)
    ckpt = save_checkpoint(a, tmp_path / "nt.npz")
    from mcmcpp_tpu.neutra import IAF, NeuTra

    b = NeuTra(lambda t: -0.5 * jnp.sum(t * t), dim=2, flow=IAF(2))
    with pytest.raises(ValueError, match="flow family mismatch"):
        load_checkpoint(b, ckpt)
    c = _neutra(n_layers=4)  # same family, different depth
    with pytest.raises(ValueError, match="leaves"):
        load_checkpoint(c, ckpt)


def test_checkpoint_resume_advi_bitwise(tmp_path):
    from mcmcpp_tpu.vi import ADVI

    def logp(t):
        return -0.5 * jnp.sum((t - 1.0) ** 2)

    a = ADVI(logp, n_params=3, seed=0)
    a.fit(40)
    ckpt = save_checkpoint(a, tmp_path / "advi.npz")
    a.fit(40)

    b = ADVI(logp, n_params=3, seed=8)
    load_checkpoint(b, ckpt)
    b.fit(40)

    np.testing.assert_array_equal(np.asarray(a.params.mu),
                                  np.asarray(b.params.mu))
    for la, lb in zip(jax.tree_util.tree_leaves(a.opt_state),
                      jax.tree_util.tree_leaves(b.opt_state)):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))
    assert a.elbo_trace == b.elbo_trace
    c = ADVI(logp, n_params=3, full_rank=True, seed=0)
    with pytest.raises(ValueError, match="full_rank"):
        load_checkpoint(c, ckpt)


def test_checkpoint_nested_n_mcmc_mismatch_rejected(tmp_path):
    from mcmcpp_tpu import NestedSampler

    a = _nested()
    a.run(dlogz=0.05, max_iters=2)
    ckpt = save_checkpoint(a, tmp_path / "ns.npz")
    wrong = NestedSampler(_ns_logprior, _ns_loglike, _ns_prior_sample,
                          n_params=DIM_NS, n_live=64, batch=16, n_mcmc=16)
    with pytest.raises(ValueError, match="n_mcmc mismatch"):
        load_checkpoint(wrong, ckpt)


def test_checkpoint_neutra_same_depth_width_mismatch_rejected(tmp_path):
    """Same leaf COUNT, different widths: must be rejected at load, not
    surface later as an opaque dot_general error (round-4 review)."""
    a = _neutra(hidden=8)
    a.fit(n_steps=3, batch=8)
    ckpt = save_checkpoint(a, tmp_path / "nt.npz")
    b = _neutra(hidden=16)
    with pytest.raises(ValueError, match="leaf .* shape"):
        load_checkpoint(b, ckpt)
