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
