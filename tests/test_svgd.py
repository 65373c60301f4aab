"""SVGD oracles (Liu & Wang 2016).

Strategy (SURVEY.md §4 pattern): Gaussian targets give exact moment
truths; a symmetric bimodal mixture tests the repulsion term's
mode-balance guarantee (the failure mode of plain gradient ascent);
N=1 must reduce exactly to gradient ascent on log p (the paper's
degenerate case). Fixed seeds, generous tolerances.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mcmcpp_tpu import SVGD

COV = np.array([[1.0, 0.8], [0.8, 1.0]])
PREC = np.linalg.inv(COV)


def _corr_gauss(t):
    return -0.5 * t @ jnp.asarray(PREC, jnp.float32) @ t


def test_gaussian_moments():
    s = SVGD(_corr_gauss, n_particles=512, n_params=2, seed=0,
             step_size=0.3)
    s.init(scale=3.0, seed=1)
    res = s.fit(800)
    x = s.get_samples().astype(np.float64)
    assert np.abs(x.mean(axis=0)).max() < 0.1, x.mean(axis=0)
    cov = np.cov(x.T)
    np.testing.assert_allclose(cov, COV, atol=0.15)
    # the Stein direction magnitude must have DECREASED (approaching a
    # fixed point of the update)
    hist = np.asarray(res.grad_norm_history)
    assert hist[-1] < 0.5 * hist[:20].mean(), (hist[:3], hist[-3:])


def test_bimodal_mode_balance():
    """Symmetric two-Gaussian mixture at ±3: the repulsion term must
    hold particles in BOTH modes (plain gradient ascent from the same
    init collapses each particle to its basin ONLY — here the init is
    centered so balance is the sensitive check)."""
    def mix(t):
        a = -0.5 * jnp.sum((t - 3.0) ** 2) / 0.5
        b = -0.5 * jnp.sum((t + 3.0) ** 2) / 0.5
        return jnp.logaddexp(a, b)

    s = SVGD(mix, n_particles=256, n_params=1, seed=2, step_size=0.3)
    s.init(scale=4.0, seed=3)
    s.fit(1500)
    x = s.get_samples()[:, 0]
    frac_hi = float((x > 0).mean())
    assert 0.3 < frac_hi < 0.7, frac_hi
    # particles sit IN the modes, not between them
    assert np.abs(np.abs(x) - 3.0).mean() < 1.0


def test_single_particle_is_map_ascent():
    """N=1: the kernel terms are constants, so SVGD must converge to
    the mode like gradient ascent."""
    s = SVGD(lambda t: -0.5 * jnp.sum((t - 2.5) ** 2), n_particles=1,
             n_params=3, seed=0, step_size=0.5)
    s.init(positions=np.zeros((1, 3), np.float32))
    s.fit(400)
    np.testing.assert_allclose(s.get_samples()[0], 2.5, atol=0.05)


def test_mesh_sharded_parity():
    from mcmcpp_tpu.parallel.mesh import make_walker_mesh

    def build(mesh):
        s = SVGD(_corr_gauss, n_particles=64, n_params=2, seed=0,
                 mesh=mesh)
        s.init(scale=2.0, seed=5)
        s.fit(100)
        return s.get_samples()

    a, b = build(None), build(make_walker_mesh())
    np.testing.assert_allclose(a, b, rtol=2e-5, atol=1e-5)
    with pytest.raises(ValueError, match="divisible"):
        SVGD(_corr_gauss, n_particles=63, n_params=2,
             mesh=make_walker_mesh())


def test_fixed_bandwidth_and_validation():
    s = SVGD(_corr_gauss, n_particles=128, n_params=2, seed=0,
             bandwidth=1.0)
    s.init(scale=2.0, seed=1)
    s.fit(300)
    x = s.get_samples()
    assert np.isfinite(x).all()
    assert np.abs(x.mean(axis=0)).max() < 0.3
    with pytest.raises(ValueError, match="bandwidth"):
        SVGD(_corr_gauss, n_particles=8, n_params=2, bandwidth=-1.0)
    with pytest.raises(ValueError, match="positions"):
        SVGD(_corr_gauss, n_particles=8, n_params=2).init(
            positions=np.zeros((4, 2), np.float32)
        )
    with pytest.raises(RuntimeError, match="init"):
        SVGD(_corr_gauss, n_particles=8, n_params=2).get_samples()
