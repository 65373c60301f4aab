"""Partner-selection ops: distinctness, uniformity, roll/gather parity."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mcmcpp_tpu import EnsembleSampler, StretchMove, DifferentialEvolutionMove
from mcmcpp_tpu.ops.partner import (
    block_partners,
    distinct_shifts,
    gather_partners,
    rolled_partners,
    select_partners,
)

from tests.targets import skewed_gaussian_logp, skewed_gaussian_cov


def test_distinct_shifts_are_distinct_and_uniform():
    m, k = 12, 5
    counts = np.zeros(m)
    for i in range(400):
        s = np.asarray(distinct_shifts(jax.random.key(i), m, k))
        assert len(set(s.tolist())) == k
        assert s.min() >= 0 and s.max() < m
        counts[s] += 1
    freq = counts / counts.sum()
    np.testing.assert_allclose(freq, np.full(m, 1 / m), atol=0.012)


def test_distinct_shifts_k_equals_m():
    s = np.sort(np.asarray(distinct_shifts(jax.random.key(0), 6, 6)))
    np.testing.assert_array_equal(s, np.arange(6))


def test_gather_partners_distinct_rows():
    other = jnp.arange(40.0).reshape(8, 5)
    parts = gather_partners(jax.random.key(3), other, 8, 3)
    ids = np.asarray(parts[:, :, 0]) / 5  # recover row index from content
    for w in range(8):
        assert len(set(ids[:, w].tolist())) == 3


def test_rolled_partners_layout():
    other = jnp.arange(12.0).reshape(6, 2)
    parts = rolled_partners(jax.random.key(1), other, 2)
    # row i of each stack must be other[(i + r_j) % m] for a constant shift
    for j in range(2):
        r = int((parts[j, 0, 0] - other[0, 0]) / 2) % 6
        np.testing.assert_array_equal(
            np.asarray(parts[j]), np.roll(np.asarray(other), -r, axis=0)
        )


def test_select_partners_bad_mode():
    other = jnp.zeros((4, 2))
    with pytest.raises(ValueError):
        select_partners(jax.random.key(0), other, 4, 1, "nope")


@pytest.mark.parametrize("mode", ["roll", "block", "gather"])
def test_stretch_moments_both_modes(mode):
    """Both pairing modes must recover the skewed-Gaussian covariance."""
    s = EnsembleSampler(
        skewed_gaussian_logp, n_walkers=128, n_params=2, seed=21,
        mover=StretchMove(partner_mode=mode),
    )
    s.init_ball(np.zeros(2), scale=0.5, seed=2)
    s.run_mcmc(400, store=False)
    s.run_mcmc(3000)
    cov = np.cov(s.get_samples(flat=True).T)
    np.testing.assert_allclose(cov, skewed_gaussian_cov(), atol=0.15)
    assert 0.3 < s.acceptance_fraction < 0.9


@pytest.mark.slow
def test_roll_gather_acceptance_agreement():
    """Roll pairing must not change acceptance statistics materially."""
    res = {}
    for mode in ["roll", "block", "gather"]:
        s = EnsembleSampler(
            skewed_gaussian_logp, n_walkers=128, n_params=2, seed=5,
            mover=DifferentialEvolutionMove(partner_mode=mode),
        )
        s.init_ball(np.zeros(2), scale=0.5, seed=3)
        s.run_mcmc(300, store=False)
        s.run_mcmc(1500)
        res[mode] = s.acceptance_fraction
    assert abs(res["roll"] - res["gather"]) < 0.08
    assert abs(res["block"] - res["gather"]) < 0.08


@pytest.mark.slow
def test_roll_gather_act_agreement():
    """Shared-shift pairing must not inflate autocorrelation times.

    (Measured: roll ~30.4, gather ~30.5 on this config — indistinguishable.)
    """
    from mcmcpp_tpu import analysis

    taus = {}
    for mode in ["roll", "gather"]:
        vals = []
        for seed in range(2):
            s = EnsembleSampler(
                skewed_gaussian_logp, n_walkers=128, n_params=2, seed=seed,
                mover=StretchMove(partner_mode=mode),
            )
            s.init_ball(np.zeros(2), scale=0.5, seed=seed + 10)
            s.run_mcmc(500, store=False)
            s.run_mcmc(4000)
            vals.append(analysis.autocorr_time(s.get_samples()))
        taus[mode] = np.mean(vals, axis=0)
    assert np.all(taus["roll"] > 0) and np.all(taus["gather"] > 0)
    np.testing.assert_allclose(taus["roll"], taus["gather"], rtol=0.25)


def test_block_partners_structure():
    """Each 128-walker block applies ONE shift; shifts vary across
    blocks (iid) and the k shifts of any block are distinct."""
    m, p, k = 512, 3, 2
    other = jnp.arange(float(m * p)).reshape(m, p)
    parts = block_partners(jax.random.key(7), other, m, k, block=128)
    assert parts.shape == (k, m, p)
    ids = (np.asarray(parts[:, :, 0]) / p).astype(int)      # (k, m) rows
    shifts = (ids - np.arange(m)[None, :]) % m              # (k, m)
    for j in range(k):
        per_block = shifts[j].reshape(4, 128)
        # constant within a block
        assert (per_block == per_block[:, :1]).all()
    # distinct k-tuples per block
    blk = shifts[:, ::128]                                   # (k, 4)
    for g in range(4):
        assert len(set(blk[:, g].tolist())) == k
    # not all blocks share one shift (that would be roll)
    assert len(set(shifts[0, ::128].tolist())) > 1


def test_block_partners_marginal_uniform():
    """Every walker's partner is marginally uniform over the complement
    (the shift is uniform in [0, m))."""
    m = 16
    other = jnp.arange(float(m))[:, None]
    counts = np.zeros((2, m))  # walkers 0 (block 0) and 9 (block 2)
    for i in range(600):
        part = block_partners(jax.random.key(i), other, m, 1, block=4)[0]
        counts[0, int(part[0, 0])] += 1
        counts[1, int(part[9, 0])] += 1
    freq = counts / counts.sum(axis=1, keepdims=True)
    np.testing.assert_allclose(freq, 1 / m, atol=0.035)


def test_block_partners_partial_trailing_block():
    """n not a multiple of the block size still yields n rows."""
    other = jnp.arange(20.0).reshape(10, 2)
    parts = block_partners(jax.random.key(1), other, 10, 1, block=4)
    assert parts.shape == (1, 10, 2)
    ids = (np.asarray(parts[0, :, 0]) / 2).astype(int)
    assert ((ids - np.arange(10)) % 10 == (ids[0] - 0) % 10).sum() >= 4


def test_block_partners_tiny_ensemble_k_exceeds_blocks():
    """Round-5 review fix: m a multiple of 128 but with fewer blocks
    than k must route to the per-walker fallback instead of raising
    (DE/snooker/slice at W=256 hit exactly this geometry)."""
    m, p, k = 128, 2, 2  # one block, two partners needed
    other = jnp.arange(float(m * p)).reshape(m, p)
    parts = block_partners(jax.random.key(3), other, m, k, block=128)
    assert parts.shape == (k, m, p)
    ids = (np.asarray(parts[:, :, 0]) / p).astype(int)
    # distinct partners per walker
    assert (ids[0] != ids[1]).all()
    # and the full mover path runs end-to-end
    from mcmcpp_tpu import DifferentialEvolutionMove, EnsembleSampler

    s = EnsembleSampler(
        skewed_gaussian_logp, n_walkers=256, n_params=2, seed=1,
        mover=DifferentialEvolutionMove(partner_mode="block"),
    )
    s.init_ball(np.zeros(2), scale=0.5, seed=2)
    s.run_mcmc(5, store=False)
    assert s.total_steps == 5 * 256


def test_walk_move_block_mode_honored_and_unknown_rejected():
    """Round-5 review fix: WalkMove must dispatch non-roll modes through
    select_partners — 'block' honored, typos rejected (previously any
    non-'roll' string silently ran the slow per-walker gather)."""
    from mcmcpp_tpu import EnsembleSampler, WalkMove

    s = EnsembleSampler(
        skewed_gaussian_logp, n_walkers=512, n_params=2, seed=3,
        mover=WalkMove(n_samples=4, partner_mode="block"),
    )
    s.init_ball(np.zeros(2), scale=0.5, seed=4)
    s.run_mcmc(400, store=False)
    s.run_mcmc(1500)
    cov = np.cov(s.get_samples(flat=True).T)
    np.testing.assert_allclose(cov, skewed_gaussian_cov(), atol=0.2)

    bad = EnsembleSampler(
        skewed_gaussian_logp, n_walkers=64, n_params=2, seed=5,
        mover=WalkMove(n_samples=4, partner_mode="rol"),
    )
    bad.init_ball(np.zeros(2), scale=0.5, seed=6)
    with pytest.raises(ValueError, match="unknown partner mode"):
        bad.run_mcmc(2, store=False)
