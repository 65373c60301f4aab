"""Per-walker acceptance bookkeeping (VERDICT round-1 item 3).

The reference keeps accepted/rejected counts per walker
(``MCMCpp/Walker/Walker.h:111-122``) and aggregates on demand
(``MCMCpp/EnsembleSampler.h:245-282``). These tests pin the rebuilt
per-walker counters: exact aggregation identities, detectability of a
walker pinned in a -inf region, the emcee facade returning REAL per-walker
fractions, and bitwise single-device/sharded parity.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from mcmcpp_tpu import EnsembleSampler, StretchMove
from mcmcpp_tpu.movers.mh import MetropolisHastingsMove
from mcmcpp_tpu.parallel import ShardedEnsembleSampler
from tests.targets import skewed_gaussian_logp


def _run(cls=EnsembleSampler, n_walkers=64, n_steps=80, seed=5, **kw):
    s = cls(skewed_gaussian_logp, n_walkers, 2, seed=seed, **kw)
    s.init_ball(np.zeros(2), scale=0.5)
    s.run_mcmc(n_steps)
    return s


def test_per_walker_sums_to_aggregate():
    s = _run()
    pw = s.per_walker_accepted
    assert pw.shape == (64,)
    assert pw.dtype == np.int64
    assert int(pw.sum()) == s.accepted_steps
    assert np.all(pw >= 0) and np.all(pw <= 80)


def test_per_walker_fractions_heterogeneous():
    """Real per-walker data varies across walkers (a broadcast aggregate
    would be constant — the round-1 defect)."""
    s = _run(n_steps=200)
    frac = s.per_walker_acceptance
    assert frac.shape == (64,)
    assert np.all((0.0 <= frac) & (frac <= 1.0))
    assert np.ptp(frac) > 0.0  # not a broadcast scalar
    assert np.isclose(frac.mean(), s.acceptance_fraction, atol=1e-12)


def test_counters_survive_nostore_and_chunked_runs():
    """Counts accumulate identically through store=False micro-chunks,
    pipelined store chunks, and leftover (unstored) steps."""
    s = _run(n_steps=0)
    s.run_mcmc(30, store=False)
    s.run_mcmc(45, thin=2)  # 22 stored + 1 leftover step
    pw = s.per_walker_accepted
    assert int(pw.sum()) == s.accepted_steps
    assert s.total_steps == 75 * 64


def test_stuck_walker_detectable():
    """A walker pinned on a measure-~zero island (every proposal lands in
    the -inf sea) must show acceptance 0 while the ensemble accepts."""
    island = 1000.0

    def logp(theta):
        near_origin = jnp.sum(theta * theta) < 25.0
        on_island = jnp.sum(jnp.abs(theta - island)) < 1e-6
        return jnp.where(near_origin | on_island, 0.0, -jnp.inf)

    n = 64
    pos = np.random.default_rng(0).normal(0.0, 0.3, (n, 2))
    pos[5] = island  # red-half walker 5 is marooned
    s = EnsembleSampler(
        logp, n, 2, mover=MetropolisHastingsMove(scale=0.1), seed=2
    )
    s.set_initial_walker_pos(pos)
    s.run_mcmc(100)
    pw = s.per_walker_acceptance
    assert pw[5] == 0.0
    others = np.delete(pw, 5)
    assert np.all(others > 0.1)


def test_reset_clears_per_walker_counters():
    s = _run(n_steps=40)
    assert s.per_walker_accepted.sum() > 0
    s.reset()
    assert np.all(s.per_walker_accepted == 0)
    assert s.accepted_steps == 0
    s.run_mcmc(10)
    assert int(s.per_walker_accepted.sum()) == s.accepted_steps


def test_emcee_facade_per_walker_real():
    from mcmcpp_tpu.compat.emcee import EnsembleSampler as Emcee

    s = Emcee(64, 2, skewed_gaussian_logp, seed=3)
    rng = np.random.default_rng(1)
    s.run_mcmc(rng.normal(0, 0.5, (64, 2)), 150)
    frac = s.acceptance_fraction
    assert frac.shape == (64,)
    assert np.ptp(frac) > 0.0
    assert np.isclose(
        frac.mean(), s.backend.acceptance_fraction, atol=1e-12
    )


def test_sharded_per_walker_bitwise_parity():
    seq = _run(EnsembleSampler, seed=9)
    par = _run(ShardedEnsembleSampler, seed=9)
    np.testing.assert_array_equal(
        seq.per_walker_accepted, par.per_walker_accepted
    )


def test_per_walker_checkpoint_roundtrip(tmp_path):
    from mcmcpp_tpu.io.checkpoint import load_checkpoint, save_checkpoint

    a = _run(n_steps=60)
    p = save_checkpoint(a, tmp_path / "ck")
    b = EnsembleSampler(skewed_gaussian_logp, 64, 2, seed=5)
    load_checkpoint(b, p)
    np.testing.assert_array_equal(a.per_walker_accepted, b.per_walker_accepted)
