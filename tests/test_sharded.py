"""Sharded runtime tests on the virtual 8-device CPU mesh.

The reference validates its threaded runtime by re-running the statistical
oracles under ``ParallelEnsembleSampler`` (``test/parallel/AcTime``,
SURVEY.md §4). We can do strictly better: with partitionable threefry the
sharded sampler is BITWISE identical to the single-device one, so parity is
an exact-equality test, not a statistical one.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mcmcpp_tpu import EnsembleSampler, ShardedEnsembleSampler, StretchMove
from mcmcpp_tpu.parallel.mesh import make_walker_mesh

from tests.targets import skewed_gaussian_logp, skewed_gaussian_cov


def _make(cls, **kw):
    s = cls(skewed_gaussian_logp, n_walkers=64, n_params=2, seed=7, **kw)
    s.init_ball(np.zeros(2), scale=0.5, seed=3)
    return s


def test_mesh_shapes():
    mesh = make_walker_mesh()
    assert mesh.size == len(jax.devices())
    assert mesh.axis_names == ("hosts", "devices")


def test_sharded_bitwise_matches_single_device():
    """Sharded over 8 devices == single-device run, bit for bit."""
    seq = _make(EnsembleSampler)
    par = _make(ShardedEnsembleSampler)
    seq.run_mcmc(50)
    par.run_mcmc(50)
    np.testing.assert_array_equal(
        np.asarray(seq.current_positions), np.asarray(par.current_positions)
    )
    assert seq.accepted_steps == par.accepted_steps
    np.testing.assert_array_equal(seq.get_samples(), par.get_samples())


def test_sharded_state_is_actually_sharded():
    par = _make(ShardedEnsembleSampler)
    par.run_mcmc(3)
    sh = par.state.red.sharding
    # walker axis split over the full mesh, param axis replicated
    assert not sh.is_fully_replicated
    shard_shapes = {s.data.shape for s in par.state.red.addressable_shards}
    assert shard_shapes == {(32 // par.mesh.size, 2)}


@pytest.mark.slow
def test_sharded_moments():
    par = ShardedEnsembleSampler(
        skewed_gaussian_logp, n_walkers=256, n_params=2, seed=11
    )
    par.init_ball(np.zeros(2), scale=0.5, seed=5)
    par.run_mcmc(500, store=False)  # burn
    par.run_mcmc(4000)
    flat = par.get_samples(flat=True)
    cov = np.cov(flat.T)
    np.testing.assert_allclose(cov, skewed_gaussian_cov(), atol=0.12)


def test_uneven_shard_rejected():
    with pytest.raises(ValueError):
        ShardedEnsembleSampler(skewed_gaussian_logp, n_walkers=6, n_params=2)


def test_sharded_slice_move_bitwise():
    """EnsembleSliceMove's masked while_loops (stepping-out + shrinking)
    must partition under GSPMD: the `any` trip conditions become global
    reductions, so sharded == single-device bit for bit."""
    from mcmcpp_tpu import EnsembleSliceMove

    seq = _make(EnsembleSampler, mover=EnsembleSliceMove())
    par = _make(ShardedEnsembleSampler, mover=EnsembleSliceMove())
    seq.run_mcmc(30)
    par.run_mcmc(30)
    np.testing.assert_array_equal(
        np.asarray(seq.current_positions), np.asarray(par.current_positions)
    )
    np.testing.assert_array_equal(seq.get_samples(), par.get_samples())
