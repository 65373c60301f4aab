"""Global-ensemble diagnostics from per-host shards (analysis.global_stats).

Single-process layer of the round-2 verdict item-3 test plan: (a) the
global functions equal their local counterparts on the full ensemble, and
(b) combining two walker-shard partials reproduces the full-ensemble value
exactly (the decomposition the 2-process Gloo case exercises for real in
tests/test_multihost.py::test_two_process_global_diagnostics).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from mcmcpp_tpu import EnsembleSampler, analysis
from mcmcpp_tpu.analysis.global_stats import (
    global_autocorr_time,
    global_correlation_matrix,
    global_covariance_matrix,
    global_split_rhat,
)


@pytest.fixture(scope="module")
def chain():
    def logp(t):
        return -0.5 * jnp.sum(t * t)

    s = EnsembleSampler(logp, n_walkers=32, n_params=3, seed=0)
    s.init_ball(np.zeros(3), scale=0.5, seed=1)
    s.run_mcmc(200, store=False)
    s.run_mcmc(600)
    return s.get_samples()  # (600, 32, 3)


def _two_shard(fn, full, **kw):
    """Emulate a 2-host run: capture shard B's partials, then reduce them
    into shard A's call — exactly what process_allgather+sum does."""
    a, b = full[:, : full.shape[1] // 2], full[:, full.shape[1] // 2:]
    captured = {}

    class _Stop(Exception):
        pass

    def capture(*parts):
        captured["b"] = parts
        raise _Stop

    with pytest.raises(_Stop):
        fn(b, _reduce=capture, **kw)

    def combine(*parts_a):
        out = tuple(
            np.asarray(x) + np.asarray(y)
            for x, y in zip(parts_a, captured["b"])
        )
        return out if len(out) > 1 else out[0]

    return fn(a, _reduce=combine, **kw)


def test_single_process_equals_local_functions(chain):
    np.testing.assert_array_equal(
        global_autocorr_time(chain), analysis.autocorr_time(chain)
    )
    # the local function uses an f32 device matmul; the global path's f64
    # sufficient statistics are strictly more precise — agree to f32 noise
    np.testing.assert_allclose(
        global_covariance_matrix(chain),
        analysis.covariance_matrix(chain),
        rtol=1e-4,
    )
    np.testing.assert_allclose(
        global_split_rhat(chain),
        analysis.potential_scale_reduction(chain, rank_normalized=False),
        rtol=1e-12,
    )


def test_two_shard_combination_reproduces_full_ensemble(chain):
    """Per-shard partials + reduce == whole-ensemble analysis — the
    decomposition AutoCorrCalc.h:151-221's all-walker averaging demands."""
    tau_full = analysis.autocorr_time(chain)
    tau_shard = _two_shard(global_autocorr_time, chain)
    np.testing.assert_allclose(tau_shard, tau_full, rtol=1e-5)

    cov_full = global_covariance_matrix(chain)  # same f64 path, full array
    cov_shard = _two_shard(global_covariance_matrix, chain)
    np.testing.assert_allclose(cov_shard, cov_full, rtol=1e-10)

    corr_shard = _two_shard(global_correlation_matrix, chain)
    np.testing.assert_allclose(
        corr_shard, global_correlation_matrix(chain), rtol=1e-10
    )

    rhat_full = analysis.potential_scale_reduction(
        chain, rank_normalized=False
    )
    rhat_shard = _two_shard(global_split_rhat, chain)
    np.testing.assert_allclose(rhat_shard, rhat_full, rtol=1e-10)


def test_2d_series_path(chain):
    tau = global_autocorr_time(chain[:, :, 0])
    assert isinstance(tau, float)
    assert tau == pytest.approx(
        float(analysis.autocorr_time(chain[:, :, 0])), rel=1e-12
    )


def test_validation():
    with pytest.raises(ValueError, match="local_samples"):
        global_autocorr_time(np.zeros((4,)))
    with pytest.raises(ValueError, match="local_samples"):
        global_split_rhat(np.zeros((4, 2)))
    with pytest.raises(ValueError, match="local_samples"):
        global_covariance_matrix(np.zeros((4,)))
