"""Global-ensemble diagnostics from per-host shards (analysis.global_stats).

Single-process layer of the round-2 verdict item-3 test plan: (a) the
global functions equal their local counterparts on the full ensemble, and
(b) combining two walker-shard partials reproduces the full-ensemble value
exactly (the decomposition the 2-process Gloo case exercises for real in
tests/test_multihost.py::test_two_process_global_diagnostics).
"""

import inspect
import threading

import numpy as np
import jax.numpy as jnp
import pytest

from mcmcpp_tpu import EnsembleSampler, analysis
from mcmcpp_tpu.analysis.global_stats import (
    global_autocorr_time,
    global_batch_means_ess,
    global_correlation_matrix,
    global_covariance_matrix,
    global_effective_sample_size,
    global_ess_bulk,
    global_ess_tail,
    global_multivariate_ess,
    global_rank_normalized_rhat,
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


class _HostSim:
    """Barrier-synchronized collective emulation: run the SAME global
    function on H shards in H threads; each ``reduce``/``gather`` call is a
    synchronized exchange round — the execution-order contract real
    ``process_allgather`` collectives impose."""

    def __init__(self, n):
        self.n = n
        self.barrier = threading.Barrier(n, timeout=120)
        self.slots = [None] * n

    def _exchange(self, i, parts):
        self.slots[i] = parts
        self.barrier.wait()
        snapshot = list(self.slots)  # copy BETWEEN the barriers
        self.barrier.wait()
        return snapshot

    def reduce(self, i):
        def _reduce(*parts):
            rounds = self._exchange(i, parts)
            out = tuple(
                np.sum([np.asarray(r[j]) for r in rounds], axis=0)
                for j in range(len(parts))
            )
            return out if len(out) > 1 else out[0]
        return _reduce

    def gather(self, i):
        def _gather(*parts):
            rounds = self._exchange(i, parts)
            out = tuple(
                np.stack([np.asarray(r[j]) for r in rounds])
                for j in range(len(parts))
            )
            return out if len(out) > 1 else out[0]
        return _gather


def _simulate_hosts(fn, full, n_hosts=2, **kw):
    """Split the walker axis into n_hosts shards, run fn on each in a
    thread with injected collectives, assert all hosts agree, return the
    replicated value."""
    w = full.shape[1]
    shards = [
        full[:, i * w // n_hosts: (i + 1) * w // n_hosts]
        for i in range(n_hosts)
    ]
    sim = _HostSim(n_hosts)
    results = [None] * n_hosts
    errors = []
    params = inspect.signature(fn).parameters
    takes_gather = "_gather" in params or any(
        p.kind is inspect.Parameter.VAR_KEYWORD for p in params.values()
    )

    def work(i):
        try:
            extra = {"_gather": sim.gather(i)} if takes_gather else {}
            results[i] = fn(shards[i], _reduce=sim.reduce(i), **extra, **kw)
        except Exception as e:  # noqa: BLE001 — re-raised below
            errors.append(e)
            sim.barrier.abort()

    threads = [threading.Thread(target=work, args=(i,))
               for i in range(n_hosts)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    non_broken = [e for e in errors
                  if not isinstance(e, threading.BrokenBarrierError)]
    if non_broken:
        raise non_broken[0]
    assert not errors
    for r in results[1:]:
        if isinstance(results[0], dict):
            assert set(r) == set(results[0])
            for k in results[0]:
                np.testing.assert_array_equal(
                    np.asarray(results[0][k]), np.asarray(r[k]),
                    err_msg=k,
                )
        else:
            np.testing.assert_array_equal(
                np.asarray(results[0]), np.asarray(r)
            )
    return results[0]


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


def test_global_ess_family_single_process(chain):
    """Each new global function equals its local whole-ensemble counterpart
    when fed the full ensemble as one 'shard' (round-3 verdict item 1)."""
    n_local = chain.shape[0] * chain.shape[1]
    np.testing.assert_array_equal(
        global_effective_sample_size(chain),
        analysis.effective_sample_size(chain),
    )
    np.testing.assert_allclose(
        global_batch_means_ess(chain),
        analysis.batch_means_ess(chain),
        rtol=1e-8,
    )
    assert global_multivariate_ess(chain) == pytest.approx(
        analysis.multivariate_ess(chain), rel=1e-10
    )
    # max_knots >= shard size -> the compressed ECDF is the full sorted
    # shard and the global ranks are EXACT (ties included)
    np.testing.assert_allclose(
        global_ess_bulk(chain, max_knots=n_local),
        analysis.ess_bulk(chain),
        rtol=1e-9,
    )
    np.testing.assert_allclose(
        global_ess_tail(chain, max_knots=n_local),
        analysis.ess_tail(chain),
        rtol=1e-9,
    )
    np.testing.assert_allclose(
        global_rank_normalized_rhat(chain, max_knots=n_local),
        analysis.potential_scale_reduction(chain, rank_normalized=True),
        rtol=1e-12,
    )


def test_global_ess_family_two_shards(chain):
    """2-host emulation: per-shard partials + collectives == the
    whole-ensemble value, for every member of the ESS family (the
    decomposition the Gloo test exercises with real processes)."""
    n_shard = chain.shape[0] * (chain.shape[1] // 2)
    ess = _simulate_hosts(global_effective_sample_size, chain)
    np.testing.assert_allclose(
        ess, analysis.effective_sample_size(chain), rtol=1e-5
    )
    bm = _simulate_hosts(global_batch_means_ess, chain)
    np.testing.assert_allclose(
        bm, analysis.batch_means_ess(chain), rtol=1e-8
    )
    mess = _simulate_hosts(global_multivariate_ess, chain)
    assert mess == pytest.approx(analysis.multivariate_ess(chain), rel=1e-9)
    bulk = _simulate_hosts(global_ess_bulk, chain, max_knots=n_shard)
    np.testing.assert_allclose(bulk, analysis.ess_bulk(chain), rtol=1e-5)
    tail = _simulate_hosts(global_ess_tail, chain, max_knots=n_shard)
    np.testing.assert_allclose(tail, analysis.ess_tail(chain), rtol=1e-5)
    rr = _simulate_hosts(global_rank_normalized_rhat, chain,
                         max_knots=n_shard)
    np.testing.assert_allclose(
        rr,
        analysis.potential_scale_reduction(chain, rank_normalized=True),
        rtol=1e-9,
    )


def test_subsampled_ecdf_approximation(chain):
    """With max_knots << shard size the rank-based statistics degrade
    gracefully (documented CDF error <= n_local/max_knots per host)."""
    exact = analysis.ess_bulk(chain)
    approx = _simulate_hosts(global_ess_bulk, chain, max_knots=256)
    np.testing.assert_allclose(approx, exact, rtol=0.1)
    rr = _simulate_hosts(global_rank_normalized_rhat, chain, max_knots=256)
    np.testing.assert_allclose(
        rr,
        analysis.potential_scale_reduction(chain, rank_normalized=True),
        rtol=0.02,
    )


def test_multihost_convergence_gate(chain):
    """run_until_converged(multihost=True) single-process: the global
    statistics path must produce the same gate decision and (to tolerance)
    the same tau/rhat/mess as the local path."""
    from mcmcpp_tpu.convergence import run_until_converged

    class _Frozen:
        """Sampler stub that replays the fixture chain."""

        n_params = chain.shape[2]

        def run_mcmc(self, n, thin=1):
            return True

        def get_samples(self):
            return chain

    local = run_until_converged(
        _Frozen(), max_steps=1, check_every=1,
        rhat_threshold=1.05, mess_rule=True, multihost=False,
    )
    glob = run_until_converged(
        _Frozen(), max_steps=1, check_every=1,
        rhat_threshold=1.05, mess_rule=True, multihost=True,
    )
    assert glob.reason == local.reason
    np.testing.assert_allclose(glob.tau, local.tau, rtol=1e-6)
    # default max_knots=4096 < the 19200-value ensemble: rank-normalized
    # rhat is ECDF-resolution approximate in the global path
    np.testing.assert_allclose(glob.rhat, local.rhat, rtol=1e-2)
    assert glob.mess == pytest.approx(local.mess, rel=1e-9)


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


def test_global_summary_and_mcse_single_process(chain):
    """global_summary / global_mcse_mean equal the local whole-ensemble
    summary when fed the full ensemble as one shard (full-knot ECDF)."""
    n_local = chain.shape[0] * chain.shape[1]
    loc = analysis.summary(chain, prob=0.9)
    glob = analysis.global_summary(chain, prob=0.9, max_knots=n_local)
    assert set(glob) == set(loc)
    for key in ("mean", "sd", "median", "q5", "q95", "hdi_lo", "hdi_hi"):
        np.testing.assert_allclose(glob[key], loc[key], rtol=1e-9,
                                   err_msg=key)
    for key in ("ess", "ess_bulk", "ess_tail", "rhat", "mcse"):
        np.testing.assert_allclose(glob[key], loc[key], rtol=1e-6,
                                   err_msg=key)
    np.testing.assert_allclose(
        analysis.global_mcse_mean(chain), analysis.mcse_mean(chain),
        rtol=1e-9,
    )


def test_global_summary_two_shards(chain):
    """2-host emulation of the full summary: every statistic equals the
    whole-ensemble value (order statistics exact via full-knot ECDFs)."""
    n_shard = chain.shape[0] * (chain.shape[1] // 2)
    loc = analysis.summary(chain, prob=0.9)
    glob = _simulate_hosts(
        lambda sh, **kw: analysis.global_summary(sh, prob=0.9, **kw),
        chain, max_knots=n_shard,
    )
    for key in ("mean", "sd", "median", "q5", "q95", "hdi_lo", "hdi_hi"):
        np.testing.assert_allclose(glob[key], loc[key], rtol=1e-9,
                                   err_msg=key)
    for key in ("ess", "ess_bulk", "ess_tail", "rhat", "mcse"):
        np.testing.assert_allclose(glob[key], loc[key], rtol=1e-5,
                                   err_msg=key)


def test_rank_rhat_2d_series(chain):
    """(S, W) input is accepted like every sibling global_* function."""
    from mcmcpp_tpu.analysis import global_rank_normalized_rhat

    v = global_rank_normalized_rhat(chain[:, :, 0],
                                    max_knots=chain[:, :, 0].size)
    full = analysis.potential_scale_reduction(
        chain[:, :, :1], rank_normalized=True
    )
    assert v == pytest.approx(float(full[0]), rel=1e-12)
