"""Global-ensemble diagnostics from per-host chain shards.

Round-2 verdict item 3. The reference's analysis layer always sees the
WHOLE ensemble — ``MCMCpp/Analysis/AutoCorrCalc.h:151-221`` averages the
normalized autocovariance over all walkers before the Sokal window. Under
real multi-host SPMD each process's :class:`~mcmcpp_tpu.chain.Chain` holds
only its walker shard (parallel/distributed.py), so naively calling the
local analysis functions yields PER-SHARD statistics.

This module computes the exact global-ensemble values by the standard
decomposition: each host reduces its shard to small sufficient statistics
(per-walker autocovariance partial sums, moment sums, per-chain
mean/variance sums), a tiny ``process_allgather`` combines them, and every
host finishes with the identical global number. The gathered payloads are
(P, S) for ACT and (P,)/(P, P) for moments — KBs, never the chain itself.

Single-process, every function here equals its local counterpart in
``analysis.autocorr`` / ``analysis.covariance`` / ``analysis.diagnostics``
(same math, same window) — asserted in tests/test_global_stats.py, and the
2-process Gloo harness asserts shard-fed results equal the single-process
whole-ensemble numbers.
"""

import numpy as np
import jax
import jax.numpy as jnp

from mcmcpp_tpu.analysis.autocorr import _norm_autocov_fft, _sokal_window_tau


def _sum_over_hosts(*partials):
    """Sum each partial statistic across processes (identity if single).

    Every host must call this the same number of times with same-shaped
    arrays (it is a collective under multi-host).
    """
    if jax.process_count() == 1:
        return partials if len(partials) > 1 else partials[0]
    from jax.experimental import multihost_utils

    gathered = multihost_utils.process_allgather(
        tuple(np.asarray(p) for p in partials)
    )
    out = tuple(np.asarray(g).sum(axis=0) for g in gathered)
    return out if len(out) > 1 else out[0]


def global_autocorr_time(local_samples, window_scaling=4.0,
                         _reduce=None):
    """Whole-ensemble integrated ACT from a per-host walker shard.

    local_samples: (S, W_local, P) — THIS host's chain shard (what
    ``get_samples()`` returns under multi-host). Every host must call this
    collectively; all hosts return the identical (P,) estimate, equal to
    ``analysis.autocorr_time`` run on the full (S, W_global, P) ensemble
    (≙ AutoCorrCalc.h:151-221's all-walker averaging).

    Decomposition: the walker-averaged ρ(t) is a plain mean over walkers,
    so each host contributes Σ_{w∈local} ρ_w(t) (a (P, S) array) plus its
    walker count; the Sokal window runs on the combined mean.
    """
    arr = np.asarray(local_samples)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    if arr.ndim != 3:
        raise ValueError("local_samples must be (S, W_local[, P])")
    s, w, p = arr.shape
    rows = np.ascontiguousarray(np.transpose(arr, (2, 1, 0)).reshape(p * w, s))
    rho = np.asarray(
        _norm_autocov_fft(jnp.asarray(rows, jnp.float32)), np.float64
    )
    rho_partial = rho.reshape(p, w, s).sum(axis=1)  # (P, S)
    reduce_ = _reduce if _reduce is not None else _sum_over_hosts
    rho_sum, w_total = reduce_(rho_partial, np.asarray(w, np.float64))
    rho_mean = rho_sum / w_total
    taus = np.array(
        [_sokal_window_tau(rho_mean[i], window_scaling) for i in range(p)]
    )
    return float(taus[0]) if np.ndim(local_samples) == 2 else taus


def global_covariance_matrix(local_samples, _reduce=None):
    """Whole-ensemble covariance from a per-host shard (collective).

    local_samples: (S, W_local, P) or (N_local, P). Partial sufficient
    statistics: row count, Σx (P,), Σxxᵀ (P, P) in float64; combined cov
    uses ddof=1 like ``analysis.covariance_matrix``.
    """
    arr = np.asarray(local_samples, np.float64)
    if arr.ndim == 3:
        arr = arr.reshape(-1, arr.shape[-1])
    if arr.ndim != 2:
        raise ValueError("local_samples must be (S, W_local, P) or (N, P)")
    n = np.asarray(float(arr.shape[0]))
    sx = arr.sum(axis=0)
    sxx = arr.T @ arr
    reduce_ = _reduce if _reduce is not None else _sum_over_hosts
    n, sx, sxx = reduce_(n, sx, sxx)
    mean = sx / n
    return (sxx - np.outer(mean, sx)) / (n - 1.0)


def global_correlation_matrix(local_samples, _reduce=None):
    cov = global_covariance_matrix(local_samples, _reduce=_reduce)
    d = np.sqrt(np.diag(cov))
    return cov / np.outer(d, d)


def global_split_rhat(local_samples, _reduce=None):
    """Whole-ensemble split-R̂ from a per-host walker shard (collective).

    local_samples: (S, W_local, P). Classic (non-rank-normalized)
    Gelman–Rubin split-R̂ — identical to
    ``analysis.potential_scale_reduction(..., rank_normalized=False)`` on
    the full ensemble. Rank normalization needs GLOBAL ranks (not
    decomposable into small partials); compute it on a gathered subset if
    required.

    Partials per host, per parameter (each a scalar): split-chain count,
    Σ m_c, Σ m_c² over split-chain means, and Σ s_c² over within-chain
    variances.
    """
    arr = np.asarray(local_samples, np.float64)
    if arr.ndim != 3:
        raise ValueError("local_samples must be (S, W_local, P)")
    s_even = arr.shape[0] - arr.shape[0] % 2
    half = s_even // 2
    # (half, 2*W_local, P): split each walker's series in two chains
    x = np.concatenate([arr[:half], arr[half:s_even]], axis=1)
    s, c, p = x.shape
    m = x.mean(axis=0)  # (2W, P) split-chain means
    v = x.var(axis=0, ddof=1)  # (2W, P) within-chain variances
    count = np.asarray(float(c))
    sm = m.sum(axis=0)
    smm = (m * m).sum(axis=0)
    sv = v.sum(axis=0)
    reduce_ = _reduce if _reduce is not None else _sum_over_hosts
    count, sm, smm, sv = reduce_(count, sm, smm, sv)
    mean_m = sm / count
    b = s * (smm - count * mean_m**2) / (count - 1.0)  # between-chain
    w = sv / count  # mean within-chain
    var_plus = (s - 1.0) / s * w + b / s
    with np.errstate(divide="ignore", invalid="ignore"):
        rhat = np.sqrt(var_plus / w)
    return np.where(w > 0, rhat, np.inf)
