"""Effective sample size — derived metric the reference lacks but the
benchmark tracks (BASELINE.md: ESS/s alongside walker-updates/s).

ESS = S·W / τ per parameter, using the windowed-Sokal τ from
:mod:`mcmcpp_tpu.analysis.autocorr`.
"""

import numpy as np

from mcmcpp_tpu.analysis.autocorr import autocorr_time


def effective_sample_size(samples, window_scaling=4.0, **kw):
    """ESS per parameter for (S, W, P) (or scalar for (S, W)) samples.

    Unconverged τ estimates (returned negative by ``autocorr_time``) yield
    NaN so they can't silently inflate ESS.
    """
    arr = np.asarray(samples)
    tau = autocorr_time(arr, window_scaling=window_scaling, **kw)
    n_total = arr.shape[0] * arr.shape[1]
    tau = np.asarray(tau, np.float64)
    ess = np.where(tau > 0, n_total / np.maximum(tau, 1e-12), np.nan)
    return float(ess) if ess.ndim == 0 else ess


def batch_means_ess(samples, n_batches=32):
    """O(1)-memory ESS via the batch-means variance-ratio estimator.

    For chains too long to FFT in one window (SURVEY.md §7 hard part (c)):
    split each walker's series into ``n_batches`` consecutive batches; with
    batch size b, ESS ≈ N·Var[x]/(b·Var[batch means]). Consistent as both
    b and n_batches grow; needs only streaming batch sums, so it works on
    chains read chunk-by-chunk from disk.

    samples: (S, W) or (S, W, P). Returns float or (P,).
    """
    arr = np.asarray(samples, np.float64)
    squeeze = arr.ndim == 2
    if squeeze:
        arr = arr[:, :, None]
    s, w, p = arr.shape
    b = s // int(n_batches)
    if b < 2:
        raise ValueError("chain too short for the requested n_batches")
    trimmed = arr[: b * n_batches]
    # (n_batches, b, W, P) -> batch means (n_batches, W, P)
    means = trimmed.reshape(n_batches, b, w, p).mean(axis=1)
    var_means = means.var(axis=0, ddof=1).mean(axis=0)  # avg over walkers
    var_x = trimmed.reshape(-1, w, p).var(axis=(0, 1), ddof=1)
    n_total = b * n_batches * w
    # per-walker ESS = s·Var[x]/(b·Var[batch means]); total sums over walkers
    with np.errstate(divide="ignore", invalid="ignore"):
        ess = n_total * var_x / (b * var_means)
    ess = np.minimum(ess, float(n_total))
    return float(ess[0]) if squeeze else ess


def _rank_normalize_3d(arr):
    """(S, W, P) -> normal scores per parameter (Vehtari et al. 2021 §3)."""
    from scipy import stats as _stats

    out = np.empty_like(arr, np.float64)
    s, w, p = arr.shape
    for i in range(p):
        r = _stats.rankdata(arr[:, :, i], axis=None).reshape(s, w)
        out[:, :, i] = _stats.norm.ppf((r - 0.375) / (s * w + 0.25))
    return out


def ess_bulk(samples, **kw):
    """Rank-normalized bulk ESS (Vehtari et al. 2021): ESS of the normal
    scores — robust to heavy tails and measures mixing in the bulk.

    samples: (S, W, P) or (S, W). Returns (P,) or float.
    """
    arr = np.asarray(samples, np.float64)
    squeeze = arr.ndim == 2
    if squeeze:
        arr = arr[:, :, None]
    ess = effective_sample_size(_rank_normalize_3d(arr), **kw)
    return float(ess[0]) if squeeze else ess


def ess_tail(samples, prob=0.05, **kw):
    """Tail ESS: min over the ``prob`` and ``1-prob`` quantile indicator
    ESS (Vehtari et al. 2021 §4.3) — mixing quality where credible-interval
    endpoints are estimated.

    samples: (S, W, P) or (S, W). Returns (P,) or float.
    """
    arr = np.asarray(samples, np.float64)
    squeeze = arr.ndim == 2
    if squeeze:
        arr = arr[:, :, None]
    out = []
    for q in (prob, 1.0 - prob):
        cut = np.quantile(arr.reshape(-1, arr.shape[2]), q, axis=0)
        ind = (arr <= cut[None, None, :]).astype(np.float64)
        out.append(np.atleast_1d(effective_sample_size(ind, **kw)))
    ess = np.minimum(*out)
    return float(ess[0]) if squeeze else ess
