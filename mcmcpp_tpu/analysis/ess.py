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
