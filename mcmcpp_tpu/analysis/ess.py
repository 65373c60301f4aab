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
