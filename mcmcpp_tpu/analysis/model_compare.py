"""Predictive model comparison: WAIC and importance-sampling LOO.

Vehtari, Gelman & Gabry (2017, Stat. Comput.): expected log pointwise
predictive density (elpd) estimated from an (N_draws, n_obs) pointwise
log-likelihood matrix (``Model.pointwise_log_likelihood``), by WAIC
(lppd minus the pointwise-variance penalty) or by leave-one-out
importance sampling. The LOO weights use truncated importance sampling
(Ionides 2008: cap at mean * sqrt(N)) with a per-observation Hill
tail-index diagnostic standing in for the paper's PSIS fit — the same
convention as pathfinder.py; observations with ``pareto_k > 0.7`` have
unreliable LOO contributions.

Host-side numpy (float64 accumulation): comparison runs once per fit,
off the hot path — like the rest of the analysis layer
(≙ ``/root/reference/MCMCpp/Analysis/`` being host-side too; the
reference itself has no model-comparison facilities).
"""

from typing import NamedTuple

import numpy as np

from scipy.special import logsumexp


class ElpdResult(NamedTuple):
    elpd: float  # total expected log pointwise predictive density
    se: float  # standard error over observations
    p_eff: float  # effective number of parameters
    pointwise: np.ndarray  # (n_obs,) per-observation elpd contributions
    pareto_k: np.ndarray  # (n_obs,) tail diagnostic (NaN for WAIC)
    method: str  # "waic" | "loo"


def _flatten(loglik):
    """(N, ...) or {site: (N, ...)} -> (N, n_obs) float64, NaN (masked)
    columns dropped."""
    if isinstance(loglik, dict):
        mats = [np.asarray(v, np.float64).reshape(v.shape[0], -1)
                for v in loglik.values()]
        ll = np.concatenate(mats, axis=1)
    else:
        ll = np.asarray(loglik, np.float64)
        ll = ll.reshape(ll.shape[0], -1)
    keep = ~np.isnan(ll).any(axis=0)
    return ll[:, keep]


def waic(loglik):
    """WAIC from an (N_draws, n_obs) matrix (or dict of per-site
    matrices). Vehtari et al. 2017, eqs. (11)-(13)."""
    ll = _flatten(loglik)
    n, n_obs = ll.shape
    lppd = logsumexp(ll, axis=0) - np.log(n)
    p = ll.var(axis=0, ddof=1)
    pointwise = lppd - p
    return ElpdResult(
        elpd=float(pointwise.sum()),
        se=float(np.sqrt(n_obs * pointwise.var(ddof=1))),
        p_eff=float(p.sum()),
        pointwise=pointwise,
        pareto_k=np.full(n_obs, np.nan),
        method="waic",
    )


def loo(loglik, khat_frac=0.2):
    """Leave-one-out elpd by truncated importance sampling.

    Raw weights per observation i: ``w_s ∝ 1 / p(y_i | theta_s)``;
    truncated at ``mean(w) * sqrt(N)`` before normalization. ``pareto_k``
    is the Hill estimator over the top ``khat_frac`` of raw log-weights.
    """
    ll = _flatten(loglik)
    n, n_obs = ll.shape
    lw = -ll  # log raw weights
    lw = lw - lw.max(axis=0)
    w = np.exp(lw)
    cap = w.mean(axis=0) * np.sqrt(n)
    w = np.minimum(w, cap[None, :])
    logw = np.log(w)
    # elpd_i = log( sum_s w_s p(y_i|theta_s) / sum_s w_s )
    pointwise = logsumexp(logw + ll, axis=0) - logsumexp(logw, axis=0)
    # Hill tail index of the RAW weights (before truncation)
    m = max(int(khat_frac * n), 5)
    top = np.sort(lw, axis=0)[-m:, :]
    khat = (top[1:, :] - top[0:1, :]).mean(axis=0)
    p_eff = (logsumexp(ll, axis=0) - np.log(n) - pointwise).sum()
    return ElpdResult(
        elpd=float(pointwise.sum()),
        se=float(np.sqrt(n_obs * pointwise.var(ddof=1))),
        p_eff=float(p_eff),
        pointwise=pointwise,
        pareto_k=khat,
        method="loo",
    )


def compare(results):
    """Rank fitted models by elpd. ``results``: {name: ElpdResult} (same
    observations in the same order). Returns rows
    ``(name, elpd, se, d_elpd, d_se)`` best-first, where ``d_elpd`` is
    the difference to the best model and ``d_se`` its paired standard
    error over pointwise contributions (Vehtari et al. 2017, §5.2)."""
    if not results:
        raise ValueError("no results to compare")
    n_obs = {k: len(v.pointwise) for k, v in results.items()}
    if len(set(n_obs.values())) != 1:
        raise ValueError(f"models score different observation sets: {n_obs}")
    ranked = sorted(results.items(), key=lambda kv: -kv[1].elpd)
    best = ranked[0][1]
    rows = []
    for name, r in ranked:
        d = r.pointwise - best.pointwise
        d_se = float(np.sqrt(len(d) * d.var(ddof=1))) if r is not best else 0.0
        rows.append((name, r.elpd, r.se, r.elpd - best.elpd, d_se))
    return rows
