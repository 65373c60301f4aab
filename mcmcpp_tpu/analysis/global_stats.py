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


def _gather_hosts(*partials):
    """Stack each partial across processes: (n_hosts, ...) per array.

    Identity-with-leading-axis if single-process. Collective under
    multi-host — every host must call it with same-shaped arrays.
    """
    if jax.process_count() == 1:
        out = tuple(np.asarray(p)[None] for p in partials)
    else:
        from jax.experimental import multihost_utils

        gathered = multihost_utils.process_allgather(
            tuple(np.asarray(p) for p in partials)
        )
        out = tuple(np.asarray(g) for g in gathered)
    return out if len(out) > 1 else out[0]


def _global_tau(arr, window_scaling, reduce_):
    """Shared core: whole-ensemble taus from a (S, W_local, P) shard.

    Returns (taus (P,), w_total, s). One reduce collective.
    """
    s, w, p = arr.shape
    rows = np.ascontiguousarray(np.transpose(arr, (2, 1, 0)).reshape(p * w, s))
    rho = np.asarray(
        _norm_autocov_fft(jnp.asarray(rows, jnp.float32)), np.float64
    )
    rho_partial = rho.reshape(p, w, s).sum(axis=1)  # (P, S)
    rho_sum, w_total = reduce_(rho_partial, np.asarray(w, np.float64))
    rho_mean = rho_sum / w_total
    taus = np.array(
        [_sokal_window_tau(rho_mean[i], window_scaling) for i in range(p)]
    )
    return taus, float(w_total), s


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
    reduce_ = _reduce if _reduce is not None else _sum_over_hosts
    taus, _, _ = _global_tau(arr, window_scaling, reduce_)
    return float(taus[0]) if np.ndim(local_samples) == 2 else taus


def global_effective_sample_size(local_samples, window_scaling=4.0,
                                 _reduce=None):
    """Whole-ensemble ESS = S·W_global/τ from a per-host walker shard
    (collective; equals ``analysis.effective_sample_size`` on the full
    ensemble). Unconverged windows (τ ≤ 0) yield NaN, like the local
    function, so per-shard estimates can't silently inflate ESS.
    """
    arr = np.asarray(local_samples)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    if arr.ndim != 3:
        raise ValueError("local_samples must be (S, W_local[, P])")
    reduce_ = _reduce if _reduce is not None else _sum_over_hosts
    taus, w_total, s = _global_tau(arr, window_scaling, reduce_)
    n_total = s * w_total
    ess = np.where(taus > 0, n_total / np.maximum(taus, 1e-12), np.nan)
    return float(ess[0]) if np.ndim(local_samples) == 2 else ess


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


def global_batch_means_ess(local_samples, n_batches=32, _reduce=None):
    """Whole-ensemble batch-means ESS from a per-host walker shard
    (collective; equals ``analysis.batch_means_ess`` on the full ensemble
    up to float64 summation order).

    Partials per host: walker count, Σ over local walkers of the
    per-walker batch-mean variance (each a local exact two-pass variance),
    and the pooled count/Σx/Σx² moments for the draw variance.
    """
    arr = np.asarray(local_samples, np.float64)
    squeeze = arr.ndim == 2
    if squeeze:
        arr = arr[:, :, None]
    if arr.ndim != 3:
        raise ValueError("local_samples must be (S, W_local[, P])")
    s, w, p = arr.shape
    b = s // int(n_batches)
    if b < 2:
        raise ValueError("chain too short for the requested n_batches")
    trimmed = arr[: b * n_batches]
    means = trimmed.reshape(n_batches, b, w, p).mean(axis=1)  # (nb, W, P)
    vm_partial = means.var(axis=0, ddof=1).sum(axis=0)  # (P,) over walkers
    flat = trimmed.reshape(-1, p)
    n_loc = np.asarray(float(flat.shape[0]))
    sx = flat.sum(axis=0)
    sxx = (flat * flat).sum(axis=0)
    reduce_ = _reduce if _reduce is not None else _sum_over_hosts
    w_total, vm_sum, n, sx, sxx = reduce_(
        np.asarray(float(w)), vm_partial, n_loc, sx, sxx
    )
    var_means = vm_sum / w_total
    var_x = (sxx - sx * sx / n) / (n - 1.0)
    with np.errstate(divide="ignore", invalid="ignore"):
        ess = n * var_x / (b * var_means)
    ess = np.minimum(ess, n)
    return float(ess[0]) if squeeze else ess


def global_multivariate_ess(local_samples, n_batches=32, _reduce=None):
    """Whole-ensemble multivariate ESS (Vats-Flegal-Jones) from a per-host
    walker shard (collective; equals ``analysis.multivariate_ess`` on the
    full ensemble).

    Both covariances in mESS = n·(det Λ/det Σ)^{1/p} use PER-WALKER
    centering (matching the local estimator), so each host's Λ/Σ partial
    sums are exact (P, P) sufficient statistics — centering never needs
    the global mean.
    """
    arr = np.asarray(local_samples, np.float64)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    if arr.ndim != 3:
        raise ValueError("local_samples must be (S, W_local[, P])")
    s, w, p = arr.shape
    b = s // int(n_batches)
    if b < 2:
        raise ValueError("chain too short for the requested n_batches")
    trimmed = arr[: b * n_batches]
    centered = trimmed - trimmed.mean(axis=0, keepdims=True)
    lam_partial = np.einsum("swi,swj->ij", centered, centered)
    means = trimmed.reshape(n_batches, b, w, p).mean(axis=1)
    mc = means - means.mean(axis=0, keepdims=True)
    sig_partial = np.einsum("kwi,kwj->ij", mc, mc)
    reduce_ = _reduce if _reduce is not None else _sum_over_hosts
    w_total, lam_sum, sig_sum = reduce_(
        np.asarray(float(w)), lam_partial, sig_partial
    )
    lam = lam_sum / (w_total * (b * n_batches - 1.0))
    sig = b * sig_sum / (w_total * (n_batches - 1.0))
    sign_l, logdet_l = np.linalg.slogdet(lam)
    sign_s, logdet_s = np.linalg.slogdet(sig)
    if sign_l <= 0 or sign_s <= 0:
        return float("nan")
    n_total = float(b * n_batches * w_total)
    return float(n_total * np.exp((logdet_l - logdet_s) / p))


# --- global rank machinery -------------------------------------------------
#
# Rank normalization (bulk/tail ESS, rank-normalized R̂) needs GLOBAL ranks.
# Exact ranks would require exchanging the chains themselves, so each host
# shares a compressed per-parameter ECDF instead: its sorted values
# subsampled to ``max_knots`` order statistics with exact cumulative counts
# (payload P × max_knots floats per host — KBs). With
# n_local ≤ max_knots the knots ARE the sorted shard and every global
# count/quantile below is EXACT (ties included, via left/right counts);
# beyond that the step-function ECDF bounds the per-host CDF error by
# n_local/max_knots — far below MC noise for ESS purposes.


def _local_ecdf(flat, max_knots):
    """(n,) values -> fixed-size (knots, cums): cums[j] = #{x ≤ knots[j]}."""
    sv = np.sort(flat)
    n = sv.shape[0]
    if n <= max_knots:
        pad = max_knots - n
        knots = np.concatenate([sv, np.full(pad, sv[-1])])
        cums = np.concatenate(
            [np.arange(1.0, n + 1.0), np.full(pad, float(n))]
        )
    else:
        idx = np.round(np.linspace(0, n - 1, max_knots)).astype(np.int64)
        knots = sv[idx]
        cums = (idx + 1).astype(np.float64)
    return knots, cums


def _ecdf_counts(knots, cums, v):
    """Global (#{x < v_m}, #{x ≤ v_m}) from stacked host ECDFs.

    knots, cums: (H, K) per-host sorted knots / cumulative counts.
    v: (M,) query values. Exact when the knots are the full sorted shards.
    """
    less = np.zeros(v.shape, np.float64)
    leq = np.zeros(v.shape, np.float64)
    for h in range(knots.shape[0]):
        jl = np.searchsorted(knots[h], v, side="left")
        jr = np.searchsorted(knots[h], v, side="right")
        less += np.where(jl > 0, cums[h][np.maximum(jl - 1, 0)], 0.0)
        leq += np.where(jr > 0, cums[h][np.maximum(jr - 1, 0)], 0.0)
    return less, leq


def _merged_quantile(knots, cums, n_total, q):
    """np.quantile(..., method='linear') on the merged ECDF.

    knots, cums: (H, K). Exact (equals np.quantile on the concatenated
    data) when the knots are the full sorted shards.
    """
    weights = np.diff(cums, axis=1, prepend=0.0)  # padding gets weight 0
    vals = knots.ravel()
    wts = weights.ravel()
    order = np.argsort(vals, kind="stable")
    vals = vals[order]
    cumw = np.cumsum(wts[order])

    def order_stat(k):  # 1-based k-th order statistic
        return vals[np.searchsorted(cumw, k, side="left")]

    pos = q * (n_total - 1.0)  # 0-based fractional position
    lo = np.floor(pos)
    frac = pos - lo
    x_lo = order_stat(lo + 1.0)
    x_hi = order_stat(min(lo + 2.0, n_total))
    return x_lo + frac * (x_hi - x_lo)


def _gathered_ecdf(arr, gather_, max_knots):
    """Build this shard's per-parameter compressed ECDFs and gather them:
    one collective, returns (g_knots (H,P,K), g_cums (H,P,K), n_total)."""
    flat = arr.reshape(-1, arr.shape[-1])
    p = flat.shape[1]
    knots = np.empty((p, max_knots))
    cums = np.empty((p, max_knots))
    for i in range(p):
        knots[i], cums[i] = _local_ecdf(flat[:, i], max_knots)
    g_knots, g_cums, g_n = gather_(
        knots, cums, np.asarray(float(flat.shape[0]))
    )
    return g_knots, g_cums, float(g_n.sum())


def _global_normal_scores(arr, gather_, max_knots, pre=None):
    """(S, W_local, P) shard -> normal scores via GLOBAL average ranks
    (same (r − 0.375)/(N + 0.25) convention as the local rank normalizers).
    One gather collective — skipped when ``pre`` carries an ECDF already
    gathered for the same ``arr``. Returns (scores, ecdf)."""
    s, w, p = arr.shape
    flat = arr.reshape(-1, p)
    g_knots, g_cums, n_total = (
        pre if pre is not None else _gathered_ecdf(arr, gather_, max_knots)
    )
    from scipy import stats as _stats

    scores = np.empty_like(flat)
    for i in range(p):
        less, leq = _ecdf_counts(g_knots[:, i], g_cums[:, i], flat[:, i])
        rank = less + (leq - less + 1.0) / 2.0
        scores[:, i] = _stats.norm.ppf((rank - 0.375) / (n_total + 0.25))
    return scores.reshape(s, w, p), (g_knots, g_cums, n_total)


def global_ess_bulk(local_samples, window_scaling=4.0, max_knots=4096,
                    _reduce=None, _gather=None, _pre=None):
    """Whole-ensemble rank-normalized bulk ESS (Vehtari et al. 2021) from
    a per-host walker shard (collective: one ECDF gather + one reduce;
    equals ``analysis.ess_bulk`` on the full ensemble — exactly when
    S·W_local ≤ max_knots, else to ECDF resolution)."""
    arr = np.asarray(local_samples, np.float64)
    squeeze = arr.ndim == 2
    if squeeze:
        arr = arr[:, :, None]
    if arr.ndim != 3:
        raise ValueError("local_samples must be (S, W_local[, P])")
    gather_ = _gather if _gather is not None else _gather_hosts
    scores, _ = _global_normal_scores(arr, gather_, int(max_knots),
                                      pre=_pre)
    ess = np.atleast_1d(global_effective_sample_size(
        scores, window_scaling=window_scaling, _reduce=_reduce
    ))
    return float(ess[0]) if squeeze else ess


def global_ess_tail(local_samples, prob=0.05, window_scaling=4.0,
                    max_knots=4096, _reduce=None, _gather=None, _pre=None):
    """Whole-ensemble tail ESS: min over the ``prob``/``1−prob`` GLOBAL
    quantile indicator ESS (collective: one ECDF gather + two reduces;
    equals ``analysis.ess_tail`` on the full ensemble — exactly when
    S·W_local ≤ max_knots)."""
    arr = np.asarray(local_samples, np.float64)
    squeeze = arr.ndim == 2
    if squeeze:
        arr = arr[:, :, None]
    if arr.ndim != 3:
        raise ValueError("local_samples must be (S, W_local[, P])")
    s, w, p = arr.shape
    gather_ = _gather if _gather is not None else _gather_hosts
    g_knots, g_cums, n_total = (
        _pre if _pre is not None
        else _gathered_ecdf(arr, gather_, int(max_knots))
    )
    out = []
    for q in (prob, 1.0 - prob):
        cut = np.array([
            _merged_quantile(g_knots[:, i], g_cums[:, i], n_total, q)
            for i in range(p)
        ])
        ind = (arr <= cut[None, None, :]).astype(np.float64)
        out.append(np.atleast_1d(global_effective_sample_size(
            ind, window_scaling=window_scaling, _reduce=_reduce
        )))
    ess = np.minimum(*out)
    return float(ess[0]) if squeeze else ess


def global_rank_normalized_rhat(local_samples, max_knots=4096,
                                _reduce=None, _gather=None, _pre=None):
    """Whole-ensemble RANK-NORMALIZED split-R̂ (Vehtari et al. 2021) from a
    per-host walker shard (collective: one ECDF gather + one reduce; equals
    ``analysis.potential_scale_reduction(full, rank_normalized=True)`` —
    exactly when S·W_local ≤ max_knots). Complements
    :func:`global_split_rhat` (the classic non-normalized variant).

    ``_pre`` (a full-``arr`` gathered ECDF) is honored only when S is
    even — with an odd S the split path ranks the trimmed value set, which
    differs from the full one.
    """
    arr = np.asarray(local_samples, np.float64)
    squeeze = arr.ndim == 2
    if squeeze:
        arr = arr[:, :, None]
    if arr.ndim != 3:
        raise ValueError("local_samples must be (S, W_local[, P])")
    s_even = arr.shape[0] - arr.shape[0] % 2
    gather_ = _gather if _gather is not None else _gather_hosts
    # rank over the SAME value set the local split path sees (trim first:
    # splitting is a reshape, so ranks commute with it)
    pre = _pre if (s_even == arr.shape[0]) else None
    scores, _ = _global_normal_scores(arr[:s_even], gather_,
                                      int(max_knots), pre=pre)
    out = global_split_rhat(scores, _reduce=_reduce)
    return float(out[0]) if squeeze else out


def _merged_hdi(knots, cums, n_total, prob):
    """Shortest interval holding ``prob`` mass, from the merged ECDF.

    Same convention as ``analysis.hdi`` (keep = floor(prob·n) order
    statistics); exact when the knots are the full sorted shards.
    """
    weights = np.diff(cums, axis=1, prepend=0.0)
    vals = knots.ravel()
    wts = weights.ravel()
    order = np.argsort(vals, kind="stable")
    vals = vals[order]
    cumw = np.cumsum(wts[order])
    live = wts[order] > 0
    keep = max(1, int(np.floor(prob * n_total)))
    if keep >= n_total:
        raise ValueError(f"prob={prob} needs more than {n_total} draws")
    starts = np.concatenate([[0.0], cumw[:-1]])[live]  # rank before knot
    ends = starts + 1.0 + keep  # rank of the interval's upper endpoint
    ok = ends <= n_total
    starts_v = vals[live][ok]
    hi_idx = np.searchsorted(cumw, ends[ok], side="left")
    hi_v = vals[np.minimum(hi_idx, vals.size - 1)]
    i = int(np.argmin(hi_v - starts_v))
    return float(starts_v[i]), float(hi_v[i])


def global_mcse_mean(local_samples, window_scaling=4.0, _reduce=None):
    """Whole-ensemble Monte-Carlo standard error of the posterior mean
    (collective; equals ``analysis.mcse_mean`` on the full ensemble):
    global sd / sqrt(global ESS)."""
    arr = np.asarray(local_samples, np.float64)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    if arr.ndim != 3:
        raise ValueError("local_samples must be (S, W_local[, P])")
    reduce_ = _reduce if _reduce is not None else _sum_over_hosts
    flat = arr.reshape(-1, arr.shape[-1])
    n, sx, sxx = reduce_(
        np.asarray(float(flat.shape[0])), flat.sum(axis=0),
        (flat * flat).sum(axis=0),
    )
    sd = np.sqrt(np.maximum((sxx - sx * sx / n) / (n - 1.0), 0.0))
    ess = np.atleast_1d(global_effective_sample_size(
        arr, window_scaling=window_scaling, _reduce=_reduce
    ))
    out = sd / np.sqrt(np.maximum(ess, 1.0))
    return float(out[0]) if np.ndim(local_samples) == 2 else out


def global_summary(local_samples, prob=0.9, max_knots=4096,
                   window_scaling=4.0, _reduce=None, _gather=None):
    """Whole-ensemble posterior summary from a per-host walker shard —
    the collective counterpart of ``analysis.summary`` (same keys: mean,
    sd, median, central interval, HDI, ess, ess_bulk, ess_tail, rhat,
    mcse), replicated identically on every host.

    Moments come from exact moment partials; order statistics (median,
    quantiles, HDI) from the merged compressed ECDF (exact when
    S·W_local ≤ max_knots); the ESS family and rank-normalized R̂ from
    the decompositions above. Every host must call this collectively.
    """
    arr = np.asarray(local_samples, np.float64)
    if arr.ndim != 3:
        raise ValueError("local_samples must be (S, W_local, P)")
    s, w, p = arr.shape
    reduce_ = _reduce if _reduce is not None else _sum_over_hosts
    gather_ = _gather if _gather is not None else _gather_hosts
    flat = arr.reshape(-1, p)
    # ONE ECDF gather, reused for every order statistic AND the rank
    # normalization below (bulk/tail/rhat take it via _pre)
    pre = _gathered_ecdf(arr, gather_, int(max_knots))
    g_knots, g_cums, n_total = pre
    # exact moments
    n, sx, sxx = reduce_(
        np.asarray(float(flat.shape[0])), flat.sum(axis=0),
        (flat * flat).sum(axis=0),
    )
    mean = sx / n
    sd = np.sqrt(np.maximum((sxx - sx * sx / n) / (n - 1.0), 0.0))
    lo_q, hi_q = (1 - prob) / 2, 1 - (1 - prob) / 2
    qs = {q: np.empty(p) for q in (0.5, lo_q, hi_q)}
    hdi_lo = np.empty(p)
    hdi_hi = np.empty(p)
    for i in range(p):
        for q in qs:
            qs[q][i] = _merged_quantile(
                g_knots[:, i], g_cums[:, i], n_total, q
            )
        hdi_lo[i], hdi_hi[i] = _merged_hdi(
            g_knots[:, i], g_cums[:, i], n_total, prob
        )
    ess = np.atleast_1d(global_effective_sample_size(
        arr, window_scaling=window_scaling, _reduce=reduce_
    ))
    if s % 2 == 0:
        # one normal-scores pass feeds both bulk ESS and rank-R̂ (the
        # split path ranks the same value set when S is even)
        scores, _ = _global_normal_scores(arr, gather_, int(max_knots),
                                          pre=pre)
        bulk = np.atleast_1d(global_effective_sample_size(
            scores, window_scaling=window_scaling, _reduce=reduce_
        ))
        rhat = global_split_rhat(scores, _reduce=reduce_)
    else:
        bulk = np.atleast_1d(global_ess_bulk(
            arr, window_scaling=window_scaling, max_knots=max_knots,
            _reduce=reduce_, _gather=gather_, _pre=pre,
        ))
        rhat = global_rank_normalized_rhat(
            arr, max_knots=max_knots, _reduce=reduce_, _gather=gather_
        )
    tail = np.atleast_1d(global_ess_tail(
        arr, window_scaling=window_scaling, max_knots=max_knots,
        _reduce=reduce_, _gather=gather_, _pre=pre,
    ))
    return {
        "mean": mean,
        "sd": sd,
        "median": qs[0.5],
        f"q{round(lo_q * 100, 6):g}": qs[lo_q],
        f"q{round(hi_q * 100, 6):g}": qs[hi_q],
        "hdi_lo": hdi_lo,
        "hdi_hi": hdi_hi,
        "ess": ess,
        "ess_bulk": bulk,
        "ess_tail": tail,
        "rhat": rhat,
        "mcse": sd / np.sqrt(np.maximum(ess, 1.0)),
    }


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
