"""Bridge sampling: log evidence from ANY sampler's posterior draws.

Meng & Wong (1996) optimal-bridge estimator with the iterative update,
run in log space (the numerics follow the bridgesampling R package,
Gronau et al. 2017). Unlike the dedicated evidence engines (nested, SMC,
power-posterior PT), this is a POST-PROCESSOR: hand it the draws you
already have from NUTS / ensemble / any engine plus the unnormalized log
posterior, and it returns log Z — no special run required.

Beyond-reference subsystem (jmatta1/MCMCpp has no evidence machinery;
SURVEY.md §2). Proposal: a Gaussian fitted to HALF the draws (the other
half feeds the bridge — splitting avoids the double-use bias noted by
Overstall & Forster 2010). Accuracy needs reasonable posterior/proposal
overlap: heavy tails or strong multimodality call for the dedicated
engines instead (``rel_ess`` in the result is the overlap diagnostic).
"""

import math
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp


class BridgeResult(NamedTuple):
    logz: float
    n_iter: int
    converged: bool
    rel_ess: float  # relative ESS of q1/q2 weights on proposal draws


def bridge_log_evidence(logpost_fn, draws, n_proposal=None, seed=0,
                        tol=1e-10, max_iter=1000):
    """log Z = log ∫ exp(logpost) from posterior draws.

    logpost_fn: (P,) -> scalar UNNORMALIZED log posterior (the same
        function the sampler targeted), JAX-traceable.
    draws: (N, P) approximately independent posterior draws (thin past
        the autocorrelation time first).
    n_proposal: Gaussian proposal draws (default: half of N).

    Returns :class:`BridgeResult`. ``converged=False`` or a tiny
    ``rel_ess`` (≪ 1/√N) means the proposal overlaps the posterior
    poorly — use more draws or a dedicated evidence engine.
    """
    draws = np.asarray(draws, np.float64)
    if draws.ndim != 2 or draws.shape[0] < 8:
        raise ValueError("draws must be (N >= 8, P)")
    n, p = draws.shape
    rng = np.random.default_rng(seed)
    perm = rng.permutation(n)
    fit, keep = draws[perm[: n // 2]], draws[perm[n // 2 :]]
    n1 = keep.shape[0]
    n2 = int(n_proposal) if n_proposal is not None else n1

    mu = fit.mean(axis=0)
    cov = np.cov(fit, rowvar=False).reshape(p, p)
    cov += 1e-10 * np.eye(p) * max(np.trace(cov) / p, 1e-30)
    chol = np.linalg.cholesky(cov)
    prop = mu[None, :] + rng.standard_normal((n2, p)) @ chol.T

    logdet = 2.0 * np.sum(np.log(np.diagonal(chol)))

    def logq2(x):
        w = np.linalg.solve(chol, (x - mu[None, :]).T)
        return (-0.5 * np.sum(w * w, axis=0)
                - 0.5 * (p * math.log(2 * math.pi) + logdet))

    logpost = jax.jit(jax.vmap(logpost_fn))
    lq1_keep = np.asarray(logpost(jnp.asarray(keep, jnp.float32)),
                          np.float64)
    lq1_prop = np.asarray(logpost(jnp.asarray(prop, jnp.float32)),
                          np.float64)
    l1 = lq1_keep - logq2(keep)  # log l on posterior draws
    l2 = lq1_prop - logq2(prop)  # log l on proposal draws
    finite2 = np.isfinite(l2)
    if not finite2.all():
        # proposal mass outside the posterior support contributes 0 to
        # the numerator sum but still counts in n2
        l2 = l2[finite2]
    if not np.isfinite(l1).all():
        raise ValueError(
            "logpost is non-finite at posterior draws — wrong function?"
        )

    log_s1 = math.log(n1 / (n1 + n2))
    log_s2 = math.log(n2 / (n1 + n2))
    # overlap diagnostic: relative ESS of importance weights q1/q2
    w = l2 - _lse(l2)
    rel_ess = float(np.exp(-_lse(2.0 * w)) / n2)

    log_r = float(np.median(l2)) if l2.size else float(np.median(l1))
    converged = False
    it = 0
    for it in range(1, int(max_iter) + 1):
        num = (_lse(l2 - np.logaddexp(log_s1 + l2, log_s2 + log_r))
               - math.log(n2)) if l2.size else -np.inf
        den = (_lse(-np.logaddexp(log_s1 + l1, log_s2 + log_r))
               - math.log(n1))
        new = num - den
        if abs(new - log_r) < tol:
            log_r = new
            converged = True
            break
        log_r = new
    return BridgeResult(float(log_r), it, converged, rel_ess)


def _lse(x):
    x = np.asarray(x, np.float64)
    if x.size == 0:
        return -np.inf
    m = np.max(x)
    if not np.isfinite(m):
        return m
    return float(m + np.log(np.sum(np.exp(x - m))))
