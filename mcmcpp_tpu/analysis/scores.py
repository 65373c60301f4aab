"""Proper scoring rules for predictive evaluation: CRPS and the energy
score, from ensemble (sample-based) forecasts.

Gneiting & Raftery (2007). A proper scoring rule is minimized in
expectation by the TRUE predictive distribution, so it evaluates
calibration AND sharpness together — the right way to compare the
framework's predictive outputs (``particle_forecast`` clouds,
``lgss.forecast`` draws, posterior-predictive samples) against realized
outcomes, where plain RMSE ignores the stated uncertainty entirely.

    CRPS(F, y) = E_F|X − y| − ½ E_F|X − X'|        (univariate)
    ES(F, y)   = E_F‖X − y‖ − ½ E_F‖X − X'‖        (multivariate)

No reference counterpart (jmatta1/MCMCpp has no predictive layer);
north-star scope completing the forecasting story: simulate
(`particle_forecast` / `lgss.forecast`) → score (here) → compare.

TPU-first shape: the univariate estimator uses the exact O(n log n)
sorted identity ``E|X−X'| = (2/n²) Σ_i (2i − n + 1) x_(i)`` — one sort
+ one weighted sum per location, batched over the location axis; the
energy score assembles from one (n, n) pairwise-distance Gram block
(MXU work) per location.
"""

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["crps_ensemble", "energy_score"]


def crps_ensemble(samples, observations):
    """CRPS per location from ensemble draws.

    samples : (..., N) predictive draws (trailing axis = ensemble).
    observations : (...,) realized outcomes, broadcast against the
        leading axes.

    Returns the (...,) per-location CRPS (lower is better), using the
    unbiased-for-CRPS fair form with the exact sorted pairwise term.
    """
    x = jnp.asarray(samples)
    y = jnp.asarray(observations)
    n = x.shape[-1]
    term1 = jnp.mean(jnp.abs(x - y[..., None]), axis=-1)
    xs = jnp.sort(x, axis=-1)
    i = jnp.arange(n, dtype=x.dtype)
    # E|X−X'| over the empirical measure: (2/n²) Σ_i (2i − n + 1) x_(i)
    pair = (2.0 / (n * n)) * jnp.sum((2.0 * i - n + 1.0) * xs, axis=-1)
    return term1 - 0.5 * pair


def energy_score(samples, observation):
    """Energy score (multivariate CRPS) from ensemble draws.

    samples : (N, D) joint predictive draws.
    observation : (D,) realized outcome.

    Returns a scalar (lower is better). Reduces to CRPS at D=1.
    """
    x = jnp.asarray(samples)
    y = jnp.asarray(observation)
    term1 = jnp.mean(jnp.linalg.norm(x - y[None, :], axis=-1))
    sq = jnp.sum(x * x, axis=1)
    d2 = jnp.maximum(sq[:, None] + sq[None, :] - 2.0 * (x @ x.T), 0.0)
    term2 = jnp.mean(jnp.sqrt(d2))
    return term1 - 0.5 * term2
