"""MAP estimation and Laplace (quadratic) posterior approximation.

North-star scope beyond the reference (its Calculator is derivative-free,
``MCMCpp/Utility/UserOjbectsTest.h:144-151``): with a JAX-traceable logp,
the posterior mode comes from BFGS (``jax.scipy.optimize``, multi-start
vmapped over initializations — one compiled program evaluating every start
in parallel on the chip) and the Laplace approximation
N(theta_map, (-H)^-1) from ``jax.hessian``. Useful on its own for cheap
posterior summaries, and as an initializer for samplers/ADVI.
"""

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
import jax.scipy.optimize  # noqa: F401  (registers the lazy submodule)


class MapResult(NamedTuple):
    position: jax.Array  # (P,) the best mode found
    logp: jax.Array  # scalar logp at the mode
    converged: jax.Array  # bool, BFGS success for the best start
    all_positions: jax.Array  # (n_starts, P) per-start optima
    all_logps: jax.Array  # (n_starts,)


class LaplaceResult(NamedTuple):
    mean: jax.Array  # (P,) == MAP
    covariance: jax.Array  # (P, P) inverse negative Hessian
    chol: jax.Array  # (P, P) lower Cholesky of covariance
    logp_mode: jax.Array
    log_evidence: jax.Array  # Laplace marginal-likelihood estimate


def find_map(logp_fn, x0, maxiter=500):
    """Maximize ``logp_fn`` from one or many starts.

    x0: (P,) or (n_starts, P). Multi-start runs as ONE vmapped BFGS — all
    starts advance in lockstep on-device; the best final logp wins.
    """
    x0 = jnp.atleast_2d(jnp.asarray(x0, jnp.result_type(float)))

    def neg(x):
        return -logp_fn(x)

    def solve_one(x):
        res = jax.scipy.optimize.minimize(
            neg, x, method="BFGS", options={"maxiter": int(maxiter)}
        )
        return res.x, -res.fun, res.success

    xs, lps, succ = jax.jit(jax.vmap(solve_one))(x0)
    lps_safe = jnp.where(jnp.isnan(lps), -jnp.inf, lps)
    best = jnp.argmax(lps_safe)
    return MapResult(
        position=xs[best], logp=lps[best], converged=succ[best],
        all_positions=xs, all_logps=lps,
    )


def laplace(logp_fn, x0=None, map_result=None, maxiter=500, jitter=0.0):
    """Laplace approximation N(theta_map, (-H)^-1) around the MAP.

    Provide either ``x0`` (find the MAP first) or a precomputed
    ``map_result``. ``jitter`` adds a diagonal ridge before inversion for
    barely-regular modes. ``log_evidence`` is the standard Laplace
    marginal likelihood: logp(mode) + P/2*log(2*pi) + 1/2*log|cov|.
    """
    if map_result is None:
        if x0 is None:
            raise ValueError("pass x0 or map_result")
        map_result = find_map(logp_fn, x0, maxiter=maxiter)
    mode = map_result.position
    h = jax.jit(jax.hessian(logp_fn))(mode)
    p = mode.shape[-1]
    prec = -(h + h.T) / 2.0 + jitter * jnp.eye(p, dtype=h.dtype)
    chol_prec = jnp.linalg.cholesky(prec)
    if bool(jnp.any(jnp.isnan(chol_prec))):
        raise ValueError(
            "negative Hessian is not positive definite at the mode found; "
            "the point is a saddle/ridge — try more starts or jitter > 0"
        )
    eye = jnp.eye(p, dtype=h.dtype)
    inv_chol = jax.scipy.linalg.solve_triangular(chol_prec, eye, lower=True)
    cov = inv_chol.T @ inv_chol
    # log|cov| = -log|prec| = -2*sum(log diag chol_prec)
    logdet_cov = -2.0 * jnp.sum(jnp.log(jnp.diagonal(chol_prec)))
    log_ev = (
        map_result.logp
        + 0.5 * p * jnp.log(2.0 * jnp.pi)
        + 0.5 * logdet_cov
    )
    return LaplaceResult(
        mean=mode, covariance=cov, chol=jnp.linalg.cholesky(cov),
        logp_mode=map_result.logp, log_evidence=log_ev,
    )


def laplace_sample(key, lap: LaplaceResult, n):
    """Draw ``n`` samples from a Laplace approximation."""
    z = jax.random.normal(key, (int(n), lap.mean.shape[-1]), lap.mean.dtype)
    return lap.mean[None, :] + z @ lap.chol.T


def laplace_summary(lap: LaplaceResult):
    """Posterior mean/sd dict (numpy) from a Laplace approximation."""
    return {
        "mean": np.asarray(lap.mean),
        "sd": np.sqrt(np.diagonal(np.asarray(lap.covariance))),
        "log_evidence": float(lap.log_evidence),
    }
