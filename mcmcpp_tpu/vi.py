"""Variational inference: mean-field and full-rank ADVI via optax.

North-star scope (no reference counterpart). Fits a Gaussian
q(θ) = N(μ, Σ) — Σ diagonal (mean-field) or dense via a Cholesky factor
(full-rank) — by maximizing the reparameterized ELBO

    E_q[logp(θ)] + H[q],  θ = μ + L·ε, ε ~ N(0, I)

with Adam. The Monte-Carlo batch axis is vmapped, so ELBO gradients are one
fused XLA program; batch size and step count are static scan bounds.
"""

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
import optax


class MeanFieldParams(NamedTuple):
    mu: jax.Array  # (P,)
    log_sigma: jax.Array  # (P,)


class FullRankParams(NamedTuple):
    mu: jax.Array  # (P,)
    chol_raw: jax.Array  # (P, P) lower triangle; diag through softplus-ish exp


def _sample_meanfield(params, eps):
    return params.mu + jnp.exp(params.log_sigma) * eps


def _entropy_meanfield(params):
    p = params.mu.shape[0]
    return jnp.sum(params.log_sigma) + 0.5 * p * (1.0 + jnp.log(2 * jnp.pi))


def _chol(params: FullRankParams):
    p = params.mu.shape[0]
    tril = jnp.tril(params.chol_raw, -1)
    diag = jnp.exp(jnp.diag(params.chol_raw))
    return tril + jnp.diag(diag)


def _sample_fullrank(params, eps):
    return params.mu + _chol(params) @ eps


def _entropy_fullrank(params):
    p = params.mu.shape[0]
    return jnp.sum(jnp.diag(params.chol_raw)) + 0.5 * p * (
        1.0 + jnp.log(2 * jnp.pi)
    )


class ADVI:
    """Automatic differentiation VI on a JAX-traceable logp.

    Parameters
    ----------
    logp_fn : (P,) -> scalar unnormalized log-posterior.
    n_params : dimension P.
    full_rank : fit a dense covariance (default False = mean-field).
    n_mc : Monte-Carlo samples per ELBO gradient (default 16).
    mesh : optional ``jax.sharding.Mesh`` — shards the Monte-Carlo sample
        axis over the mesh (the variational params and their Adam state
        stay replicated; per-sample logp evaluations partition, and the
        ELBO mean / gradient reductions become psums over the mesh). Use
        ``n_mc`` a multiple of the mesh size.
    """

    def __init__(self, logp_fn, n_params, full_rank=False, n_mc=16,
                 learning_rate=1e-2, seed=0, dtype=jnp.float32, mesh=None):
        self.logp_fn = logp_fn
        self.n_params = int(n_params)
        self.full_rank = bool(full_rank)
        self.n_mc = int(n_mc)
        self.dtype = dtype
        self.mesh = mesh
        self._mc_sharding = None
        if mesh is not None:
            from mcmcpp_tpu.parallel.mesh import walker_sharding

            self._mc_sharding = walker_sharding(mesh)
        self._key = jax.random.key(seed)
        self.opt = optax.adam(learning_rate)
        p = self.n_params
        if full_rank:
            self.params = FullRankParams(
                mu=jnp.zeros((p,), dtype),
                chol_raw=jnp.zeros((p, p), dtype),
            )
            self._sample, self._entropy = _sample_fullrank, _entropy_fullrank
        else:
            self.params = MeanFieldParams(
                mu=jnp.zeros((p,), dtype), log_sigma=jnp.zeros((p,), dtype)
            )
            self._sample, self._entropy = _sample_meanfield, _entropy_meanfield
        self.opt_state = self.opt.init(self.params)
        self.elbo_trace = []
        self._fit_cache = {}

    def _neg_elbo(self, params, key):
        eps = jax.random.normal(key, (self.n_mc, self.n_params), self.dtype)
        if self._mc_sharding is not None:
            # shard the MC-sample axis: per-sample logp partitions over the
            # mesh; the mean below lowers to a psum
            eps = jax.lax.with_sharding_constraint(eps, self._mc_sharding)
        thetas = jax.vmap(lambda e: self._sample(params, e))(eps)
        e_logp = jnp.mean(jax.vmap(self.logp_fn)(thetas))
        return -(e_logp + self._entropy(params))

    def fit(self, n_steps=1000):
        """Run ``n_steps`` Adam updates; appends mean ELBO per 10% chunk."""
        fn = self._fit_cache.get(n_steps)
        if fn is None:

            def scan_fit(params, opt_state, key):
                def body(carry, i):
                    params, opt_state = carry
                    k = jax.random.fold_in(key, i)
                    loss, grads = jax.value_and_grad(self._neg_elbo)(params, k)
                    updates, opt_state = self.opt.update(grads, opt_state, params)
                    params = optax.apply_updates(params, updates)
                    return (params, opt_state), loss

                return jax.lax.scan(
                    body, (params, opt_state), jnp.arange(n_steps)
                )

            fn = jax.jit(scan_fit)
            self._fit_cache[n_steps] = fn
        self._key, k = jax.random.split(self._key)
        (self.params, self.opt_state), losses = fn(
            self.params, self.opt_state, k
        )
        self.elbo_trace.extend((-np.asarray(losses)).tolist())
        return self

    # -- posterior access ---------------------------------------------------

    @property
    def mean(self):
        return np.asarray(self.params.mu)

    @property
    def cov(self):
        if self.full_rank:
            L = np.asarray(_chol(self.params))
            return L @ L.T
        sig = np.exp(np.asarray(self.params.log_sigma))
        return np.diag(sig**2)

    def sample(self, n, seed=None):
        """Draw n posterior-approximation samples (n, P). Successive calls
        draw fresh samples (the internal key advances)."""
        if seed is None:
            self._key, key = jax.random.split(self._key)
        else:
            key = jax.random.key(seed)
        key = jax.random.fold_in(key, 0x5A11)
        eps = jax.random.normal(key, (n, self.n_params), self.dtype)
        return np.asarray(jax.vmap(lambda e: self._sample(self.params, e))(eps))
