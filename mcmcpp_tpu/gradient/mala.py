"""Metropolis-adjusted Langevin algorithm (MALA).

Proposal: Y = X + (ε²/2)·M⁻¹∇logp(X) + ε·M^{-1/2}·ξ, ξ ~ N(0, I), with the
asymmetric-proposal Hastings correction. One gradient per step; the cheap
end of the gradient-kernel family (HMC/NUTS share the driver in hmc.py).
"""

import jax
import jax.numpy as jnp

from mcmcpp_tpu.gradient.hmc import GradientSampler
from mcmcpp_tpu.gradient.metric import (
    mass_noise,
    mass_quad_inv,
    mass_velocity,
)


def mala_kernel(logp_fn):
    logp_grad_fn = jax.value_and_grad(logp_fn)

    def log_q(x_to, x_from, g_from, eps2, inv_mass):
        # q(x_to | x_from) ∝ exp(-||x_to - x_from - (eps²/2) M⁻¹ g||²_M / (2eps²))
        mean = x_from + 0.5 * eps2 * mass_velocity(inv_mass, g_from)
        d = x_to - mean
        return -mass_quad_inv(inv_mass, d) / (2.0 * eps2)

    def kernel(key, position, logp, grad, step_size, inv_mass):
        from mcmcpp_tpu.gradient.hmc import DIVERGENCE_THRESHOLD

        k_prop, k_acc = jax.random.split(key)
        eps2 = step_size**2
        z = jax.random.normal(k_prop, position.shape, position.dtype)
        proposal = (
            position
            + 0.5 * eps2 * mass_velocity(inv_mass, grad)
            + step_size * mass_noise(inv_mass, z)
        )
        lp_new, g_new = logp_grad_fn(proposal)
        log_ratio = (
            lp_new
            - logp
            + log_q(position, proposal, g_new, eps2, inv_mass)
            - log_q(proposal, position, grad, eps2, inv_mass)
        )
        log_ratio = jnp.where(jnp.isnan(log_ratio), -jnp.inf, log_ratio)
        diverging = log_ratio < -DIVERGENCE_THRESHOLD
        # pseudo-Hamiltonian with the whitened proposal noise as momentum
        # (keeps the (ap, acc, div, energy) info contract; E-BFMI is only
        # meaningful for the HMC family)
        energy = 0.5 * jnp.sum(z * z) - logp
        accept_prob = jnp.minimum(1.0, jnp.exp(log_ratio))
        log_u = -jax.random.exponential(k_acc, (), position.dtype)
        accept = log_u < log_ratio
        position = jnp.where(accept, proposal, position)
        logp = jnp.where(accept, lp_new, logp)
        grad = jnp.where(accept, g_new, grad)
        return (position, logp, grad), (accept_prob, accept, diverging, energy)

    return kernel


class MALASampler(GradientSampler):
    """MALA with dual-averaged step size (target accept ≈ 0.574 optimal)."""

    def __init__(self, *args, target_accept=0.574, **kwargs):
        kwargs["target_accept"] = target_accept
        super().__init__(*args, **kwargs)

    def _make_kernel(self):
        return mala_kernel(self.logp_fn)
