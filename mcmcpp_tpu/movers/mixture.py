"""MixtureMover: draw one mover per step from a weighted list.

emcee-style move lists (its ``moves=[(m, w)]`` API); the reference supports
only one compile-time Mover template parameter. Each step picks a mover
with the given probabilities (shared across walkers — selection is
state-independent, so detailed balance holds for the mixture kernel) and
runs it via ``lax.switch`` so every branch stays compiled.
"""

import jax
import jax.numpy as jnp

from mcmcpp_tpu.movers.base import Mover


class MixtureMover(Mover):
    """``movers``: list of (Mover, weight) or plain Movers (equal weights)."""

    def __init__(self, movers):
        if not movers:
            raise ValueError("need at least one mover")
        pairs = [m if isinstance(m, tuple) else (m, 1.0) for m in movers]
        self.movers = [m for m, _ in pairs]
        w = jnp.asarray([float(wt) for _, wt in pairs])
        if jnp.any(w <= 0):
            raise ValueError("weights must be positive")
        self.log_weights = jnp.log(w / jnp.sum(w))
        if any(m.always_accept for m in self.movers):
            raise ValueError("diagnostic (always-accept) movers cannot be mixed")

    def init_state(self, n_params, dtype):
        return tuple(m.init_state(n_params, dtype) for m in self.movers)

    def update_half(self, key, active, active_logp, other, logp_fn, state,
                    beta=1.0):
        k_sel, k_mov = jax.random.split(key)
        idx = jax.random.categorical(k_sel, self.log_weights)
        branches = [
            (lambda args, m=m, s=s: m.update_half(
                args[0], args[1], args[2], args[3], logp_fn, s, beta=args[4]
            ))
            for m, s in zip(self.movers, state)
        ]
        return jax.lax.switch(
            idx, branches, (k_mov, active, active_logp, other,
                            jnp.asarray(beta, active.dtype)),
        )
