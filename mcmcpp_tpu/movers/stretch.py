"""Goodman–Weare stretch move, batched over the half-ensemble.

TPU-native rebuild of ``MCMCpp/Movers/StretchMove.h:100-117``: for every
active walker X, pick a random complementary walker Xk, draw z ~ g(z),
propose Y = Xk + z·(X − Xk), and accept with probability
min(1, z^{P-1}·p(Y)/p(X)). The per-walker loop of the reference becomes a
single gather + fused elementwise expression over ``(n_half, P)`` arrays.
"""

import jax
import jax.numpy as jnp

from mcmcpp_tpu.movers.base import Mover
from mcmcpp_tpu.ops.gw import gw_sample


class StretchMove(Mover):
    """Affine-invariant stretch move with scale parameter ``a`` (default 2)."""

    def __init__(self, a=2.0):
        self.a = float(a)

    def propose(self, key, active, other, state):
        n, p = active.shape
        m = other.shape[0]
        kj, kz = jax.random.split(key)
        # complementary pick ≙ MCMCpp/Movers/StretchMove.h:102 (getNonOffSetInt)
        j = jax.random.randint(kj, (n,), 0, m)
        partner = jnp.take(other, j, axis=0)
        u = jax.random.uniform(kz, (n,), active.dtype)
        z = gw_sample(u, self.a)
        proposal = partner + z[:, None] * (active - partner)
        # (P-1)·log z term ≙ StretchMove.h:110
        log_factor = (p - 1) * jnp.log(z)
        return proposal, log_factor
