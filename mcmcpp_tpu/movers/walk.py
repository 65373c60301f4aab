"""Goodman–Weare walk move.

Rebuild of ``MCMCpp/Movers/WalkMove.h:101-186``: choose S complementary
walkers *without replacement*, then propose
Y = X + Σⱼ Nⱼ·(Xⱼ − X̄_S) with one scalar normal Nⱼ per selected walker.
The proposal is symmetric, so the Metropolis factor is 0.

The reference's per-walker Knuth selection sampling (WalkMove.h:130-150)
is replaced by the top-k-of-uniform-keys trick: drawing ``(n, m)`` uniforms
and taking each row's top-S indices yields a uniformly random S-subset per
active walker, fully vectorized (one ``lax.top_k`` on the VPU). Cost is
O(n·m), fine for ensemble sizes where the walk move is sensible; for very
large ensembles prefer StretchMove.
"""

import jax
import jax.numpy as jnp

from mcmcpp_tpu.movers.base import Mover


class WalkMove(Mover):
    """Walk move drawing ``n_samples`` complementary walkers (default 6,
    matching the reference tests, e.g.
    ``test/sequential/SkewedGaussian/WalkMove/src/main.cpp:35``)."""

    def __init__(self, n_samples=6):
        if n_samples < 2:
            raise ValueError("WalkMove requires n_samples >= 2")
        self.n_samples = int(n_samples)

    def propose(self, key, active, other, state):
        n, p = active.shape
        m = other.shape[0]
        s = self.n_samples
        if s > m:
            raise ValueError(
                f"WalkMove n_samples={s} exceeds complementary half size {m}"
            )
        kj, kn = jax.random.split(key)
        # uniform random S-subset per walker: top-S of iid uniform keys
        scores = jax.random.uniform(kj, (n, m))
        _, idx = jax.lax.top_k(scores, s)  # (n, s)
        xs = jnp.take(other, idx, axis=0)  # (n, s, p)
        center = jnp.mean(xs, axis=1, keepdims=True)  # (n, 1, p)
        # one scalar normal per selected walker ≙ WalkMove.h:155-186
        normals = jax.random.normal(kn, (n, s), active.dtype)
        step = jnp.einsum("ns,nsp->np", normals, xs - center)
        proposal = active + step
        return proposal, jnp.zeros((n,), active.dtype)
