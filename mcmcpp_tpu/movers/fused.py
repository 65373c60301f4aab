"""FusedStretchMove: stretch move backed by the Pallas fused kernel.

Same proposal/acceptance math as :class:`~mcmcpp_tpu.movers.stretch.
StretchMove` in roll mode, executed as one fused VMEM pass
(ops/pallas_stretch.py). EXPERIMENTAL: currently measured SLOWER than the
default XLA path (see ops/pallas_stretch.py docstring for numbers) — use
the default StretchMove for production throughput.
"""

import jax
import jax.numpy as jnp

from mcmcpp_tpu.movers.base import Mover
from mcmcpp_tpu.ops.pallas_stretch import fused_stretch_half


class FusedStretchMove(Mover):
    def __init__(self, a=2.0, tile=1024, interpret="auto"):
        self.a = float(a)
        self.tile = int(tile)
        # Pallas compiles for TPU only; interpret elsewhere. NOTE: the
        # interpreter's prng_random_bits returns zeros — interpret mode
        # exercises plumbing/shape logic only, never sampling statistics.
        if interpret == "auto":
            interpret = jax.default_backend() != "tpu"
        self.interpret = bool(interpret)

    def update_half(self, key, active, active_logp, other, logp_fn, state,
                    beta=1.0):
        if not (isinstance(beta, (int, float)) and float(beta) == 1.0):
            raise NotImplementedError(
                "FusedStretchMove does not support tempered acceptance "
                "(beta != 1); use StretchMove for parallel tempering"
            )
        return fused_stretch_half(
            key, active, active_logp, other,
            a=self.a, logp_fn=logp_fn, tile=self.tile,
            interpret=self.interpret,
        )
