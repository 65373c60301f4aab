"""Low-level numerical ops: g(z) stretch distribution, RNG helpers."""

from mcmcpp_tpu.ops.gw import gw_sample, gw_logpdf
from mcmcpp_tpu.ops.random import split_for_step

__all__ = ["gw_sample", "gw_logpdf", "split_for_step"]
