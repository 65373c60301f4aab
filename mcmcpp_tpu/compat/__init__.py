"""Compatibility shims for other ecosystems' APIs."""

from mcmcpp_tpu.compat.emcee import EnsembleSampler, State

__all__ = ["EnsembleSampler", "State"]
