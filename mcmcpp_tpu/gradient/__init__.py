"""Gradient-based samplers (HMC / NUTS / MALA) over the same logp DSL.

The reference cannot have these — its Calculator contract is a black-box
``calcLogPostProb`` (``MCMCpp/Utility/UserOjbectsTest.h:144-151``) with no
derivatives. Because this framework's targets are JAX-traceable, gradients
come for free via ``jax.grad``, unlocking the north-star scope
(BASELINE.json): HMC with dual-averaging + diagonal mass adaptation,
iterative multinomial NUTS, and MALA, all vmapped over many chains so the
chain axis shards over the device mesh exactly like walker ensembles.
"""

from mcmcpp_tpu.gradient.barker import BarkerSampler, barker_kernel
from mcmcpp_tpu.gradient.chees import CheesHMCSampler, chees_batch_step
from mcmcpp_tpu.gradient.hmc import HMCSampler, hmc_kernel
from mcmcpp_tpu.gradient.mala import MALASampler, mala_kernel
from mcmcpp_tpu.gradient.mclmc import MAMSSampler, MCLMCSampler
from mcmcpp_tpu.gradient.meads import MEADSSampler, ghmc_fold_step
from mcmcpp_tpu.gradient.metric import DenseMassMatrix, dense_mass_from_cov
from mcmcpp_tpu.gradient.nuts import NUTSSampler, nuts_kernel
from mcmcpp_tpu.gradient.sgmcmc import SGHMCSampler, SGLDSampler

__all__ = [
    "BarkerSampler",
    "barker_kernel",
    "CheesHMCSampler",
    "chees_batch_step",
    "DenseMassMatrix",
    "dense_mass_from_cov",
    "HMCSampler",
    "hmc_kernel",
    "MALASampler",
    "mala_kernel",
    "MAMSSampler",
    "MCLMCSampler",
    "MEADSSampler",
    "ghmc_fold_step",
    "NUTSSampler",
    "nuts_kernel",
    "SGHMCSampler",
    "SGLDSampler",
]
