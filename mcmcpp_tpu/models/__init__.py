"""Model / target-distribution library.

The reference ships its targets as example code (``test/sequential/
SkewedGaussian/Common/SkewedGaussian.h``); here they are first-class,
JAX-traceable, and carry their analytic ground truth for testing
(BASELINE.json configs: correlated Gaussian, Rosenbrock banana, multimodal
mixture, plus the reference's skewed Gaussian).
"""

from mcmcpp_tpu.models import gp
from mcmcpp_tpu.models import hmm
from mcmcpp_tpu.models import hsgp
from mcmcpp_tpu.models import lgss
from mcmcpp_tpu.models.targets import (
    Target,
    bayesian_linear_regression,
    correlated_gaussian,
    gaussian_mixture,
    logistic_regression,
    neal_funnel,
    rosenbrock,
    skewed_gaussian,
)

__all__ = [
    "gp",
    "hmm",
    "hsgp",
    "lgss",
    "Target",
    "bayesian_linear_regression",
    "correlated_gaussian",
    "gaussian_mixture",
    "logistic_regression",
    "neal_funnel",
    "rosenbrock",
    "skewed_gaussian",
]
