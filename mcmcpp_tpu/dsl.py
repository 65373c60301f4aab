"""Log-probability DSL: declarative models over the raw logp interface.

The reference's "model language" is a C++ Calculator class with a
``calcLogPostProb`` method (``MCMCpp/Utility/UserOjbectsTest.h:144-151``).
Every sampler here accepts a raw JAX-traceable ``logp(theta)`` the same
way; this module adds the declarative layer the north star calls a
"JAX-traced log-prob DSL": named parameters with priors and automatic
unconstraining transforms, composed with a likelihood, compiled to a flat
``logp`` usable by every engine (ensemble, HMC/NUTS/MALA, SMC, ADVI).

    model = (Model()
             .param("mu", Normal(0.0, 10.0))
             .param("sigma", HalfNormal(1.0))
             .likelihood(lambda p: jnp.sum(Normal(p["mu"], p["sigma"])
                                           .logpdf(data))))
    logp, dim, constrain = model.build()
    s = NUTSSampler(logp, n_chains=32, n_params=dim)
    ...
    posterior = constrain(s.get_samples(flat=True))  # dict of named draws

Sampling runs in unconstrained space (positive/interval parameters get
exp/sigmoid transforms with Jacobian corrections), which is what makes
gradient-based engines work out of the box on constrained models.
"""

import math

import numpy as np
import jax
import jax.numpy as jnp
from jax.scipy import stats as jstats


# -- transforms (unconstrained u -> constrained x, with log|dx/du|) ---------


class Identity:
    def forward(self, u):
        return u

    def inverse(self, x):
        return x

    def log_det(self, u):
        return jnp.zeros(jnp.shape(u))


class Exp:
    """u -> exp(u): positive support."""

    def forward(self, u):
        return jnp.exp(u)

    def inverse(self, x):
        return jnp.log(x)

    def log_det(self, u):
        return u


class Sigmoid:
    """u -> a + (b-a)·σ(u): interval support."""

    def __init__(self, a, b):
        self.a, self.b = float(a), float(b)

    def forward(self, u):
        return self.a + (self.b - self.a) * jax.nn.sigmoid(u)

    def inverse(self, x):
        p = (x - self.a) / (self.b - self.a)
        return jnp.log(p) - jnp.log1p(-p)

    def log_det(self, u):
        return (
            math.log(self.b - self.a)
            + jax.nn.log_sigmoid(u)
            + jax.nn.log_sigmoid(-u)
        )


# -- distributions -----------------------------------------------------------


class Distribution:
    """logpdf on the CONSTRAINED space; ``transform`` maps an unconstrained
    sampler coordinate onto the support."""

    transform = Identity()

    def logpdf(self, x):
        raise NotImplementedError

    def sample(self, key, shape=()):
        raise NotImplementedError


class Normal(Distribution):
    def __init__(self, loc=0.0, scale=1.0):
        self.loc, self.scale = loc, scale

    def logpdf(self, x):
        return jstats.norm.logpdf(x, self.loc, self.scale)

    def sample(self, key, shape=()):
        return self.loc + self.scale * jax.random.normal(key, shape)


class Laplace(Distribution):
    def __init__(self, loc=0.0, scale=1.0):
        self.loc, self.scale = loc, scale

    def logpdf(self, x):
        return jstats.laplace.logpdf(x, self.loc, self.scale)

    def sample(self, key, shape=()):
        return self.loc + self.scale * jax.random.laplace(key, shape)


class Cauchy(Distribution):
    def __init__(self, loc=0.0, scale=1.0):
        self.loc, self.scale = loc, scale

    def logpdf(self, x):
        return jstats.cauchy.logpdf(x, self.loc, self.scale)

    def sample(self, key, shape=()):
        return self.loc + self.scale * jax.random.cauchy(key, shape)


class StudentT(Distribution):
    def __init__(self, df, loc=0.0, scale=1.0):
        self.df, self.loc, self.scale = df, loc, scale

    def logpdf(self, x):
        return jstats.t.logpdf(x, self.df, self.loc, self.scale)

    def sample(self, key, shape=()):
        return self.loc + self.scale * jax.random.t(key, self.df, shape)


class HalfNormal(Distribution):
    transform = Exp()

    def __init__(self, scale=1.0):
        self.scale = scale

    def logpdf(self, x):
        return jnp.log(2.0) + jstats.norm.logpdf(x, 0.0, self.scale)

    def sample(self, key, shape=()):
        return jnp.abs(self.scale * jax.random.normal(key, shape))


class LogNormal(Distribution):
    transform = Exp()

    def __init__(self, loc=0.0, scale=1.0):
        self.loc, self.scale = loc, scale

    def logpdf(self, x):
        lx = jnp.log(x)
        return jstats.norm.logpdf(lx, self.loc, self.scale) - lx

    def sample(self, key, shape=()):
        return jnp.exp(self.loc + self.scale * jax.random.normal(key, shape))


class Exponential(Distribution):
    transform = Exp()

    def __init__(self, rate=1.0):
        self.rate = rate

    def logpdf(self, x):
        return jnp.log(self.rate) - self.rate * x

    def sample(self, key, shape=()):
        return jax.random.exponential(key, shape) / self.rate


class Gamma(Distribution):
    transform = Exp()

    def __init__(self, concentration, rate=1.0):
        self.concentration, self.rate = concentration, rate

    def logpdf(self, x):
        return jstats.gamma.logpdf(x, self.concentration, scale=1.0 / self.rate)

    def sample(self, key, shape=()):
        return jax.random.gamma(key, self.concentration, shape) / self.rate


class Beta(Distribution):
    transform = Sigmoid(0.0, 1.0)

    def __init__(self, a, b):
        self.a, self.b = a, b

    def logpdf(self, x):
        return jstats.beta.logpdf(x, self.a, self.b)

    def sample(self, key, shape=()):
        return jax.random.beta(key, self.a, self.b, shape)


class Uniform(Distribution):
    def __init__(self, low=0.0, high=1.0):
        self.low, self.high = float(low), float(high)
        self.transform = Sigmoid(self.low, self.high)

    def logpdf(self, x):
        in_support = (x >= self.low) & (x <= self.high)
        return jnp.where(
            in_support, -math.log(self.high - self.low), -jnp.inf
        )

    def sample(self, key, shape=()):
        return jax.random.uniform(
            key, shape, minval=self.low, maxval=self.high
        )


# -- model -------------------------------------------------------------------


class Model:
    """Named parameters with priors + a likelihood over them.

    ``param(name, dist, shape=())`` declares a parameter block;
    ``likelihood(fn)`` takes ``fn(params: dict) -> scalar log-likelihood``
    (omit for prior-only models). ``build()`` compiles to
    ``(logp, dim, constrain)``: flat unconstrained logp for any sampler,
    total dimension, and a vectorized map from flat draws back to named
    constrained values.
    """

    def __init__(self):
        self._params = []  # (name, dist, shape, size)
        self._loglike = None

    def param(self, name, dist, shape=()):
        if any(n == name for n, *_ in self._params):
            raise ValueError(f"duplicate parameter {name!r}")
        if not isinstance(shape, (tuple, list)):
            shape = (shape,)
        shape = tuple(int(s) for s in shape)
        size = int(np.prod(shape)) if shape else 1
        self._params.append((name, dist, shape, size))
        return self

    def likelihood(self, fn):
        self._loglike = fn
        return self

    @property
    def dim(self):
        return sum(size for *_, size in self._params)

    def build(self):
        """Returns (logp, dim, constrain).

        The returned closures snapshot the parameter list: mutating the
        Model afterwards (adding params) does NOT affect an already-built
        logp — rebuild to pick up changes.
        """
        if not self._params:
            raise ValueError("model has no parameters")
        params = tuple(self._params)
        loglike = self._loglike
        dim = sum(size for *_, size in params)

        def unpack(theta):
            """flat unconstrained (D,) -> ({name: constrained}, log|J|)."""
            out = {}
            logdet = 0.0
            i = 0
            for name, dist, shape, size in params:
                u = theta[i : i + size].reshape(shape) if shape else theta[i]
                t = dist.transform
                out[name] = t.forward(u)
                logdet = logdet + jnp.sum(t.log_det(u))
                i += size
            return out, logdet

        def logp(theta):
            values, logdet = unpack(theta)
            lp = logdet
            for name, dist, shape, size in params:
                lp = lp + jnp.sum(dist.logpdf(values[name]))
            if loglike is not None:
                lp = lp + loglike(values)
            return lp

        def constrain(flat_draws):
            """(N, D) unconstrained draws -> {name: (N, *shape)} arrays."""
            arr = jnp.atleast_2d(jnp.asarray(flat_draws))
            out = jax.vmap(lambda t: unpack(t)[0])(arr)
            return {k: np.asarray(v) for k, v in out.items()}

        return logp, dim, constrain

    def prior_sample(self, key, n):
        """(n, D) UNCONSTRAINED draws from the priors (SMC-ready)."""
        cols = []
        for j, (name, dist, shape, size) in enumerate(self._params):
            k = jax.random.fold_in(key, j)
            x = dist.sample(k, (n,) + shape if shape else (n,))
            u = dist.transform.inverse(x)
            cols.append(u.reshape(n, size))
        return jnp.concatenate(cols, axis=1)
