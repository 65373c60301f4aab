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
import jax.scipy.linalg  # noqa: F401  (registers the lazy submodule)
import jax.scipy.special  # noqa: F401
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


class LowerBound:
    """u -> lo + exp(u): support (lo, inf)."""

    def __init__(self, lo):
        self.lo = float(lo)

    def forward(self, u):
        return self.lo + jnp.exp(u)

    def inverse(self, x):
        return jnp.log(x - self.lo)

    def log_det(self, u):
        return u


class UpperBound:
    """u -> hi - exp(u): support (-inf, hi)."""

    def __init__(self, hi):
        self.hi = float(hi)

    def forward(self, u):
        return self.hi - jnp.exp(u)

    def inverse(self, x):
        return jnp.log(self.hi - x)

    def log_det(self, u):
        return u


class Ordered:
    """u -> strictly increasing vector over the LAST axis:
    ``x_1 = u_1, x_k = x_{k-1} + exp(u_k)`` (Stan's ordered type — the
    standard identifiability constraint for mixture locations).

    The implied prior is the declared iid prior RESTRICTED to the ordered
    region; ``log_norm`` supplies its normalizer log K! so evidence
    engines see a proper density, and ``inverse_sample`` draws from it
    exactly by sorting iid base draws (order statistics)."""

    def forward(self, u):
        inc = jnp.concatenate([u[..., :1], jnp.exp(u[..., 1:])], axis=-1)
        return jnp.cumsum(inc, axis=-1)

    def inverse(self, x):
        return jnp.concatenate(
            [x[..., :1], jnp.log(jnp.diff(x, axis=-1))], axis=-1
        )

    def inverse_sample(self, key, x):
        """Unsorted iid base draws -> exact restricted-prior draws: the
        order statistics of K iid draws ARE a draw from the base density
        restricted (and renormalized) to the ordered region. Applying
        ``inverse`` to unsorted draws instead yields NaN columns
        (log of negative differences)."""
        del key  # deterministic given the base draws
        return self.inverse(jnp.sort(x, axis=-1))

    def log_det(self, u):
        return jnp.concatenate(
            [jnp.zeros_like(u[..., :1]), u[..., 1:]], axis=-1
        )

    def log_norm(self, u):
        """log K! per ordered vector: the restricted prior's normalizer
        (the ordered region has base-measure 1/K!). Without it, evidence
        engines fed an ordered prior return log Z biased by -log K!."""
        k = u.shape[-1]
        return jax.scipy.special.gammaln(k + 1.0) * jnp.ones(u.shape[:-1])

    def unconstrained_shape(self, shape):
        if not shape:
            raise ValueError(
                "ordered() requires a vector-shaped parameter "
                "(shape with at least one axis)"
            )
        return tuple(shape)


def ordered(dist):
    """Impose the :class:`Ordered` constraint on a vector-shaped
    continuous prior: the sampler works in unconstrained increment
    coordinates while ``dist.logpdf`` scores the ordered vector (the
    base prior restricted to the ordered region, Stan-style)::

        Model().param("locs", ordered(Normal(0.0, 5.0)), shape=(K,))
    """
    import copy

    d = copy.copy(dist)
    d.transform = Ordered()
    return d


class Circular:
    """u (…, 2) -> angle in (-π, π] via atan2 — Stan's unit-vector trick.

    A bounded-interval transform puts a cut at ±π (a posterior straddling
    it splits into two lobes); embedding the circle in R² has no cut. The
    ``log_det`` term is the auxiliary radial density −‖u‖²/2 (any proper
    radial law works; the Gaussian makes u|θ standard normal), under
    which the implied marginal of θ is EXACTLY the declared distribution
    — so inference and evidence are both correct.
    """

    def forward(self, u):
        return jnp.arctan2(u[..., 1], u[..., 0])

    def inverse(self, x):
        # deterministic section (r = 1); prior draws for the evidence
        # engines come from inverse_sample, which also draws the radius
        return jnp.stack([jnp.cos(x), jnp.sin(x)], axis=-1)

    def inverse_sample(self, key, x):
        """Map a constrained draw to u-space INCLUDING the auxiliary
        radius r ~ Rayleigh, so u is an exact draw from the implied
        unconstrained prior density (build_split's prior_sample)."""
        r = jnp.sqrt(2.0 * jax.random.exponential(key, jnp.shape(x)))
        return r[..., None] * self.inverse(x)

    def log_det(self, u):
        return -0.5 * jnp.sum(u * u, axis=-1)

    def unconstrained_shape(self, shape):
        return tuple(shape) + (2,)


class StickBreaking:
    """R^{K-1} -> interior of the K-simplex (Stan's stick-breaking map).

    z_i = sigmoid(u_i - log(K-1-i)), x_i = z_i * (remaining stick); the
    offset makes u = 0 map to the uniform simplex center. ``log_det`` is
    wrt the first K-1 coordinates (the simplex's intrinsic dimension):
    the Jacobian is triangular with diag s_i * z_i * (1 - z_i).
    """

    def __init__(self, k):
        self.k = int(k)
        if self.k < 2:
            raise ValueError("simplex needs K >= 2")

    def unconstrained_shape(self, shape):
        if tuple(shape) != (self.k,):
            raise ValueError(
                f"StickBreaking({self.k}) requires shape ({self.k},), "
                f"got {tuple(shape)}"
            )
        return (self.k - 1,)

    def _offsets(self, dtype):
        return jnp.log(jnp.arange(self.k - 1, 0, -1).astype(dtype))

    def forward(self, u):
        z = jax.nn.sigmoid(u - self._offsets(u.dtype))
        stick = jnp.cumprod(1.0 - z, axis=-1)
        s = jnp.concatenate(
            [jnp.ones_like(stick[..., :1]), stick[..., :-1]], axis=-1
        )
        head = z * s
        return jnp.concatenate([head, stick[..., -1:]], axis=-1)

    def inverse(self, x):
        head = x[..., :-1]
        csum = jnp.cumsum(head, axis=-1)
        s = jnp.concatenate(
            [jnp.ones_like(csum[..., :1]), 1.0 - csum[..., :-1]], axis=-1
        )
        z = head / s
        return jnp.log(z) - jnp.log1p(-z) + self._offsets(x.dtype)

    def log_det(self, u):
        z = jax.nn.sigmoid(u - self._offsets(u.dtype))
        stick = jnp.cumprod(1.0 - z, axis=-1)
        s = jnp.concatenate(
            [jnp.ones_like(stick[..., :1]), stick[..., :-1]], axis=-1
        )
        return jnp.sum(
            jnp.log(z) + jnp.log1p(-z) + jnp.log(s), axis=-1
        )


class CorrCholesky:
    """R^{K(K-1)/2} -> lower-Cholesky factor of a correlation matrix.

    Stan's canonical-partial-correlation construction: z = tanh(u) fills
    the strict lower triangle row-wise; row i is built so its norm is 1:
    L[i,j] = z_ij * sqrt(1 - sum_{k<j} L[i,k]^2), L[i,i] closes the row.
    ``log_det`` (wrt the intrinsic K(K-1)/2 coordinates) is the tanh
    Jacobian plus half-log of each remaining row mass.
    """

    def __init__(self, k):
        self.k = int(k)
        if self.k < 2:
            raise ValueError("correlation matrix needs K >= 2")

    def unconstrained_shape(self, shape):
        if tuple(shape) != (self.k, self.k):
            raise ValueError(
                f"CorrCholesky({self.k}) requires shape "
                f"({self.k}, {self.k}), got {tuple(shape)}"
            )
        return (self.k * (self.k - 1) // 2,)

    def _tril(self):
        # flat layout is row-major over the strict lower triangle, matching
        # the (1,0),(2,0),(2,1),... order of jnp.tril_indices(k, -1)
        return jnp.tril_indices(self.k, -1)

    def _exclusive_mass(self, z):
        """mass[..., i, j] = prod_{k<j} (1 - z[i,k]^2) for a (…, K, K)
        strict-lower-triangular z (entries outside the triangle are 0, so
        their factor is 1). The sequential row recursion
        mass_j = mass_{j-1}·(1 - z_j²) telescopes to this exclusive
        cumprod — one vector op instead of an O(K²) unrolled Python loop
        (round-1 VERDICT weak-item 8)."""
        c = 1.0 - z * z
        cp = jnp.cumprod(c, axis=-1)
        return jnp.concatenate(
            [jnp.ones_like(cp[..., :1]), cp[..., :-1]], axis=-1
        )

    def _embed(self, z_flat):
        """(…, K(K-1)/2) flat coords -> (…, K, K) strict lower triangle."""
        rows, cols = self._tril()
        z = jnp.zeros(z_flat.shape[:-1] + (self.k, self.k), z_flat.dtype)
        return z.at[..., rows, cols].set(z_flat)

    def _rows(self, z_flat):
        """Build L from flat partial correlations; batch-aware."""
        z = self._embed(z_flat)
        mass = self._exclusive_mass(z)
        # off-diagonal: L[i,j] = z_ij·sqrt(mass_ij); diagonal closes the
        # unit row norm: L[i,i] = sqrt(mass_ii) (z is zero on the diagonal
        # so the two terms never overlap)
        return (z + jnp.eye(self.k, dtype=z.dtype)) * jnp.sqrt(mass)

    def forward(self, u):
        return self._rows(jnp.tanh(u))

    def inverse(self, L):
        # batch-aware (leading axes broadcast): prior_sample feeds (n, K, K)
        L = jnp.asarray(L)
        rows, cols = self._tril()
        tri = jnp.zeros_like(L).at[..., rows, cols].set(L[..., rows, cols])
        sq = tri * tri
        mass = 1.0 - (jnp.cumsum(sq, axis=-1) - sq)  # 1 - Σ_{k<j} L[i,k]²
        z = L[..., rows, cols] / jnp.sqrt(mass[..., rows, cols])
        return jnp.arctanh(z)

    def log_det(self, u):
        z_flat = jnp.tanh(u)
        # tanh jacobian: log(1 - z^2) per coordinate
        ld = jnp.sum(jnp.log1p(-z_flat * z_flat), axis=-1)
        z = self._embed(z_flat)
        rows, cols = self._tril()
        half_log_mass = 0.5 * jnp.log(self._exclusive_mass(z))
        return ld + jnp.sum(half_log_mass[..., rows, cols], axis=-1)


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

    def cdf(self, x):
        return jstats.norm.cdf(x, self.loc, self.scale)

    def log_cdf(self, x):
        return jstats.norm.logcdf(x, self.loc, self.scale)

    def log_sf(self, x):
        # symmetry: P(X > x) = Phi(-(x - loc)/scale), exact in the tail
        # where float32 cdf rounds to 1
        return jstats.norm.logcdf(-(x - self.loc) / self.scale)

    def sample(self, key, shape=()):
        return self.loc + self.scale * jax.random.normal(key, shape)


class Laplace(Distribution):
    def __init__(self, loc=0.0, scale=1.0):
        self.loc, self.scale = loc, scale

    def logpdf(self, x):
        return jstats.laplace.logpdf(x, self.loc, self.scale)

    def cdf(self, x):
        z = (x - self.loc) / self.scale
        return jnp.where(
            z < 0, 0.5 * jnp.exp(z), 1.0 - 0.5 * jnp.exp(-z)
        )

    def sample(self, key, shape=()):
        return self.loc + self.scale * jax.random.laplace(key, shape)


class Cauchy(Distribution):
    def __init__(self, loc=0.0, scale=1.0):
        self.loc, self.scale = loc, scale

    def logpdf(self, x):
        return jstats.cauchy.logpdf(x, self.loc, self.scale)

    def cdf(self, x):
        z = (x - self.loc) / self.scale
        return 0.5 + jnp.arctan(z) / jnp.pi

    def sample(self, key, shape=()):
        return self.loc + self.scale * jax.random.cauchy(key, shape)


class StudentT(Distribution):
    def __init__(self, df, loc=0.0, scale=1.0):
        self.df, self.loc, self.scale = df, loc, scale

    def logpdf(self, x):
        return jstats.t.logpdf(x, self.df, self.loc, self.scale)

    def cdf(self, x):
        z = (x - self.loc) / self.scale
        w = self.df / (self.df + z * z)
        tail = 0.5 * jax.scipy.special.betainc(
            jnp.asarray(self.df) / 2.0, 0.5, w
        )
        return jnp.where(z > 0, 1.0 - tail, tail)

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


class HalfCauchy(Distribution):
    """Half-Cauchy on (0, inf) — the standard weakly-informative scale
    prior (Gelman 2006)."""

    transform = Exp()

    def __init__(self, scale=1.0):
        self.scale = scale

    def logpdf(self, x):
        return jnp.log(2.0) + jstats.cauchy.logpdf(x, 0.0, self.scale)

    def sample(self, key, shape=()):
        return jnp.abs(self.scale * jax.random.cauchy(key, shape))


class LogNormal(Distribution):
    transform = Exp()

    def __init__(self, loc=0.0, scale=1.0):
        self.loc, self.scale = loc, scale

    def logpdf(self, x):
        lx = jnp.log(x)
        return jstats.norm.logpdf(lx, self.loc, self.scale) - lx

    def cdf(self, x):
        return jstats.norm.cdf(
            jnp.log(jnp.maximum(x, 1e-38)), self.loc, self.scale
        )

    def sample(self, key, shape=()):
        return jnp.exp(self.loc + self.scale * jax.random.normal(key, shape))


class Exponential(Distribution):
    transform = Exp()

    def __init__(self, rate=1.0):
        self.rate = rate

    def logpdf(self, x):
        return jnp.log(self.rate) - self.rate * x

    def cdf(self, x):
        return -jnp.expm1(-self.rate * jnp.maximum(x, 0.0))

    def log_sf(self, x):
        return -self.rate * jnp.maximum(x, 0.0)

    def sample(self, key, shape=()):
        return jax.random.exponential(key, shape) / self.rate


class Gamma(Distribution):
    transform = Exp()

    def __init__(self, concentration, rate=1.0):
        self.concentration, self.rate = concentration, rate

    def logpdf(self, x):
        return jstats.gamma.logpdf(x, self.concentration, scale=1.0 / self.rate)

    def cdf(self, x):
        return jax.scipy.special.gammainc(
            self.concentration, self.rate * jnp.maximum(x, 0.0)
        )

    def sample(self, key, shape=()):
        return jax.random.gamma(key, self.concentration, shape) / self.rate


class Beta(Distribution):
    transform = Sigmoid(0.0, 1.0)

    def __init__(self, a, b):
        self.a, self.b = a, b

    def logpdf(self, x):
        return jstats.beta.logpdf(x, self.a, self.b)

    def cdf(self, x):
        return jax.scipy.special.betainc(
            self.a, self.b, jnp.clip(x, 0.0, 1.0)
        )

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

    def cdf(self, x):
        return jnp.clip(
            (x - self.low) / (self.high - self.low), 0.0, 1.0
        )

    def sample(self, key, shape=()):
        return jax.random.uniform(
            key, shape, minval=self.low, maxval=self.high
        )


class Truncated(Distribution):
    """Continuous base distribution truncated to [low, high].

    ``logpdf`` renormalizes by log(F(high) - F(low)) using the base's
    ``cdf`` (Normal, Laplace, Cauchy, StudentT, Exponential, Gamma, Beta,
    LogNormal, Uniform provide one) and is -inf outside the bounds.
    The sampler-side ``transform`` maps the unconstrained coordinate onto
    the truncated support with the correct Jacobian (Sigmoid for two-sided,
    exp-shift for one-sided), so NUTS/HMC sample truncated priors out of
    the box. ``sample`` draws exactly by inverse-CDF (bisection on the
    base cdf — fixed-iteration, jit/vmap-safe).

    Usable both as a ``param`` prior and at ``observe`` sites (truncated
    likelihoods, e.g. detection-limited data).
    """

    def __init__(self, base, low=None, high=None):
        if low is None and high is None:
            raise ValueError("pass at least one of low=/high=")
        if not hasattr(base, "cdf"):
            raise ValueError(
                f"{type(base).__name__} has no cdf(); truncation needs one"
            )
        if isinstance(base.transform, (StickBreaking, CorrCholesky)):
            raise ValueError("cannot truncate a multivariate-support prior")
        self.base = base
        self.low = None if low is None else float(low)
        self.high = None if high is None else float(high)
        if self.low is not None and self.high is not None:
            if not self.low < self.high:
                raise ValueError("need low < high")
            self.transform = Sigmoid(self.low, self.high)
        elif self.low is not None:
            self.transform = LowerBound(self.low)
        else:
            self.transform = UpperBound(self.high)

    def _log_z(self):
        f_lo = 0.0 if self.low is None else self.base.cdf(self.low)
        f_hi = 1.0 if self.high is None else self.base.cdf(self.high)
        return jnp.log(jnp.maximum(f_hi - f_lo, 1e-38)), f_lo, f_hi

    def logpdf(self, x):
        log_z, _, _ = self._log_z()
        lp = self.base.logpdf(x) - log_z
        if self.low is not None:
            lp = jnp.where(x >= self.low, lp, -jnp.inf)
        if self.high is not None:
            lp = jnp.where(x <= self.high, lp, -jnp.inf)
        return lp

    def cdf(self, x):
        _, f_lo, f_hi = self._log_z()
        c = (self.base.cdf(x) - f_lo) / jnp.maximum(f_hi - f_lo, 1e-38)
        return jnp.clip(c, 0.0, 1.0)

    def _bracket(self):
        """Finite search bracket covering the truncated support: missing
        bounds are replaced by extreme base quantiles via 60 doubling steps
        (static count — jit-safe)."""
        lo = self.low
        hi = self.high
        anchor = lo if lo is not None else hi
        if lo is None:
            lo = anchor - 1.0
            for _ in range(60):
                lo = jnp.where(self.base.cdf(lo) > 1e-9,
                               anchor - 2.0 * (anchor - lo), lo)
        if hi is None:
            hi = anchor + 1.0
            for _ in range(60):
                hi = jnp.where(self.base.cdf(hi) < 1.0 - 1e-9,
                               anchor + 2.0 * (hi - anchor), hi)
        return jnp.asarray(lo, jnp.float32), jnp.asarray(hi, jnp.float32)

    def sample(self, key, shape=()):
        _, f_lo, f_hi = self._log_z()
        u = jax.random.uniform(key, shape, minval=1e-7, maxval=1.0 - 1e-7)
        target = f_lo + u * (f_hi - f_lo)
        lo, hi = self._bracket()
        lo = jnp.broadcast_to(lo, shape)
        hi = jnp.broadcast_to(hi, shape)
        for _ in range(60):  # bisection to float32 resolution
            mid = 0.5 * (lo + hi)
            below = self.base.cdf(mid) < target
            lo = jnp.where(below, mid, lo)
            hi = jnp.where(below, hi, mid)
        return 0.5 * (lo + hi)


class MvNormal(Distribution):
    """Multivariate normal with full covariance (or its Cholesky).

    Declare with ``shape=(K,)``. ``logpdf`` is the exact joint density
    (one triangular solve); ``sample(key, shape)`` takes the FULL output
    shape including the trailing event dim K.
    """

    def __init__(self, loc, cov=None, chol=None):
        self.loc = jnp.asarray(loc)
        if (cov is None) == (chol is None):
            raise ValueError("pass exactly one of cov= or chol=")
        self.chol = (jnp.linalg.cholesky(jnp.asarray(cov))
                     if chol is None else jnp.asarray(chol))
        self.k = self.chol.shape[-1]

    def logpdf(self, x):
        d = jnp.asarray(x) - self.loc
        y = jax.scipy.linalg.solve_triangular(self.chol, d[..., None],
                                              lower=True)[..., 0]
        half_logdet = jnp.sum(jnp.log(jnp.diagonal(self.chol)))
        return (-0.5 * jnp.sum(y * y, axis=-1) - half_logdet
                - 0.5 * self.k * jnp.log(2.0 * jnp.pi))

    def sample(self, key, shape=()):
        if not shape or shape[-1] != self.k:
            raise ValueError(f"output shape must end in event dim {self.k}")
        z = jax.random.normal(key, shape, self.loc.dtype)
        return self.loc + z @ self.chol.T


class GaussianRandomWalk(Distribution):
    """Gaussian random walk over a ``shape=(T,)`` site:
    ``x_1 ~ N(drift, init_scale)``, ``x_t = x_{t-1} + drift + eps_t``
    with ``eps_t ~ N(0, scale)``. ``init_scale`` defaults to ``scale``.

    The latent-trajectory prior for declarative time-series models (the
    DSL analogue of the local-level dynamics in models/lgss.py) — pair
    with any gradient engine for joint (trajectory, hyperparameter)
    NUTS/ChEES sampling, or marginalize exactly with
    :func:`mcmcpp_tpu.models.lgss.lgss_loglik` when linear-Gaussian.
    """

    def __init__(self, scale=1.0, init_scale=None, drift=0.0):
        self.scale = scale
        self.init_scale = scale if init_scale is None else init_scale
        self.drift = drift

    def logpdf(self, x):
        x = jnp.asarray(x)
        lp0 = jstats.norm.logpdf(x[..., 0], self.drift, self.init_scale)
        steps = x[..., 1:] - x[..., :-1]
        return lp0 + jnp.sum(
            jstats.norm.logpdf(steps, self.drift, self.scale), axis=-1
        )

    def sample(self, key, shape=()):
        if not shape:
            raise ValueError("GaussianRandomWalk needs shape=(..., T)")
        z = jax.random.normal(key, shape)
        scales = jnp.concatenate([
            jnp.asarray([self.init_scale], z.dtype),
            jnp.full((shape[-1] - 1,), self.scale, z.dtype),
        ])
        return jnp.cumsum(z * scales + self.drift, axis=-1)


class AR1(Distribution):
    """Stationary first-order autoregression over a ``shape=(T,)`` site:
    ``x_t = mu + phi (x_{t-1} - mu) + sigma eps_t`` with the exact
    stationary initial ``x_1 ~ N(mu, sigma^2 / (1 - phi^2))``.

    |phi| < 1 is the caller's contract (declare the coefficient with a
    (-1, 1)-supported prior, e.g. ``Uniform(-1, 1)`` or a scaled Beta,
    when it is itself a parameter).
    """

    def __init__(self, phi, sigma=1.0, mu=0.0):
        self.phi, self.sigma, self.mu = phi, sigma, mu

    def _init_scale(self):
        return self.sigma / jnp.sqrt(1.0 - self.phi * self.phi)

    def logpdf(self, x):
        x = jnp.asarray(x)
        c = x - self.mu
        lp0 = jstats.norm.logpdf(c[..., 0], 0.0, self._init_scale())
        resid = c[..., 1:] - self.phi * c[..., :-1]
        return lp0 + jnp.sum(
            jstats.norm.logpdf(resid, 0.0, self.sigma), axis=-1
        )

    def sample(self, key, shape=()):
        if not shape:
            raise ValueError("AR1 needs shape=(..., T)")
        z = jax.random.normal(key, shape)
        x0 = z[..., 0] * self._init_scale()

        def step(prev, zt):
            nxt = self.phi * prev + self.sigma * zt
            return nxt, nxt

        _, rest = jax.lax.scan(
            step, x0, jnp.moveaxis(z[..., 1:], -1, 0)
        )
        devs = jnp.concatenate(
            [x0[None], rest], axis=0
        )  # (T, ...) time-major from the scan
        return self.mu + jnp.moveaxis(devs, 0, -1)


class Dirichlet(Distribution):
    """Dirichlet over the K-simplex; declare with ``shape=(K,)``.

    Sampling runs in K-1 unconstrained stick-breaking coordinates (the
    ``transform`` handles the dimension change + Jacobian).
    """

    def __init__(self, concentration):
        self.concentration = jnp.asarray(concentration)
        if self.concentration.ndim != 1 or self.concentration.shape[0] < 2:
            raise ValueError("concentration must be a (K>=2,) vector")
        self.transform = StickBreaking(self.concentration.shape[0])

    def logpdf(self, x):
        a = self.concentration
        norm = (jnp.sum(jax.scipy.special.gammaln(a))
                - jax.scipy.special.gammaln(jnp.sum(a)))
        return jnp.sum((a - 1.0) * jnp.log(x), axis=-1) - norm

    def sample(self, key, shape=()):
        k = self.concentration.shape[0]
        if not shape or shape[-1] != k:
            raise ValueError(f"output shape must end in event dim {k}")
        return jax.random.dirichlet(key, self.concentration, shape[:-1])


class GEM(Distribution):
    """Truncated stick-breaking (GEM) weights for Dirichlet-process
    mixtures; declare with ``shape=(K,)``.

    ``w = stickbreak(v)`` with sticks ``v_i ~ Beta(1, alpha)``,
    i = 1..K-1 (Ishwaran & James 2001 truncation of Sethuraman's
    construction). ``alpha`` may be a traced hyperparameter, so the DP
    concentration can itself be learned. The density on the simplex
    (wrt the intrinsic K-1 coordinates) telescopes to

        log p(w) = (K-1)·log α + (α-1)·log w_K − Σ_{i<K} log rem_i,

    rem_i = 1 − Σ_{j<i} w_j — derived by the triangular change of
    variables from the stick Betas; the Jacobian diag is 1/rem_i.
    """

    def __init__(self, alpha, k):
        self.alpha = alpha
        self.k = int(k)
        if self.k < 2:
            raise ValueError("GEM needs K >= 2")
        self.transform = StickBreaking(self.k)

    def logpdf(self, x):
        a = jnp.asarray(self.alpha)
        head = x[..., :-1]  # w_1..w_{K-1}
        csum = jnp.cumsum(head, axis=-1)
        rem = jnp.concatenate(
            [jnp.ones_like(csum[..., :1]), 1.0 - csum[..., :-1]], axis=-1
        )  # rem_1..rem_{K-1}
        return ((self.k - 1) * jnp.log(a)
                + (a - 1.0) * jnp.log(x[..., -1])
                - jnp.sum(jnp.log(rem), axis=-1))

    def sample(self, key, shape=()):
        if not shape or shape[-1] != self.k:
            raise ValueError(f"output shape must end in event dim {self.k}")
        a = jnp.asarray(self.alpha)
        u = jax.random.uniform(key, shape[:-1] + (self.k - 1,))
        v = 1.0 - u ** (1.0 / a)  # Beta(1, alpha) via inverse CDF
        stick = jnp.cumprod(1.0 - v, axis=-1)
        s = jnp.concatenate(
            [jnp.ones_like(stick[..., :1]), stick[..., :-1]], axis=-1
        )
        return jnp.concatenate([v * s, stick[..., -1:]], axis=-1)


class Bernoulli(Distribution):
    """Bernoulli over {0, 1}; give exactly one of probs/logits. Discrete —
    for ``observe`` sites and posterior predictive, not as a ``param``."""

    def __init__(self, probs=None, logits=None):
        if (probs is None) == (logits is None):
            raise ValueError("pass exactly one of probs= or logits=")
        self.logits = (logits if logits is not None
                       else jnp.log(probs) - jnp.log1p(-jnp.asarray(probs)))

    def logpdf(self, x):
        x = jnp.asarray(x)
        return x * jax.nn.log_sigmoid(self.logits) + (
            1.0 - x
        ) * jax.nn.log_sigmoid(-self.logits)

    def sample(self, key, shape=()):
        return jax.random.bernoulli(
            key, jax.nn.sigmoid(self.logits), shape
        ).astype(jnp.float32)


class Poisson(Distribution):
    """Poisson counts; ``rate`` > 0. Discrete — for ``observe`` sites."""

    def __init__(self, rate):
        self.rate = rate

    def logpdf(self, x):
        x = jnp.asarray(x)
        return (x * jnp.log(self.rate) - self.rate
                - jax.scipy.special.gammaln(x + 1.0))

    def sample(self, key, shape=()):
        return jax.random.poisson(key, self.rate, shape).astype(jnp.float32)


class Binomial(Distribution):
    """Binomial(n, p); give exactly one of probs/logits. Discrete — for
    ``observe`` sites."""

    def __init__(self, n, probs=None, logits=None):
        self.n = n
        if (probs is None) == (logits is None):
            raise ValueError("pass exactly one of probs= or logits=")
        self.logits = (logits if logits is not None
                       else jnp.log(probs) - jnp.log1p(-jnp.asarray(probs)))

    def logpdf(self, x):
        x = jnp.asarray(x)
        n = jnp.asarray(self.n, x.dtype)
        comb = (jax.scipy.special.gammaln(n + 1.0)
                - jax.scipy.special.gammaln(x + 1.0)
                - jax.scipy.special.gammaln(n - x + 1.0))
        return (comb + x * jax.nn.log_sigmoid(self.logits)
                + (n - x) * jax.nn.log_sigmoid(-self.logits))

    def sample(self, key, shape=()):
        p = jax.nn.sigmoid(self.logits)
        n = int(self.n) if np.ndim(self.n) == 0 else None
        if n is None:
            raise ValueError("sampling requires a scalar static n")
        if n <= 256:
            # exact: sum of n Bernoulli draws (O(n·|shape|) memory is fine
            # at small n)
            u = jax.random.uniform(key, (n,) + tuple(shape))
            return jnp.sum(u < p, axis=0).astype(jnp.float32)
        # large n: O(|shape|) memory via 60-step bisection on the exact
        # binomial CDF (regularized incomplete beta) — no (n, *shape)
        # uniform temporary (round-1 VERDICT weak-item 7)
        u = jax.random.uniform(key, shape, minval=1e-7, maxval=1.0 - 1e-7)
        nf = jnp.asarray(float(n))

        def cdf(k):  # P(X <= k) = I_{1-p}(n-k, k+1)
            return jax.scipy.special.betainc(
                jnp.maximum(nf - k, 1e-6), k + 1.0, 1.0 - p
            )

        lo = jnp.zeros(shape) - 1.0
        hi = jnp.full(shape, float(n))
        for _ in range(60):
            mid = jnp.floor(0.5 * (lo + hi + 1.0))
            below = cdf(mid) < u
            lo = jnp.where(below, mid, lo)
            hi = jnp.where(below, hi, mid)
        return hi.astype(jnp.float32)


class Mixture(Distribution):
    """Finite mixture of same-support components.

    ``components``: list of Distributions (parameters may be traced
    values from earlier params); ``weights``/``logits``: mixing vector
    (exactly one). ``logpdf`` is the log-sum-exp marginal; ``sample``
    draws a component index per element. As a prior, the sampler
    transform is taken from the first component (components must share
    support)."""

    def __init__(self, components, weights=None, logits=None):
        if len(components) < 2:
            raise ValueError("need >= 2 mixture components")
        if (weights is None) == (logits is None):
            raise ValueError("pass exactly one of weights= or logits=")
        def sig(c):
            # type AND bound parameters: two LowerBound transforms with
            # different cutoffs are different supports
            t = c.transform
            params = tuple(
                sorted(
                    (k, float(v)) for k, v in vars(t).items()
                    if isinstance(v, (int, float))
                )
            )
            return (type(t).__name__, params)

        s0 = sig(components[0])
        if any(sig(c) != s0 for c in components[1:]):
            raise ValueError(
                "mixture components must share support (their sampler "
                "transforms differ: "
                f"{[sig(c) for c in components]})"
            )
        self.components = list(components)
        raw = (jnp.asarray(logits) if logits is not None
               else jnp.log(jnp.asarray(weights)))
        self.log_weights = jax.nn.log_softmax(raw)
        self.transform = components[0].transform

    def logpdf(self, x):
        parts = jnp.stack([c.logpdf(x) for c in self.components], axis=-1)
        return jax.scipy.special.logsumexp(
            parts + self.log_weights, axis=-1
        )

    def sample(self, key, shape=()):
        k_idx, k_comp = jax.random.split(key)
        idx = jax.random.categorical(k_idx, self.log_weights, shape=shape)
        draws = jnp.stack(
            [c.sample(jax.random.fold_in(k_comp, i), shape)
             for i, c in enumerate(self.components)],
            axis=0,
        )
        return jnp.take_along_axis(draws, idx[None, ...], axis=0)[0]


class Categorical(Distribution):
    """Categorical over {0, ..., K-1}; give exactly one of probs/logits
    (last axis = categories). Discrete — for ``observe`` sites and
    posterior predictive."""

    def __init__(self, probs=None, logits=None):
        if (probs is None) == (logits is None):
            raise ValueError("pass exactly one of probs= or logits=")
        self.logits = (jnp.asarray(logits) if logits is not None
                       else jnp.log(jnp.asarray(probs)))

    def logpdf(self, x):
        x = jnp.asarray(x)
        lp = jax.nn.log_softmax(self.logits, axis=-1)
        lp = jnp.broadcast_to(lp, x.shape + lp.shape[-1:])
        idx = x.astype(jnp.int32)[..., None]
        return jnp.take_along_axis(lp, idx, axis=-1)[..., 0]

    def sample(self, key, shape=()):
        if self.logits.ndim != 1:
            raise ValueError("sampling requires 1-D (K,) logits")
        return jax.random.categorical(
            key, self.logits, shape=shape
        ).astype(jnp.float32)


class NegativeBinomial(Distribution):
    """NegativeBinomial(r, p): number of failures before the r-th success
    (overdispersed counts; mean r(1-p)/p). Discrete — for ``observe``
    sites. Sampling uses the exact Gamma-Poisson mixture."""

    def __init__(self, total_count, probs=None, logits=None):
        self.r = total_count
        if (probs is None) == (logits is None):
            raise ValueError("pass exactly one of probs= or logits=")
        self.logits = (logits if logits is not None
                       else jnp.log(probs) - jnp.log1p(-jnp.asarray(probs)))

    def logpdf(self, x):
        x = jnp.asarray(x)
        r = jnp.asarray(self.r, x.dtype)
        comb = (jax.scipy.special.gammaln(x + r)
                - jax.scipy.special.gammaln(r)
                - jax.scipy.special.gammaln(x + 1.0))
        return (comb + r * jax.nn.log_sigmoid(self.logits)
                + x * jax.nn.log_sigmoid(-self.logits))

    def sample(self, key, shape=()):
        k_gamma, k_pois = jax.random.split(key)
        p = jax.nn.sigmoid(self.logits)
        lam = jax.random.gamma(k_gamma, jnp.asarray(self.r), shape) * (
            (1.0 - p) / p
        )
        return jax.random.poisson(k_pois, lam).astype(jnp.float32)


class LKJCholesky(Distribution):
    """LKJ prior on correlation-matrix Cholesky factors; declare with
    ``shape=(K, K)``. ``eta=1`` is uniform over correlation matrices;
    ``eta>1`` concentrates toward identity.

    log density (up to a constant): sum_{i=1..K-1} (K - 1 - i + 2*eta - 2)
    * log L[i,i]. Sampling uses the C-vine construction (Lewandowski,
    Kurowicka & Joe 2009): partial correlations in vine level j are
    2*Beta(b_j, b_j) - 1 with b_j = eta + (K - 2 - j)/2.
    """

    def __init__(self, k, eta=1.0):
        self.k = int(k)
        self.eta = float(eta)
        self.transform = CorrCholesky(self.k)

    def logpdf(self, L):
        i = jnp.arange(1, self.k)
        diag = jnp.diagonal(L)[1:]
        expo = (self.k - 1 - i) + 2.0 * self.eta - 2.0
        return jnp.sum(expo * jnp.log(diag))

    def sample(self, key, shape=()):
        k = self.k
        if shape[-2:] != (k, k):
            raise ValueError(f"output shape must end in ({k}, {k})")
        batch = shape[:-2]
        # b depends only on the column of the partial correlation; one
        # broadcast beta call covers all K(K-1)/2 coords at once
        _, cols = np.tril_indices(k, -1)  # row-major, matches flat layout
        b = jnp.asarray(self.eta + (k - 2 - cols) / 2.0)
        beta = jax.random.beta(key, b, b, batch + (cols.size,))
        return self.transform._rows(2.0 * beta - 1.0)  # _rows is batch-aware


class InverseGamma(Distribution):
    """InverseGamma(concentration a, scale b) on (0, inf) — the conjugate
    variance prior. Mean b/(a-1) for a > 1."""

    transform = Exp()

    def __init__(self, concentration, scale=1.0):
        self.concentration, self.scale = concentration, scale

    def logpdf(self, x):
        a, b = self.concentration, self.scale
        xs = jnp.maximum(x, 1e-38)
        lp = (a * jnp.log(b) - jax.scipy.special.gammaln(a)
              - (a + 1.0) * jnp.log(xs) - b / xs)
        return jnp.where(x > 0, lp, -jnp.inf)

    def cdf(self, x):
        return jax.scipy.special.gammaincc(
            self.concentration, self.scale / jnp.maximum(x, 1e-38)
        )

    def sample(self, key, shape=()):
        return self.scale / jax.random.gamma(key, self.concentration, shape)


class Weibull(Distribution):
    """Weibull(concentration k, scale λ) on (0, inf) — survival/extreme
    value analysis."""

    transform = Exp()

    def __init__(self, concentration, scale=1.0):
        self.concentration, self.scale = concentration, scale

    def logpdf(self, x):
        k, lam = self.concentration, self.scale
        z = jnp.maximum(x, 1e-38) / lam
        lp = jnp.log(k / lam) + (k - 1.0) * jnp.log(z) - z**k
        return jnp.where(x > 0, lp, -jnp.inf)

    def cdf(self, x):
        z = jnp.maximum(x, 0.0) / self.scale
        return -jnp.expm1(-(z**self.concentration))

    def log_sf(self, x):
        z = jnp.maximum(x, 0.0) / self.scale
        return -(z**self.concentration)

    def sample(self, key, shape=()):
        e = jax.random.exponential(key, shape)
        return self.scale * e ** (1.0 / self.concentration)


class Gumbel(Distribution):
    """Gumbel(loc, scale) max-extreme-value distribution on R."""

    def __init__(self, loc=0.0, scale=1.0):
        self.loc, self.scale = loc, scale

    def logpdf(self, x):
        z = (x - self.loc) / self.scale
        return -z - jnp.exp(-z) - jnp.log(self.scale)

    def cdf(self, x):
        return jnp.exp(-jnp.exp(-(x - self.loc) / self.scale))

    def sample(self, key, shape=()):
        return self.loc + self.scale * jax.random.gumbel(key, shape)


class Pareto(Distribution):
    """Pareto(scale x_m, concentration α) on (x_m, inf) — heavy tails,
    power laws."""

    def __init__(self, scale, concentration):
        self.scale = float(scale)
        self.concentration = concentration
        self.transform = LowerBound(self.scale)

    def logpdf(self, x):
        a = self.concentration
        lp = (jnp.log(a) + a * jnp.log(self.scale)
              - (a + 1.0) * jnp.log(jnp.maximum(x, 1e-38)))
        # support indicator: a mixture/observe site evaluating below x_m
        # must see zero density, not an extrapolated power law
        return jnp.where(x >= self.scale, lp, -jnp.inf)

    def cdf(self, x):
        return -jnp.expm1(
            self.concentration
            * (jnp.log(self.scale) - jnp.log(jnp.maximum(x, self.scale)))
        )

    def sample(self, key, shape=()):
        return self.scale * jax.random.pareto(
            key, jnp.asarray(self.concentration, jnp.float32), shape
        )


class Geometric(Distribution):
    """Geometric(p): failures BEFORE the first success, support {0, 1, …}
    (mean (1-p)/p). Discrete — for ``observe`` sites."""

    def __init__(self, probs=None, logits=None):
        if (probs is None) == (logits is None):
            raise ValueError("pass exactly one of probs= or logits=")
        self.logits = (logits if logits is not None
                       else jnp.log(probs) - jnp.log1p(-jnp.asarray(probs)))

    def logpdf(self, x):
        x = jnp.asarray(x)
        return (jax.nn.log_sigmoid(self.logits)
                + x * jax.nn.log_sigmoid(-self.logits))

    def sample(self, key, shape=()):
        p = jax.nn.sigmoid(self.logits)
        # jax.random.geometric counts TRIALS (support {1, 2, …})
        return (jax.random.geometric(key, p, shape) - 1).astype(jnp.float32)


class BetaBinomial(Distribution):
    """BetaBinomial(n, a, b): Binomial with a Beta-mixed success
    probability (overdispersed bounded counts). Discrete — for
    ``observe`` sites."""

    def __init__(self, n, a, b):
        self.n, self.a, self.b = n, a, b

    def logpdf(self, x):
        x = jnp.asarray(x)
        n = jnp.asarray(self.n, x.dtype)
        a, b = self.a, self.b
        betaln = lambda p, q: (jax.scipy.special.gammaln(p)
                               + jax.scipy.special.gammaln(q)
                               - jax.scipy.special.gammaln(p + q))
        comb = (jax.scipy.special.gammaln(n + 1.0)
                - jax.scipy.special.gammaln(x + 1.0)
                - jax.scipy.special.gammaln(n - x + 1.0))
        return comb + betaln(x + a, n - x + b) - betaln(a, b)

    def sample(self, key, shape=()):
        kb, kn = jax.random.split(key)
        p = jax.random.beta(kb, self.a, self.b, shape)
        return jax.random.binomial(
            kn, jnp.asarray(self.n, jnp.float32), p
        ).astype(jnp.float32)


class Multinomial(Distribution):
    """Multinomial(n, probs/logits) over K categories; observations are
    (…, K) count vectors summing to n. Discrete — for ``observe`` sites
    (declare the site with ``shape=(K,)``)."""

    def __init__(self, n, probs=None, logits=None):
        self.n = n
        if (probs is None) == (logits is None):
            raise ValueError("pass exactly one of probs= or logits=")
        self.log_p = (jax.nn.log_softmax(jnp.asarray(logits))
                      if logits is not None
                      else jnp.log(jnp.asarray(probs)))

    def logpdf(self, x):
        x = jnp.asarray(x)
        n = jnp.asarray(self.n, x.dtype)
        return (jax.scipy.special.gammaln(n + 1.0)
                - jnp.sum(jax.scipy.special.gammaln(x + 1.0), -1)
                + jnp.sum(x * self.log_p, -1))

    def sample(self, key, shape=()):
        k = self.log_p.shape[-1]
        if shape and shape[-1:] == (k,):
            shape = shape[:-1]  # batch shape; category axis is implicit
        return jax.random.multinomial(
            key, jnp.asarray(self.n, jnp.float32),
            jnp.exp(self.log_p), shape=tuple(shape) + (k,),
        ).astype(jnp.float32)


class Logistic(Distribution):
    """Logistic(loc, scale) on R — heavier tails than Normal, the latent
    noise behind logit models."""

    def __init__(self, loc=0.0, scale=1.0):
        self.loc, self.scale = loc, scale

    def logpdf(self, x):
        z = (x - self.loc) / self.scale
        return (-z - 2.0 * jax.nn.softplus(-z) - jnp.log(self.scale))

    def cdf(self, x):
        return jax.nn.sigmoid((x - self.loc) / self.scale)

    def log_cdf(self, x):
        return jax.nn.log_sigmoid((x - self.loc) / self.scale)

    def log_sf(self, x):
        return jax.nn.log_sigmoid(-(x - self.loc) / self.scale)

    def sample(self, key, shape=()):
        return self.loc + self.scale * jax.random.logistic(key, shape)


class SkewNormal(Distribution):
    """SkewNormal(loc, scale, alpha) — Azzalini's skew-normal;
    pdf 2·φ(z)·Φ(αz)/scale. alpha=0 recovers Normal."""

    def __init__(self, loc=0.0, scale=1.0, alpha=0.0):
        self.loc, self.scale, self.alpha = loc, scale, alpha

    def logpdf(self, x):
        z = (x - self.loc) / self.scale
        return (jnp.log(2.0) + jstats.norm.logpdf(z)
                + jstats.norm.logcdf(self.alpha * z)
                - jnp.log(self.scale))

    def sample(self, key, shape=()):
        # Azzalini (1985) representation: with delta = alpha/sqrt(1+alpha^2),
        # X = delta |U0| + sqrt(1-delta^2) U1 is standard skew-normal
        k0, k1 = jax.random.split(key)
        a = jnp.asarray(self.alpha, jnp.float32)
        delta = a / jnp.sqrt(1.0 + a * a)
        u0 = jnp.abs(jax.random.normal(k0, shape))
        u1 = jax.random.normal(k1, shape)
        z = delta * u0 + jnp.sqrt(1.0 - delta * delta) * u1
        return self.loc + self.scale * z


class HalfStudentT(Distribution):
    """Half-Student-t on (0, inf) — the robust weakly-informative scale
    prior between HalfNormal (df→inf) and HalfCauchy (df=1)."""

    transform = Exp()

    def __init__(self, df, scale=1.0):
        self.df, self.scale = df, scale

    def logpdf(self, x):
        return jnp.log(2.0) + jstats.t.logpdf(x, self.df, 0.0, self.scale)

    def sample(self, key, shape=()):
        return jnp.abs(
            self.scale * jax.random.t(key, self.df, shape)
        )


class Censored(Distribution):
    """Censored-observation wrapper for ``observe`` sites (survival
    analysis, detection limits).

    ``right``/``left`` (give at least one) are boolean masks
    broadcastable to the data: True entries are censored, and their data
    value is the CENSORING time/limit. The density is the base logpdf at
    uncensored entries, ``log S(x) = log(1 - CDF(x))`` at right-censored
    entries (event after x) and ``log CDF(x)`` at left-censored entries
    (event before x). Bases with exact ``log_sf`` / ``log_cdf``
    (Exponential, Weibull, Normal, Logistic) use them — exact
    arbitrarily far into the tail; others fall back to ``log1p(-cdf)``
    / ``log(cdf)`` with clipping, which saturates near ±16 nats in
    float32 (fine for censoring within ~5σ; add log_sf to the base
    beyond that).

    ``sample`` draws from the UNCENSORED base — posterior-predictive
    replication simulates latent event times (apply the censoring rule
    downstream if you need observed-scale replicates).
    """

    def __init__(self, base, right=None, left=None):
        if right is None and left is None:
            raise ValueError("pass right= and/or left= censoring masks")
        name = type(base).__name__
        if right is not None and not (
            hasattr(base, "log_sf") or hasattr(base, "cdf")
        ):
            raise ValueError(
                f"{name} has no log_sf/cdf — cannot right-censor"
            )
        if left is not None and not (
            hasattr(base, "log_cdf") or hasattr(base, "cdf")
        ):
            raise ValueError(
                f"{name} has no log_cdf/cdf — cannot left-censor"
            )
        self.base = base
        self.right = None if right is None else jnp.asarray(right, bool)
        self.left = None if left is None else jnp.asarray(left, bool)
        self.transform = base.transform

    def _log_sf(self, x):
        if hasattr(self.base, "log_sf"):
            return self.base.log_sf(x)
        return jnp.log1p(-jnp.clip(self.base.cdf(x), 0.0, 1.0 - 1e-7))

    def _log_cdf(self, x):
        if hasattr(self.base, "log_cdf"):
            return self.base.log_cdf(x)
        return jnp.log(jnp.clip(self.base.cdf(x), 1e-38, 1.0))

    def logpdf(self, x):
        lp = self.base.logpdf(x)
        if self.right is not None:
            lp = jnp.where(self.right, self._log_sf(x), lp)
        if self.left is not None:
            lp = jnp.where(self.left, self._log_cdf(x), lp)
        return lp

    def sample(self, key, shape=()):
        return self.base.sample(key, shape)


class ZeroInflatedPoisson(Distribution):
    """ZIP(gate π, rate λ): a point mass at zero mixed with a Poisson —
    excess-zero count data. ``gate`` is the extra-zero probability.
    Discrete — for ``observe`` sites."""

    def __init__(self, gate, rate):
        self.gate, self.rate = gate, rate

    def logpdf(self, x):
        x = jnp.asarray(x)
        lam = self.rate
        log_gate = jnp.log(self.gate)
        log_ngate = jnp.log1p(-self.gate)
        pois = (x * jnp.log(lam) - lam
                - jax.scipy.special.gammaln(x + 1.0))
        at_zero = jnp.logaddexp(log_gate, log_ngate - lam)
        return jnp.where(x == 0, at_zero, log_ngate + pois)

    def sample(self, key, shape=()):
        kg, kp = jax.random.split(key)
        zero = jax.random.bernoulli(kg, self.gate, shape)
        counts = jax.random.poisson(kp, self.rate, shape)
        return jnp.where(zero, 0, counts).astype(jnp.float32)


class VonMises(Distribution):
    """VonMises(loc, concentration) on the circle (-π, π] — directional
    data, phases. Sampling via Best & Fisher (1979) wrapped-Cauchy
    rejection. Declared parameters use the cut-free unit-vector
    embedding (:class:`Circular`)."""

    transform = Circular()

    def __init__(self, loc=0.0, concentration=1.0):
        self.loc, self.concentration = loc, concentration

    def logpdf(self, x):
        k = jnp.asarray(self.concentration)
        # log I0(k) = log i0e(k) + k  (stable for large k)
        log_i0 = jnp.log(jax.scipy.special.i0e(k)) + k
        return (k * jnp.cos(x - self.loc)
                - jnp.log(2.0 * jnp.pi) - log_i0)

    def sample(self, key, shape=()):
        def draw_one(key, k):
            # Best & Fisher 1979 (as in Mardia & Jupp, Fisher 1993
            # §3.3.6); k is a per-draw scalar so array-valued
            # concentrations broadcast through the vmap
            tau = 1.0 + jnp.sqrt(1.0 + 4.0 * k * k)
            rho = (tau - jnp.sqrt(2.0 * tau)) / (2.0 * k)
            r = (1.0 + rho * rho) / (2.0 * rho)

            def cond(c):
                done, *_ = c
                return ~done

            def body(c):
                _, _, key = c
                key, k1, k2, k3 = jax.random.split(key, 4)
                u1 = jax.random.uniform(k1, ())
                z = jnp.cos(jnp.pi * u1)
                f = (1.0 + r * z) / (r + z)
                csd = k * (r - f)
                u2 = jax.random.uniform(k2, ())
                ok = (csd * (2.0 - csd) - u2 > 0.0) | (
                    jnp.log(csd / jnp.maximum(u2, 1e-37)) + 1.0 - csd
                    >= 0.0
                )
                u3 = jax.random.uniform(k3, ())
                theta = jnp.sign(u3 - 0.5) * jnp.arccos(
                    jnp.clip(f, -1.0, 1.0)
                )
                return (ok, theta, key)

            _, theta, _ = jax.lax.while_loop(
                cond, body, (jnp.asarray(False), jnp.zeros(()), key)
            )
            return theta

        shape = tuple(shape)
        n = int(np.prod(shape)) if shape else 1
        conc = jnp.broadcast_to(
            jnp.asarray(self.concentration, jnp.float32), shape or ()
        ).reshape(n)
        thetas = jax.vmap(draw_one)(jax.random.split(key, n), conc)
        loc = jnp.broadcast_to(
            jnp.asarray(self.loc, jnp.float32), shape or ()
        ).reshape(n)
        out = jnp.mod(thetas + loc + jnp.pi, 2.0 * jnp.pi) - jnp.pi
        return out.reshape(shape) if shape else out[0]


# -- model -------------------------------------------------------------------


class _HierPrior:
    """Internal marker for hierarchical prior sites: ``fn(values) ->
    Distribution`` (values = constrained params declared EARLIER), with
    an explicitly supplied transform (the dist doesn't exist until trace
    time, so its support must be declared statically)."""

    def __init__(self, fn, transform):
        self.fn = fn
        self.transform = transform

    def __call__(self, values):
        return self.fn(values)


def _ancestral_prior_sample(params, key, n):
    """(n, D) unconstrained prior draws by per-draw ancestral sampling in
    declaration order — hierarchical sites see earlier params' constrained
    values. Shape-changing transforms and ``inverse_sample`` hooks run
    unbatched inside the vmap (same exactness contract as before)."""

    def one(k):
        vals = {}
        cols = []
        for j, (name, dist, shape, u_shape, u_size) in enumerate(params):
            kj = jax.random.fold_in(k, j)
            d = dist(vals) if isinstance(dist, _HierPrior) else dist
            x = d.sample(kj, tuple(shape))
            vals[name] = x
            t = dist.transform
            inv_s = getattr(t, "inverse_sample", None)
            if inv_s is not None:
                u = inv_s(jax.random.fold_in(kj, 0x1A7), x)
            else:
                u = t.inverse(x)
            cols.append(jnp.reshape(u, (u_size,)))
        return jnp.concatenate(cols)

    return jax.vmap(one)(jax.random.split(key, n))


class Model:
    """Named parameters with priors + a likelihood over them.

    ``param(name, dist, shape=())`` declares a parameter block;
    ``plate(name, size)`` names a broadcast axis so hierarchical models read
    declaratively (``param("theta", Normal(0, 1), plate="schools")``);
    ``deterministic(name, fn)`` records a derived quantity computed from
    earlier params/deterministics, visible to the likelihood and returned
    by ``constrain``; ``observe(name, dist_fn, data)`` declares observed
    data whose log-density joins the posterior AND enables automatic
    posterior-predictive simulation; ``likelihood(fn)`` takes
    ``fn(params: dict) -> scalar log-likelihood`` for black-box terms
    (both may be used together; omit both for prior-only models).
    ``build()`` compiles to ``(logp, dim, constrain)``: flat unconstrained
    logp for any sampler, total dimension, and a vectorized map from flat
    draws back to named constrained values (deterministics included).
    """

    def __init__(self):
        self._params = []  # (name, dist, shape, size)
        self._deterministics = []  # (name, fn)
        self._observes = []  # (name, dist_fn, data, mask, fill)
        self._plates = {}  # name -> size
        self._loglike = None

    def _check_name(self, name):
        taken = (
            {n for n, *_ in self._params}
            | {n for n, _ in self._deterministics}
            | {n for n, *_ in self._observes}
        )
        if name in taken:
            raise ValueError(f"duplicate name {name!r}")

    def plate(self, name, size):
        """Register a named broadcast axis usable as ``param(..., plate=)``."""
        if name in self._plates and self._plates[name] != int(size):
            raise ValueError(
                f"plate {name!r} redeclared with size {size} "
                f"(was {self._plates[name]})"
            )
        self._plates[name] = int(size)
        return self

    def _resolve_shape(self, shape, plate):
        if plate is not None:
            if shape != ():
                raise ValueError("pass either shape= or plate=, not both")
            names = (plate,) if isinstance(plate, str) else tuple(plate)
            try:
                return tuple(self._plates[n] for n in names)
            except KeyError as e:
                raise ValueError(
                    f"unknown plate {e.args[0]!r}; declare with "
                    f".plate(name, size) first"
                ) from None
        if not isinstance(shape, (tuple, list)):
            shape = (shape,)
        return tuple(int(s) for s in shape)

    def param(self, name, dist, shape=(), plate=None, transform=None):
        """Declare a sampled site. ``dist`` is a Distribution, or — for
        HIERARCHICAL priors — a callable ``values -> Distribution`` seeing
        the constrained values of params declared earlier (only earlier
        params: deterministics and later sites are out of ancestral
        order). Callable sites must pass ``transform=`` explicitly, since
        the distribution (hence its support) exists only at trace time::

            .param("alpha", Gamma(2.0, 1.0))
            .param("w", lambda p: GEM(p["alpha"], K), shape=(K,),
                   transform=StickBreaking(K))
        """
        self._check_name(name)
        shape = self._resolve_shape(shape, plate)
        if callable(dist) and not isinstance(dist, Distribution):
            if transform is None:
                raise ValueError(
                    f"param {name!r}: a callable (hierarchical) prior "
                    "needs an explicit transform= declaring its support"
                )
            dist = _HierPrior(dist, transform)
        elif transform is not None:
            raise ValueError(
                f"param {name!r}: transform= is only for callable "
                "(hierarchical) priors; Distributions carry their own"
            )
        # the transform may change dimensionality (e.g. stick-breaking maps
        # K-1 unconstrained dims onto the K-simplex) — the flat sampler
        # vector allocates the UNCONSTRAINED size
        t = dist.transform
        u_shape = getattr(t, "unconstrained_shape", lambda sh: sh)(shape)
        u_size = int(np.prod(u_shape)) if u_shape else 1
        self._params.append((name, dist, shape, u_shape, u_size))
        return self

    def deterministic(self, name, fn):
        """Derived quantity ``fn(params) -> value``; sees every previously
        declared param and deterministic, feeds later deterministics, the
        likelihood, and observes; returned by ``constrain``."""
        self._check_name(name)
        self._deterministics.append((name, fn))
        return self

    def observe(self, name, dist_fn, data, mask=None, fill=0.0):
        """Observed data: ``dist_fn(params) -> Distribution`` evaluated at
        ``data`` joins the log-posterior; ``posterior_predictive`` draws
        replicated datasets from the same ``dist_fn``.

        ``mask`` (optional, broadcastable to ``data``): boolean missing-data
        mask — True entries are observed, False entries are EXCLUDED from
        the log-density (their ``data`` values may be NaN). The double-where
        trick keeps gradients NaN-free; ``fill`` is the in-support
        placeholder substituted at masked positions before the density is
        evaluated (default 0.0; pick e.g. 0.5 for Beta-supported data).
        ``posterior_predictive`` simulates FULL datasets, so masked
        positions come back imputed from the posterior.
        """
        self._check_name(name)
        data = jnp.asarray(data)
        if mask is not None:
            mask = jnp.broadcast_to(jnp.asarray(mask, bool), data.shape)
        self._observes.append((name, dist_fn, data, mask, float(fill)))
        return self

    def likelihood(self, fn):
        self._loglike = fn
        return self

    @property
    def dim(self):
        return sum(u_size for *_, u_size in self._params)

    def build(self):
        """Returns (logp, dim, constrain).

        The returned closures snapshot the parameter list: mutating the
        Model afterwards (adding params) does NOT affect an already-built
        logp — rebuild to pick up changes.
        """
        if not self._params:
            raise ValueError("model has no parameters")
        params = tuple(self._params)
        deterministics = tuple(self._deterministics)
        observes = tuple(self._observes)
        loglike = self._loglike
        dim = sum(u_size for *_, u_size in params)

        def unpack(theta):
            """flat unconstrained (D,) -> ({name: constrained}, log|J|);
            the dict includes deterministics (computed in declaration
            order, each seeing params + earlier deterministics)."""
            out = {}
            logdet = 0.0
            i = 0
            for name, dist, shape, u_shape, u_size in params:
                u = (theta[i : i + u_size].reshape(u_shape) if u_shape
                     else theta[i])
                t = dist.transform
                out[name] = t.forward(u)
                logdet = logdet + jnp.sum(t.log_det(u))
                norm = getattr(t, "log_norm", None)
                if norm is not None:  # e.g. Ordered's log K!
                    logdet = logdet + jnp.sum(norm(u))
                i += u_size
            for name, fn in deterministics:
                out[name] = fn(out)
            return out, logdet

        def logp(theta):
            values, logdet = unpack(theta)
            lp = logdet
            for name, dist, shape, u_shape, u_size in params:
                d = dist(values) if isinstance(dist, _HierPrior) else dist
                lp = lp + jnp.sum(d.logpdf(values[name]))
            for name, dist_fn, data, mask, fill in observes:
                d = dist_fn(values)
                if mask is None:
                    lp = lp + jnp.sum(d.logpdf(data))
                else:
                    # double-where: masked entries neither contribute to the
                    # density nor poison gradients with NaN data
                    safe = jnp.where(mask, data, fill)
                    lp = lp + jnp.sum(
                        jnp.where(mask, d.logpdf(safe), 0.0)
                    )
            if loglike is not None:
                lp = lp + loglike(values)
            return lp

        def constrain(flat_draws):
            """(N, D) unconstrained draws -> {name: (N, *shape)} arrays."""
            arr = jnp.atleast_2d(jnp.asarray(flat_draws))
            out = jax.vmap(lambda t: unpack(t)[0])(arr)
            return {k: np.asarray(v) for k, v in out.items()}

        return logp, dim, constrain

    def build_split(self):
        """Prior/likelihood decomposition for the evidence engines.

        Returns ``(logprior, loglike, dim, constrain, prior_sample)`` in
        the SAME unconstrained coordinates as :meth:`build` (so
        ``logp = logprior + loglike`` matches ``build()[0]`` exactly):

        - ``logprior(theta)``: declared priors + transform Jacobians — a
          proper density on R^dim whenever every prior is proper;
        - ``loglike(theta)``: observe sites + the black-box ``likelihood``
          term;
        - ``prior_sample(key, n) -> (n, dim)``: EXACT prior draws mapped
          through the transform inverses.

        log Z is invariant under the reparametrization, so feeding these
        to ``NestedSampler``, ``SMCSampler``, or power-posterior
        ``ParallelTemperingSampler`` yields the model's marginal
        likelihood directly (see ``examples/evidence.py``).
        """
        if not self._params:
            raise ValueError("model has no parameters")
        params = tuple(self._params)
        deterministics = tuple(self._deterministics)
        observes = tuple(self._observes)
        loglike_fn = self._loglike
        dim = self.dim

        def unpack(theta):
            out = {}
            logdet = 0.0
            i = 0
            for name, dist, shape, u_shape, u_size in params:
                u = (theta[i : i + u_size].reshape(u_shape) if u_shape
                     else theta[i])
                t = dist.transform
                out[name] = t.forward(u)
                logdet = logdet + jnp.sum(t.log_det(u))
                norm = getattr(t, "log_norm", None)
                if norm is not None:  # e.g. Ordered's log K!
                    logdet = logdet + jnp.sum(norm(u))
                i += u_size
            for name, fn in deterministics:
                out[name] = fn(out)
            return out, logdet

        def logprior(theta):
            values, logdet = unpack(theta)
            lp = logdet
            for name, dist, *_ in params:
                d = dist(values) if isinstance(dist, _HierPrior) else dist
                lp = lp + jnp.sum(d.logpdf(values[name]))
            return lp

        def loglike(theta):
            values, _ = unpack(theta)
            ll = 0.0
            for name, dist_fn, data, mask, fill in observes:
                d = dist_fn(values)
                if mask is None:
                    ll = ll + jnp.sum(d.logpdf(data))
                else:
                    safe = jnp.where(mask, data, fill)
                    ll = ll + jnp.sum(jnp.where(mask, d.logpdf(safe), 0.0))
            if loglike_fn is not None:
                ll = ll + loglike_fn(values)
            return ll + jnp.zeros(())  # prior-only models: traced scalar

        def prior_sample(key, n):
            return _ancestral_prior_sample(params, key, n)

        def constrain(flat_draws):
            arr = jnp.atleast_2d(jnp.asarray(flat_draws))
            out = jax.vmap(lambda t: unpack(t)[0])(arr)
            return {k: np.asarray(v) for k, v in out.items()}

        return logprior, loglike, dim, constrain, prior_sample

    def prior_predictive(self, key, n_draws, names=None):
        """Prior-predictive datasets: exact prior draws pushed through
        every ``observe`` site — the standard first check of the Bayesian
        workflow (does the model generate data on the right scale at
        all?). Returns ``({site: (n_draws, *data.shape)}, u)`` where
        ``u`` is the (n_draws, dim) UNCONSTRAINED prior draws used
        (feed to ``constrain`` for named parameter values)."""
        kp, ks = jax.random.split(jax.random.fold_in(key, 0x9D))
        _, _, _, _, prior_sample = self.build_split()
        u = prior_sample(kp, int(n_draws))
        return self.posterior_predictive(ks, u, names=names), np.asarray(u)

    def posterior_predictive(self, key, flat_draws, names=None):
        """Replicated datasets from every ``observe`` site.

        ``flat_draws`` is ``(N, D)`` UNCONSTRAINED posterior draws (what
        ``get_samples(flat=True)`` returns for a model-built logp). Returns
        ``{name: (N, *data.shape)}`` — one simulated dataset per draw,
        PRNG-split per draw and per site. ``names`` restricts to a subset.
        """
        if not self._observes:
            raise ValueError("model has no observe() sites")
        sel = list(names) if names is not None else [
            n for n, *_ in self._observes
        ]
        known = {n for n, *_ in self._observes}
        for n in sel:
            if n not in known:
                raise ValueError(f"unknown observe site {n!r}")
        params = tuple(self._params)
        deterministics = tuple(self._deterministics)

        def unpack_values(theta):
            out = {}
            i = 0
            for name, dist, shape, u_shape, u_size in params:
                u = (theta[i : i + u_size].reshape(u_shape) if u_shape
                     else theta[i])
                out[name] = dist.transform.forward(u)
                i += u_size
            for name, fn in deterministics:
                out[name] = fn(out)
            return out

        sites = [(n, f, d) for n, f, d, _mask, _fill in self._observes
                 if n in sel]

        def one_draw(theta, k):
            values = unpack_values(theta)
            out = {}
            for j, (name, dist_fn, data) in enumerate(sites):
                out[name] = dist_fn(values).sample(
                    jax.random.fold_in(k, j), jnp.shape(data)
                )
            return out

        arr = jnp.atleast_2d(jnp.asarray(flat_draws))
        keys = jax.random.split(key, arr.shape[0])
        out = jax.vmap(one_draw)(arr, keys)
        return {k2: np.asarray(v) for k2, v in out.items()}

    def pointwise_log_likelihood(self, flat_draws, names=None):
        """Per-observation log-likelihood matrices for WAIC / LOO.

        ``flat_draws``: (N, D) UNCONSTRAINED posterior draws. Returns
        ``{site: (N, *data.shape)}``; masked-out entries (observe
        ``mask=False``) come back NaN and are dropped by
        ``analysis.model_compare``. Feed a site's matrix (or the dict sum)
        to :func:`mcmcpp_tpu.analysis.waic` / :func:`~.loo`.
        """
        if not self._observes:
            raise ValueError("model has no observe() sites")
        sel = list(names) if names is not None else [
            n for n, *_ in self._observes
        ]
        known = {n for n, *_ in self._observes}
        for n in sel:
            if n not in known:
                raise ValueError(f"unknown observe site {n!r}")
        params = tuple(self._params)
        deterministics = tuple(self._deterministics)
        sites = [(n, f, d, m, fl) for n, f, d, m, fl in self._observes
                 if n in sel]

        def unpack_values(theta):
            out = {}
            i = 0
            for name, dist, shape, u_shape, u_size in params:
                u = (theta[i : i + u_size].reshape(u_shape) if u_shape
                     else theta[i])
                out[name] = dist.transform.forward(u)
                i += u_size
            for name, fn in deterministics:
                out[name] = fn(out)
            return out

        def one_draw(theta):
            values = unpack_values(theta)
            out = {}
            for name, dist_fn, data, mask, fill in sites:
                d = dist_fn(values)
                if mask is None:
                    out[name] = d.logpdf(data)
                else:
                    safe = jnp.where(mask, data, fill)
                    out[name] = jnp.where(mask, d.logpdf(safe), jnp.nan)
            return out

        arr = jnp.atleast_2d(jnp.asarray(flat_draws))
        out = jax.vmap(one_draw)(arr)
        return {k: np.asarray(v) for k, v in out.items()}

    def prior_sample(self, key, n):
        """(n, D) UNCONSTRAINED draws from the priors (SMC-ready).

        Transforms with auxiliary coordinates or restricted supports
        (Circular's radius, Ordered's sort) provide ``inverse_sample``
        so the u-space draws are exact — same hook as
        ``build_split().prior_sample``."""
        return _ancestral_prior_sample(tuple(self._params), key, n)
