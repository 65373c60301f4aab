"""NeuTra flow-preconditioned sampling: flow exactness + funnel recovery."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mcmcpp_tpu import NUTSSampler
from mcmcpp_tpu.models import neal_funnel
from mcmcpp_tpu.neutra import NeuTra, RealNVP


@pytest.fixture(scope="module")
def fitted():
    t = neal_funnel(dim=5, sigma_v=3.0)
    nt = NeuTra(t.logp, t.dim,
                flow=RealNVP(t.dim, n_layers=6, hidden=48), seed=0)
    nt.fit(3000, batch=256, learning_rate=2e-3)
    return t, nt


@pytest.mark.slow
def test_flow_inverse_exact_after_training(fitted):
    """forward/inverse must be exact inverses WITH trained (non-identity)
    params, and the two logdets must cancel."""
    _, nt = fitted
    z = jax.random.normal(jax.random.key(7), (64, nt.dim))
    for zi in np.asarray(z)[:8]:
        x, ld_f = nt.flow.forward(nt.params, jnp.asarray(zi))
        z2, ld_i = nt.flow.inverse(nt.params, x)
        np.testing.assert_allclose(np.asarray(z2), zi, atol=1e-4)
        assert float(ld_f + ld_i) == pytest.approx(0.0, abs=1e-4)
        assert abs(float(ld_f)) > 1e-3  # genuinely non-identity


@pytest.mark.slow
def test_elbo_improves(fitted):
    _, nt = fitted
    h = nt.fit_result.elbo_history
    assert nt.fit_result.final_elbo > h[:50].mean() + 1.0


@pytest.mark.slow
def test_funnel_moments_via_neutra_nuts(fitted):
    """v ~ N(0, 9) marginal of Neal's funnel — the geometry a diagonal
    mass matrix cannot fix; the flow must neutralize it."""
    t, nt = fitted
    s = nt.make_sampler(NUTSSampler, n_chains=16, max_depth=8)
    s.warmup(300)
    s.run(1000)
    v = nt.transform(s.get_samples(flat=True))[:, 0]
    assert abs(v.mean()) < 0.5
    assert abs(v.std() - t.extras["sigma_v"]) < 0.5


@pytest.mark.slow
def test_sample_approximate_quality(fitted):
    """The flow alone (no MCMC) should already be a decent v-marginal."""
    t, nt = fitted
    x = nt.sample_approximate(jax.random.key(3), 8000)
    assert x.shape == (8000, t.dim)
    assert abs(x[:, 0].mean()) < 0.8
    assert 1.5 < x[:, 0].std() < 4.5


def test_dim_one_rejected():
    with pytest.raises(ValueError, match="dim >= 2"):
        RealNVP(1)


@pytest.mark.parametrize("dim", [2, 5, 7])  # odd dims exercise uneven masks
def test_flow_roundtrip_random_params(dim):
    """Inverse exactness with randomly PERTURBED params (no training)."""
    flow = RealNVP(dim, n_layers=4, hidden=16)
    params = flow.init(jax.random.key(0))
    params = jax.tree.map(
        lambda p: p + 0.3 * jax.random.normal(
            jax.random.key(int(p.size)), p.shape, p.dtype
        ),
        params,
    )
    z = jax.random.normal(jax.random.key(2), (dim,))
    x, ld_f = flow.forward(params, z)
    z2, ld_i = flow.inverse(params, x)
    np.testing.assert_allclose(np.asarray(z2), np.asarray(z), atol=1e-4)
    assert float(ld_f + ld_i) == pytest.approx(0.0, abs=1e-4)
    assert abs(float(ld_f)) > 1e-4


class TestIAF:
    """MADE-masked inverse autoregressive flow (Kingma et al. 2016) —
    drop-in alternative to RealNVP (ROADMAP capability item)."""

    @pytest.mark.parametrize("dim", [2, 5, 7])
    def test_roundtrip_random_params(self, dim):
        from mcmcpp_tpu.neutra import IAF

        flow = IAF(dim, n_layers=3, hidden=16)
        params = flow.init(jax.random.key(0))
        params = jax.tree.map(
            lambda p: p + 0.3 * jax.random.normal(
                jax.random.key(int(p.size)), p.shape, p.dtype
            ),
            params,
        )
        z = np.asarray(jax.random.normal(jax.random.key(1), (6, dim)))
        for zi in z:
            x, ld_f = flow.forward(params, jnp.asarray(zi))
            z2, ld_i = flow.inverse(params, x)
            np.testing.assert_allclose(np.asarray(z2), zi, atol=1e-4)
            assert float(ld_f + ld_i) == pytest.approx(0.0, abs=1e-4)

    def test_autoregressive_structure(self):
        """shift_1/ls_1 must be constant in z (strict lower-triangular
        conditioning); coordinate j must not influence outputs <= j."""
        from mcmcpp_tpu.neutra import IAF

        dim = 5
        flow = IAF(dim, n_layers=1, hidden=16)
        params = flow.init(jax.random.key(0))
        params = jax.tree.map(
            lambda p: p + 0.5 * jax.random.normal(
                jax.random.key(int(p.size) + 1), p.shape, p.dtype
            ),
            params,
        )
        (w1, b1, w2, b2), = params
        z = jnp.asarray(np.linspace(-1, 1, dim), jnp.float32)
        base_shift, base_ls = flow._shift_ls(params[0], z)
        for j in range(dim):
            z2 = z.at[j].add(10.0)
            shift, ls = flow._shift_ls(params[0], z2)
            # outputs up to and including j unchanged
            np.testing.assert_allclose(
                np.asarray(shift[: j + 1]), np.asarray(base_shift[: j + 1]),
                atol=1e-6,
            )
            np.testing.assert_allclose(
                np.asarray(ls[: j + 1]), np.asarray(base_ls[: j + 1]),
                atol=1e-6,
            )

    def test_identity_at_init(self):
        from mcmcpp_tpu.neutra import IAF

        flow = IAF(4, n_layers=3)
        params = flow.init(jax.random.key(2))
        z = jnp.asarray([0.3, -1.2, 0.7, 2.0], jnp.float32)
        x, ld = flow.forward(params, z)
        # layers reverse their output; 3 layers = odd -> net reversal
        np.testing.assert_allclose(np.asarray(x), np.asarray(z)[::-1],
                                   atol=1e-6)
        assert float(ld) == pytest.approx(0.0, abs=1e-6)

    @pytest.mark.slow
    def test_neutra_iaf_recovers_correlated_gaussian(self):
        from mcmcpp_tpu.neutra import IAF, NeuTra

        dim = 4
        rho = 0.8
        cov = rho * np.ones((dim, dim)) + (1 - rho) * np.eye(dim)
        prec = np.linalg.inv(cov).astype(np.float32)

        def logp(t):
            return -0.5 * t @ prec @ t

        nt = NeuTra(logp, dim, flow=IAF(dim, n_layers=4, hidden=32), seed=0)
        nt.fit(3000, batch=256, learning_rate=2e-3)
        h = nt.fit_result.elbo_history
        assert nt.fit_result.final_elbo > h[:50].mean()
        x = nt.sample_approximate(jax.random.key(3), 20000)
        emp = np.cov(x.T)
        np.testing.assert_allclose(emp, cov, atol=0.25)

    def test_dim_one_rejected(self):
        from mcmcpp_tpu.neutra import IAF

        with pytest.raises(ValueError, match="dim >= 2"):
            IAF(1)


class TestSplineCoupling:
    """Rational-quadratic spline coupling flow (Durkan et al. 2019) —
    ROADMAP capability item beyond RealNVP/IAF."""

    def _perturbed(self, flow, seed, scale=0.5):
        params = flow.init(jax.random.key(seed))
        return jax.tree.map(
            lambda p: p + scale * jax.random.normal(
                jax.random.key(int(p.size) + seed), p.shape, p.dtype
            ),
            params,
        )

    @pytest.mark.parametrize("dim", [2, 5])
    def test_roundtrip_and_logdet_vs_autodiff_x64(self, dim):
        """Exactness of the spline math, checked in float64 — randomly
        perturbed params create near-degenerate bins where float32
        autodiff references are themselves noisy, so the tight check
        belongs at f64 (the f32 regime is covered by the banana fit)."""
        from mcmcpp_tpu.neutra import SplineCoupling

        with jax.enable_x64():
            flow = SplineCoupling(dim, n_layers=3, hidden=16, n_bins=6,
                                  dtype=jnp.float64)
            params = self._perturbed(flow, 3)
            z = np.asarray(
                jax.random.normal(jax.random.key(1), (8, dim))
            ) * 2.0
            for zi in z:
                zi = jnp.asarray(zi, jnp.float64)
                x, ld_f = flow.forward(params, zi)
                z2, ld_i = flow.inverse(params, x)
                np.testing.assert_allclose(np.asarray(z2), np.asarray(zi),
                                           atol=1e-8)
                assert float(ld_f + ld_i) == pytest.approx(0.0, abs=1e-8)
                jac = jax.jacfwd(lambda v: flow.forward(params, v)[0])(zi)
                _, ref = jnp.linalg.slogdet(jac)
                assert float(ld_f) == pytest.approx(float(ref), abs=1e-8)

    def test_roundtrip_float32_moderate_params(self):
        """float32 path at training-realistic parameter scales."""
        from mcmcpp_tpu.neutra import SplineCoupling

        flow = SplineCoupling(4, n_layers=3, hidden=16, n_bins=6)
        params = self._perturbed(flow, 5, scale=0.2)
        z = np.asarray(jax.random.normal(jax.random.key(2), (8, 4))) * 2.0
        for zi in z:
            zi = jnp.asarray(zi, jnp.float32)
            x, ld_f = flow.forward(params, zi)
            z2, ld_i = flow.inverse(params, x)
            np.testing.assert_allclose(np.asarray(z2), np.asarray(zi),
                                       atol=5e-4)
            assert float(ld_f + ld_i) == pytest.approx(0.0, abs=2e-3)

    def test_identity_at_init(self):
        from mcmcpp_tpu.neutra import SplineCoupling

        flow = SplineCoupling(4, n_layers=4)
        params = flow.init(jax.random.key(0))
        z = jnp.asarray([0.3, -4.9, 0.0, 4.9], jnp.float32)
        x, ld = flow.forward(params, z)
        np.testing.assert_allclose(np.asarray(x), np.asarray(z), atol=1e-5)
        assert float(ld) == pytest.approx(0.0, abs=1e-5)

    def test_identity_tails(self):
        from mcmcpp_tpu.neutra import SplineCoupling

        flow = SplineCoupling(2, n_layers=2, bound=3.0)
        params = self._perturbed(flow, 7, scale=1.0)
        # zero the affine head: the tails property belongs to the splines
        params[-1] = (jnp.zeros((2,), jnp.float32),
                      jnp.zeros((2,), jnp.float32))
        z = jnp.asarray([17.5, -42.0], jnp.float32)  # far outside [-B, B]
        x, ld = flow.forward(params, z)
        np.testing.assert_allclose(np.asarray(x), np.asarray(z), atol=1e-6)
        assert float(ld) == pytest.approx(0.0, abs=1e-6)

    def test_affine_head_expands_past_bound(self):
        """Without the head a spline flow can never push mass past B;
        with log_scale = log 2 the far tails must scale affinely."""
        from mcmcpp_tpu.neutra import SplineCoupling

        flow = SplineCoupling(2, n_layers=2, bound=3.0)
        params = flow.init(jax.random.key(0))
        params[-1] = (jnp.zeros((2,), jnp.float32),
                      jnp.full((2,), np.log(2.0), jnp.float32))
        z = jnp.asarray([4.0, -10.0], jnp.float32)
        x, ld = flow.forward(params, z)
        np.testing.assert_allclose(np.asarray(x), [8.0, -20.0], atol=1e-5)
        assert float(ld) == pytest.approx(2.0 * np.log(2.0), abs=1e-5)
        z2, ldi = flow.inverse(params, x)
        np.testing.assert_allclose(np.asarray(z2), np.asarray(z), atol=1e-5)
        assert float(ld + ldi) == pytest.approx(0.0, abs=1e-5)

    def test_monotone_per_coordinate(self):
        from mcmcpp_tpu.neutra import SplineCoupling

        flow = SplineCoupling(2, n_layers=1, n_bins=8)
        params = self._perturbed(flow, 11, scale=1.5)
        # layer-0 mask fixes even dims; dim 1 goes through the spline.
        # Extreme params make near-flat regions where float32 steps can
        # round to equality, so the strict check is monotone-nondecreasing
        # plus genuine overall growth.
        grid = np.linspace(-6, 6, 301, dtype=np.float32)
        ys = np.asarray(jax.vmap(
            lambda t: flow.forward(params, jnp.asarray([0.7, t]))[0][1]
        )(jnp.asarray(grid)))
        assert np.all(np.diff(ys) >= 0)
        rise = 12.0 * float(np.exp(np.asarray(params[-1][1])[1]))
        assert ys[-1] - ys[0] == pytest.approx(rise, abs=1e-2)

    @pytest.mark.slow
    def test_neutra_spline_recovers_banana(self):
        from mcmcpp_tpu.neutra import SplineCoupling, NeuTra

        def logp(t):  # Rosenbrock-ish banana
            return -0.5 * (t[0] ** 2 / 4.0 + (t[1] - 0.5 * t[0] ** 2) ** 2)

        nt = NeuTra(logp, 2, flow=SplineCoupling(2, n_layers=4, hidden=32),
                    seed=0)
        nt.fit(3000, batch=256, learning_rate=2e-3)
        h = nt.fit_result.elbo_history
        assert nt.fit_result.final_elbo > h[:50].mean()
        x = np.asarray(nt.sample_approximate(jax.random.key(3), 30000))
        # banana moments: E[x0]=0, Var[x0]=4, E[x1]=0.5*E[x0^2]=2
        assert abs(x[:, 0].mean()) < 0.25
        assert abs(x[:, 0].var() - 4.0) < 0.8
        assert abs(x[:, 1].mean() - 2.0) < 0.4


class TestForwardKLRefit:
    """refit_forward_kl: flow refinement from posterior draws (the
    per-chain-refinement ROADMAP item; forward KL is mass-covering and
    gradient-free in the target)."""

    @pytest.mark.slow
    def test_mle_on_exact_draws_recovers_covariance(self):
        """No reverse-KL fit at all: MLE on exact correlated-Gaussian
        draws alone must teach the flow the covariance."""
        dim, rho = 3, 0.7
        cov = rho * np.ones((dim, dim)) + (1 - rho) * np.eye(dim)
        chol = np.linalg.cholesky(cov).astype(np.float32)
        rng = np.random.default_rng(0)
        draws = (chol @ rng.standard_normal((dim, 20000))).T.astype(
            np.float32
        )

        nt = NeuTra(lambda t: 0.0, dim,
                    flow=RealNVP(dim, n_layers=4, hidden=32), seed=1)
        nt.refit_forward_kl(draws, n_steps=2500, learning_rate=2e-3)
        h = nt.refit_result.elbo_history
        assert nt.refit_result.final_elbo > h[:50].mean()
        x = nt.sample_approximate(jax.random.key(2), 30000)
        np.testing.assert_allclose(np.cov(np.asarray(x).T), cov, atol=0.2)

    def test_shape_validation(self):
        nt = NeuTra(lambda t: 0.0, 3, seed=1)
        with pytest.raises(ValueError, match="samples must be"):
            nt.refit_forward_kl(np.zeros((10, 4)))

    @pytest.mark.slow
    def test_refine_loop_improves_funnel_transport(self, fitted):
        """fit -> sample -> refit on transported draws: the refit flow's
        own samples must still match the funnel v-marginal (refinement
        must not degrade a good transport)."""
        t, nt0 = fitted
        import copy

        nt = copy.copy(nt0)  # don't mutate the shared fixture's params
        s = nt.make_sampler(NUTSSampler, n_chains=16, max_depth=8)
        s.warmup(300)
        s.run(800)
        draws = nt.transform(s.get_samples(flat=True))
        nt.refit_forward_kl(draws, n_steps=1500, learning_rate=5e-4)
        x = nt.sample_approximate(jax.random.key(5), 8000)
        v = np.asarray(x)[:, 0]
        assert abs(v.mean()) < 0.8
        assert 1.8 < v.std() < 4.2


class TestMeshSharded:
    def test_training_batch_sharded_matches_unsharded(self):
        """Flow-training batch axis sharded over the 8-device CPU mesh:
        params/Adam state stay replicated, only the batch-mean reduction
        order changes — the fitted params must match to float tolerance."""
        from mcmcpp_tpu.parallel.mesh import make_walker_mesh

        def logp(t):
            return -0.5 * jnp.sum(t * t)

        flow = RealNVP(3, n_layers=2, hidden=8)
        a = NeuTra(logp, 3, flow=flow, seed=2).fit(200, batch=64)
        b = NeuTra(logp, 3, flow=flow, seed=2,
                   mesh=make_walker_mesh()).fit(200, batch=64)
        for la, lb in zip(jax.tree.leaves(a.params),
                          jax.tree.leaves(b.params)):
            np.testing.assert_allclose(np.asarray(lb), np.asarray(la),
                                       rtol=2e-3, atol=2e-3)
        assert b.fit_result.final_elbo == pytest.approx(
            a.fit_result.final_elbo, abs=0.05
        )

    def test_mesh_forwarded_to_warped_sampler(self):
        from mcmcpp_tpu import HMCSampler
        from mcmcpp_tpu.parallel.mesh import make_walker_mesh

        mesh = make_walker_mesh()
        nt = NeuTra(lambda t: -0.5 * jnp.sum(t * t), 3,
                    flow=RealNVP(3, n_layers=2, hidden=8), seed=3,
                    mesh=mesh)
        nt.fit(100, batch=64)
        s = nt.make_sampler(HMCSampler, n_chains=16, n_leapfrog=3)
        assert s.mesh is mesh
        s.warmup(5)
        s.run(5)
        x = nt.transform(s.get_samples(flat=True))
        assert x.shape == (5 * 16, 3) and np.isfinite(x).all()

    def test_refit_batch_sharded(self):
        from mcmcpp_tpu.parallel.mesh import make_walker_mesh

        nt = NeuTra(lambda t: -0.5 * jnp.sum(t * t), 2,
                    flow=RealNVP(2, n_layers=2, hidden=8), seed=4,
                    mesh=make_walker_mesh())
        draws = np.random.default_rng(0).standard_normal(
            (512, 2)).astype(np.float32)
        nt.refit_forward_kl(draws, n_steps=100, batch=64)
        assert np.isfinite(nt.refit_result.final_elbo)
