"""MCLMC (microcanonical Langevin MC): statistical oracles + invariants.

Oracle pattern per SURVEY.md §4: analytic Gaussian moments, generous MC
tolerances, fixed seeds. MCLMC is UNADJUSTED — the O(eps²) bias is
controlled by the energy-error tuning target, so the moment tolerances
here are wider than the exact engines' and one test pins the
bias-vs-step-size direction instead of absolute exactness.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mcmcpp_tpu import MCLMCSampler

D = 10


def std_gauss(t):
    return -0.5 * jnp.sum(t * t)


@pytest.fixture(scope="module")
def tuned():
    s = MCLMCSampler(std_gauss, n_chains=64, n_params=D, seed=0)
    s.init_ball(np.zeros(D), scale=1.0, seed=1)
    s.tune(600)
    s.run(3000, thin=2)
    return s


def test_gaussian_moments(tuned):
    x = tuned.get_samples(burn_in=200, flat=True)
    assert x.shape[0] > 50_000
    np.testing.assert_allclose(x.mean(axis=0), np.zeros(D), atol=0.06)
    np.testing.assert_allclose(x.var(axis=0), np.ones(D), rtol=0.08)
    # cross-correlations vanish
    c = np.corrcoef(x.T)
    assert np.abs(c - np.eye(D)).max() < 0.05


def test_tune_hits_energy_target(tuned):
    assert 5e-5 < tuned.energy_var < 5e-3
    # Gaussian-calibrated outputs land in sane ranges
    assert 0.2 < tuned.step_size < 10.0
    assert 1.0 < tuned.decoherence_length < 30.0


def test_unit_momentum_invariant(tuned):
    norms = np.asarray(jnp.linalg.norm(tuned.state.momentum, axis=-1))
    np.testing.assert_allclose(norms, 1.0, rtol=1e-5)


def test_logp_plane_matches_positions(tuned):
    x = tuned.get_samples()
    lp = tuned.get_log_probs()
    expect = -0.5 * np.sum(np.asarray(x) ** 2, axis=-1)
    np.testing.assert_allclose(lp, expect, atol=1e-3)


def test_ill_conditioned_gaussian():
    scales = jnp.asarray(np.array([1.0, 5.0, 0.5, 2.0]) ** 2)

    def logp(t):
        return -0.5 * jnp.sum(t * t / scales)

    s = MCLMCSampler(logp, n_chains=64, n_params=4, seed=3)
    s.init_ball(np.zeros(4), scale=1.0, seed=4)
    s.tune(800)
    s.run(4000, thin=2)
    x = s.get_samples(burn_in=400, flat=True)
    np.testing.assert_allclose(
        x.var(axis=0), np.asarray(scales), rtol=0.15
    )


def test_energy_error_scales_down_with_step():
    """ΔE ∝ eps² → Var[ΔE] drops ~16x when eps halves (the knob the
    tuner turns; asserts the bias is controllable)."""

    def var_e(eps):
        s = MCLMCSampler(std_gauss, n_chains=32, n_params=D, seed=5,
                         step_size=eps, decoherence_length=5.0)
        s.init_ball(np.zeros(D), scale=1.0, seed=6)
        s.tune(n_steps=200, rounds=1, target_energy_var=np.inf)  # no-op
        return s.energy_var

    v1, v2 = var_e(2.0), var_e(1.0)
    assert v2 < v1 / 4.0, (v1, v2)


def test_mesh_sharded_bitwise():
    from mcmcpp_tpu.parallel.mesh import make_walker_mesh

    def build(mesh):
        s = MCLMCSampler(std_gauss, n_chains=16, n_params=D, seed=7,
                         mesh=mesh, step_size=1.0,
                         decoherence_length=5.0)
        s.init_ball(np.zeros(D), scale=1.0, seed=8)
        s.run(50)
        return np.asarray(s.get_samples())

    np.testing.assert_array_equal(build(None), build(make_walker_mesh()))


def test_checkpoint_resume_bitwise(tmp_path):
    from mcmcpp_tpu.io.checkpoint import load_checkpoint, save_checkpoint

    def build(seed):
        s = MCLMCSampler(std_gauss, n_chains=8, n_params=D, seed=seed,
                         step_size=1.0, decoherence_length=5.0)
        s.init_ball(np.zeros(D), scale=1.0, seed=seed + 1)
        return s

    a = build(0)
    a.run(30)
    ck = save_checkpoint(a, tmp_path / "mc.npz")
    a.run(30)
    b = build(9)
    load_checkpoint(b, ck)
    b.run(30)
    np.testing.assert_array_equal(a.get_samples(), b.get_samples())
    np.testing.assert_array_equal(a.get_log_probs(), b.get_log_probs())
    assert a.step_size == b.step_size
    assert a.decoherence_length == b.decoherence_length


def test_validation():
    with pytest.raises(ValueError, match="n_params >= 2"):
        MCLMCSampler(std_gauss, n_chains=4, n_params=1)
    s = MCLMCSampler(std_gauss, n_chains=4, n_params=3)
    with pytest.raises(RuntimeError, match="init"):
        s.run(5)
    with pytest.raises(ValueError, match="positions"):
        s.init(np.zeros((3, 3)))


# --- MAMS: the Metropolis-adjusted sibling ---------------------------------


def test_mams_tuned_moments_and_acceptance():
    from mcmcpp_tpu import MAMSSampler

    s = MAMSSampler(std_gauss, n_chains=64, n_params=D, seed=0)
    s.init_ball(np.zeros(D), scale=1.0, seed=1)
    s.tune(300)
    assert abs(s.last_mean_accept - s.target_accept) < 0.12
    s.run(2000)
    x = s.get_samples(burn_in=100, flat=True)
    np.testing.assert_allclose(x.mean(axis=0), np.zeros(D), atol=0.05)
    np.testing.assert_allclose(x.var(axis=0), np.ones(D), rtol=0.05)


def test_mams_exact_at_coarse_step():
    """THE point of the adjustment: a crude step size costs acceptance,
    never correctness — variance stays unbiased where unadjusted MCLMC
    at the same step measurably inflates it (1.04 measured)."""
    from mcmcpp_tpu import MAMSSampler

    s = MAMSSampler(std_gauss, n_chains=64, n_params=D, seed=2,
                    step_size=2.5, decoherence_length=5.0)
    s.init_ball(np.zeros(D), scale=1.0, seed=3)
    s.run(3000)
    x = s.get_samples(burn_in=300, flat=True)
    assert abs(float(x.var(axis=0).mean()) - 1.0) < 0.02


def test_mams_correlated_gaussian():
    from mcmcpp_tpu import MAMSSampler

    rho = 0.5
    cov = rho * np.ones((4, 4)) + (1 - rho) * np.eye(4)
    prec = jnp.asarray(np.linalg.inv(cov), jnp.float32)

    def logp(t):
        return -0.5 * t @ prec @ t

    s = MAMSSampler(logp, n_chains=64, n_params=4, seed=4)
    s.init_ball(np.zeros(4), scale=1.0, seed=5)
    s.tune(300)
    s.run(3000)
    x = s.get_samples(burn_in=300, flat=True)
    np.testing.assert_allclose(np.cov(x.T), cov, atol=0.06)


def test_mams_checkpoint_resume_bitwise(tmp_path):
    from mcmcpp_tpu import MAMSSampler
    from mcmcpp_tpu.io.checkpoint import load_checkpoint, save_checkpoint

    def build(seed):
        s = MAMSSampler(std_gauss, n_chains=8, n_params=D, seed=seed,
                        step_size=1.0, decoherence_length=5.0)
        s.init_ball(np.zeros(D), scale=1.0, seed=seed + 1)
        return s

    a = build(0)
    a.run(20)
    ck = save_checkpoint(a, tmp_path / "ma.npz")
    a.run(20)
    b = build(9)
    load_checkpoint(b, ck)
    b.run(20)
    np.testing.assert_array_equal(a.get_samples(), b.get_samples())


def test_mams_mesh_sharded_bitwise():
    from mcmcpp_tpu import MAMSSampler
    from mcmcpp_tpu.parallel.mesh import make_walker_mesh

    def build(mesh):
        s = MAMSSampler(std_gauss, n_chains=16, n_params=D, seed=7,
                        mesh=mesh, step_size=1.0, decoherence_length=5.0)
        s.init_ball(np.zeros(D), scale=1.0, seed=8)
        s.run(30)
        return np.asarray(s.get_samples())

    np.testing.assert_array_equal(build(None), build(make_walker_mesh()))


# --- diagonal preconditioning ----------------------------------------------


def _aniso_logp(scales2):
    s2 = jnp.asarray(scales2)

    def logp(t):
        return -0.5 * jnp.sum(t * t / s2)

    return logp


def test_precondition_recovers_metric_and_moments():
    """tune(precondition=True) learns inv_mass ≈ the per-dim variances
    and the whitened run recovers a badly-scaled Gaussian."""
    scales2 = np.array([1.0, 100.0, 0.04, 9.0])
    s = MCLMCSampler(_aniso_logp(scales2), n_chains=64, n_params=4,
                     seed=0)
    s.init_ball(np.zeros(4), scale=1.0, seed=1)
    s.tune(1200, precondition=True)
    assert s.inv_mass is not None
    np.testing.assert_allclose(
        np.asarray(s.inv_mass), scales2, rtol=0.5
    )
    s.run(4000, thin=2)
    x = s.get_samples(burn_in=400, flat=True)
    np.testing.assert_allclose(x.var(axis=0), scales2, rtol=0.2)


def test_mams_precondition_exact_on_anisotropic():
    from mcmcpp_tpu import MAMSSampler

    scales2 = np.array([1.0, 64.0, 0.25])
    s = MAMSSampler(_aniso_logp(scales2), n_chains=64, n_params=3,
                    seed=2)
    s.init_ball(np.zeros(3), scale=1.0, seed=3)
    s.tune(400, precondition=True)
    assert s.inv_mass is not None
    s.run(3000)
    x = s.get_samples(burn_in=300, flat=True)
    np.testing.assert_allclose(x.var(axis=0), scales2, rtol=0.12)


def test_precondition_checkpoint_roundtrip(tmp_path):
    from mcmcpp_tpu.io.checkpoint import load_checkpoint, save_checkpoint

    scales2 = np.array([1.0, 25.0])
    a = MCLMCSampler(_aniso_logp(scales2), n_chains=8, n_params=2, seed=0)
    a.init_ball(np.zeros(2), scale=1.0, seed=1)
    a.tune(200, precondition=True)
    a.run(20)
    ck = save_checkpoint(a, tmp_path / "pm.npz")
    a.run(20)
    b = MCLMCSampler(_aniso_logp(scales2), n_chains=8, n_params=2, seed=9)
    load_checkpoint(b, ck)
    np.testing.assert_array_equal(np.asarray(a.inv_mass),
                                  np.asarray(b.inv_mass))
    b.run(20)
    np.testing.assert_array_equal(a.get_samples(), b.get_samples())


def test_inv_mass_validation():
    with pytest.raises(ValueError, match="inv_mass"):
        MCLMCSampler(std_gauss, n_chains=4, n_params=3,
                     inv_mass=np.ones(2))


def test_esh_no_overflow_on_sharp_targets():
    """delta = dt|g|/(d-1) >> 89 overflowed f32 cosh in the naive esh
    form, NaN-poisoning the chain with no recovery; the exp(-delta)
    formulation must tune and sample finite on a sigma=0.01 target."""
    def sharp(t):
        return -0.5 * jnp.sum(t * t) / 0.01**2

    s = MCLMCSampler(sharp, n_chains=32, n_params=D, seed=0)
    s.init_ball(np.zeros(D), scale=1.0, seed=1)  # |g| ~ 1e4 at init
    s.tune(300)
    assert np.isfinite(s.step_size) and np.isfinite(s.energy_var)
    s.run(500)
    x = s.get_samples(burn_in=100, flat=True)
    assert np.isfinite(x).all()
    # converging toward the sigma=0.01 mode from the |x| ~ 3 init (full
    # traversal takes more steps at the tuned eps; the point here is the
    # NaN-free dynamics, not the stationary moments)
    assert float(np.median(np.abs(x[-1000:]))) < 0.1


def test_mams_mclmc_checkpoints_not_interchangeable(tmp_path):
    """Resuming an adjusted run under the unadjusted algorithm (or vice
    versa) silently changes the exactness contract — rejected."""
    from mcmcpp_tpu import MAMSSampler
    from mcmcpp_tpu.io.checkpoint import load_checkpoint, save_checkpoint

    m = MAMSSampler(std_gauss, n_chains=8, n_params=D, seed=0,
                    step_size=1.0, decoherence_length=5.0)
    m.init_ball(np.zeros(D), scale=1.0, seed=1)
    m.run(10)
    ck = save_checkpoint(m, tmp_path / "ma.npz")
    u = MCLMCSampler(std_gauss, n_chains=8, n_params=D, seed=0)
    u.init_ball(np.zeros(D), scale=1.0, seed=1)
    with pytest.raises(TypeError, match="MAMSSampler"):
        load_checkpoint(u, ck)
    u.run(10)
    ck2 = save_checkpoint(u, tmp_path / "mc.npz")
    with pytest.raises(TypeError, match="unadjusted"):
        load_checkpoint(m, ck2)


def test_inv_mass_reassignment_invalidates_cached_programs():
    """inv_mass is baked into the jitted run program as a trace-time
    constant; direct reassignment between run() calls must retrace (the
    round-4 review found the version-keyed cache silently reusing the
    OLD metric)."""
    def build():
        s = MCLMCSampler(std_gauss, n_chains=8, n_params=D, seed=0,
                         step_size=0.5, decoherence_length=3.0)
        s.init_ball(np.zeros(D), scale=1.0, seed=1)
        s.run(5)
        return s

    a, b = build(), build()
    np.testing.assert_array_equal(
        np.asarray(a.state.position), np.asarray(b.state.position)
    )
    v0 = b._metric_version
    b.inv_mass = np.full(D, 25.0)     # drastic whitening change
    assert b._metric_version > v0
    a.run(5)
    b.run(5)
    assert not np.array_equal(
        np.asarray(a.state.position), np.asarray(b.state.position)
    ), "reassigned inv_mass was ignored by a stale cached program"
    with pytest.raises(ValueError, match="inv_mass"):
        b.inv_mass = np.ones(D + 1)


def test_legacy_mclmc_checkpoint_loads_into_mams(tmp_path):
    """Pre-split checkpoints carry kind='mclmc' for BOTH algorithms;
    they must still resume under MAMS (with a warning), instead of
    being permanently unloadable."""
    import json
    import warnings

    from mcmcpp_tpu import MAMSSampler
    from mcmcpp_tpu.io.checkpoint import load_checkpoint, save_checkpoint

    u = MCLMCSampler(std_gauss, n_chains=8, n_params=D, seed=0,
                     step_size=0.5, decoherence_length=3.0)
    u.init_ball(np.zeros(D), scale=1.0, seed=1)
    u.run(5)
    ck = save_checkpoint(u, tmp_path / "legacy.npz")
    # rewrite as a legacy archive: no adjusted marker
    with np.load(ck) as z:
        arrays = {k: z[k] for k in z.files}
    meta = json.loads(bytes(arrays["__meta__"]).decode())
    del meta["adjusted"]
    arrays["__meta__"] = np.frombuffer(
        json.dumps(meta).encode(), np.uint8
    )
    np.savez_compressed(ck, **arrays)

    m = MAMSSampler(std_gauss, n_chains=8, n_params=D, seed=3,
                    step_size=0.5, decoherence_length=3.0,
                    target_accept=0.8)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        load_checkpoint(m, ck)
    assert any("legacy" in str(x.message) for x in w)
    assert m.target_accept == 0.8  # live settings kept
    m.run(3)  # resumes and runs
    assert np.isfinite(np.asarray(m.state.position)).all()


def test_legacy_mams_kind_checkpoint_stays_strict(tmp_path):
    """kind='mams' was ALWAYS written only by MAMS savers, so even a
    legacy archive (no 'adjusted' marker) must refuse to load into an
    unadjusted MCLMCSampler (round-4 second-review finding: the lenient
    migration branch must not drop this direction)."""
    import json

    from mcmcpp_tpu import MAMSSampler
    from mcmcpp_tpu.io.checkpoint import load_checkpoint, save_checkpoint

    m = MAMSSampler(std_gauss, n_chains=8, n_params=D, seed=0,
                    step_size=1.0, decoherence_length=5.0)
    m.init_ball(np.zeros(D), scale=1.0, seed=1)
    m.run(5)
    ck = save_checkpoint(m, tmp_path / "legacy_mams.npz")
    with np.load(ck) as z:
        arrays = {k: z[k] for k in z.files}
    meta = json.loads(bytes(arrays["__meta__"]).decode())
    del meta["adjusted"]
    arrays["__meta__"] = np.frombuffer(
        json.dumps(meta).encode(), np.uint8
    )
    np.savez_compressed(ck, **arrays)

    u = MCLMCSampler(std_gauss, n_chains=8, n_params=D, seed=0)
    with pytest.raises(TypeError, match="MAMSSampler"):
        load_checkpoint(u, ck)
    # and it still loads into the right class
    m2 = MAMSSampler(std_gauss, n_chains=8, n_params=D, seed=9,
                     step_size=1.0, decoherence_length=5.0)
    load_checkpoint(m2, ck)
    m2.run(3)
    assert np.isfinite(np.asarray(m2.state.position)).all()
