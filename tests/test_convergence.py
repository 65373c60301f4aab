"""run_until_converged: ACT-criterion-driven sampling for both families."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mcmcpp_tpu import (
    AutoRegressiveMove,
    EnsembleSampler,
    HMCSampler,
    run_until_converged,
)


def _dummy_logp(theta):
    return 0.0 * theta[0]


def test_converges_on_fast_mixing_ar1():
    """AR(1) phi=0.8 (tau=9): must converge well within budget, with the
    chain at least act_multiplier*tau long and the reported tau near truth."""
    mover = AutoRegressiveMove(offsets=[0.0], phis=[0.8], variances=[1.0])
    s = EnsembleSampler(_dummy_logp, 64, 1, mover=mover, seed=0)
    s.set_initial_walker_pos(mover.initial_positions(jax.random.key(0), 64))
    seen = []
    rep = run_until_converged(
        s, max_steps=60000, check_every=2000, act_multiplier=50,
        callback=seen.append,
    )
    assert rep.converged, rep
    assert rep.reason == "converged"
    assert rep.steps_run < 60000  # stopped early
    assert rep.stored_steps > 50 * rep.tau.max()
    assert abs(rep.tau[0] - 9.0) / 9.0 < 0.25
    assert len(seen) == rep.checks and seen[-1] == rep

    # sampler state is intact: more sampling still works
    assert s.run_mcmc(100)


def test_budget_exhaustion_reports_unconverged():
    """AR(1) phi=0.999 (tau~2000): a tiny budget cannot satisfy the
    length criterion; report must say so rather than lie."""
    mover = AutoRegressiveMove(offsets=[0.0], phis=[0.999], variances=[1.0])
    s = EnsembleSampler(_dummy_logp, 32, 1, mover=mover, seed=1)
    s.set_initial_walker_pos(mover.initial_positions(jax.random.key(1), 32))
    rep = run_until_converged(s, max_steps=3000, check_every=1500)
    assert not rep.converged
    assert "exhausted" in rep.reason
    assert rep.steps_run == 3000


def test_gradient_sampler_with_rhat_gate():
    def logp(t):
        return -0.5 * jnp.sum(t * t)

    s = HMCSampler(logp, n_chains=16, n_params=2, seed=2, n_leapfrog=8)
    s.init_ball(np.zeros(2), scale=1.0, seed=3)
    s.warmup(200)
    rep = run_until_converged(
        s, max_steps=20000, check_every=1000, act_multiplier=50,
        rhat_threshold=1.05,
    )
    assert rep.converged, rep
    assert np.all(rep.rhat < 1.05)
    flat = s.get_samples(flat=True)
    np.testing.assert_allclose(flat.std(axis=0), 1.0, atol=0.1)


def test_bad_args_rejected():
    mover = AutoRegressiveMove(offsets=[0.0], phis=[0.5], variances=[1.0])
    s = EnsembleSampler(_dummy_logp, 8, 1, mover=mover, seed=0)
    with pytest.raises(ValueError):
        run_until_converged(s, max_steps=0)
    with pytest.raises(ValueError):
        run_until_converged(s, max_steps=10, check_every=0)


def test_capacity_reached_before_usable_chain():
    """Chain byte cap hit while < 8 rows stored: must report capacity, not
    burn the whole budget (review regression)."""
    mover = AutoRegressiveMove(offsets=[0.0], phis=[0.5], variances=[1.0])
    s = EnsembleSampler(_dummy_logp, 32, 1, mover=mover, seed=2,
                        max_chain_bytes=4 * 32 * 2 * 4)  # 4 rows
    s.set_initial_walker_pos(mover.initial_positions(jax.random.key(2), 32))
    rep = run_until_converged(s, max_steps=50000, check_every=100)
    assert rep.reason == "chain capacity reached"
    assert rep.steps_run <= 200  # stopped at the first capacity signal


def test_mess_rule_gates_convergence():
    # loose (alpha, eps) passes quickly; absurdly tight eps cannot pass
    # within the budget and the reason names the mESS rule
    logp = lambda t: -0.5 * jnp.sum(t * t)
    s = EnsembleSampler(logp, n_walkers=64, n_params=2, seed=0)
    s.init_ball(np.zeros(2), scale=0.5, seed=1)
    rep = run_until_converged(
        s, max_steps=4000, check_every=1000, act_multiplier=10.0,
        mess_rule=(0.05, 0.5),
    )
    assert rep.converged and rep.mess > 0

    s2 = EnsembleSampler(logp, n_walkers=64, n_params=2, seed=2)
    s2.init_ball(np.zeros(2), scale=0.5, seed=3)
    rep2 = run_until_converged(
        s2, max_steps=8000, check_every=1000, act_multiplier=10.0,
        mess_rule=(0.05, 1e-4),
    )
    assert not rep2.converged
    assert "mESS" in rep2.reason


def test_microcanonical_engines_drive_the_gate():
    """run_until_converged drives MAMS through the same run/get_samples
    contract as every other engine (exact sampler -> rhat gate valid)."""
    import jax.numpy as jnp

    from mcmcpp_tpu import MAMSSampler
    from mcmcpp_tpu.convergence import run_until_converged

    s = MAMSSampler(lambda t: -0.5 * jnp.sum(t * t), n_chains=32,
                    n_params=3, seed=0, step_size=1.2,
                    decoherence_length=3.0)
    s.init_ball(np.zeros(3), scale=1.0, seed=1)
    rep = run_until_converged(s, max_steps=4000, check_every=1000,
                              rhat_threshold=1.05)
    assert rep.converged, rep
    assert np.all(rep.rhat < 1.05)


def test_nested_rhat_gate_blocks_then_passes():
    """nested_superchains gating (round 5): a well-mixed Gaussian run
    passes the nested gate; a forced-tight threshold blocks with the
    nested reason."""
    import jax.numpy as jnp

    from mcmcpp_tpu import EnsembleSampler
    from mcmcpp_tpu.convergence import run_until_converged

    def make():
        s = EnsembleSampler(
            lambda t: -0.5 * jnp.sum(t * t), 64, 2, seed=9
        )
        centers = np.repeat(np.linspace(-1.5, 1.5, 8), 8)
        init = centers[:, None] + 0.01 * np.random.default_rng(10
            ).standard_normal((64, 2))
        s.set_initial_walker_pos(init)
        s.run_mcmc(400, store=False)
        return s

    r = run_until_converged(
        make(), max_steps=4000, check_every=1000,
        nested_superchains=8,
    )
    assert r.converged, r.reason
    assert r.nested is not None and np.all(r.nested < 1.01)

    r2 = run_until_converged(
        make(), max_steps=3000, check_every=1000,
        act_multiplier=1.0, tau_rtol=1.0,  # isolate the nested gate
        nested_superchains=8, nested_rhat_threshold=1.0,  # impossible
    )
    assert not r2.converged
    assert "nested rhat" in r2.reason
