"""DiskChain: spooled chain store parity with the in-RAM Chain."""

import numpy as np
import pytest

from mcmcpp_tpu import Chain, DiskChain, EnsembleSampler, HMCSampler

from tests.targets import skewed_gaussian_logp


def _fill(chain, rng, blocks=(7, 11, 5)):
    for s in blocks:
        pos = rng.normal(size=(s, chain.n_walkers, chain.n_params))
        lp = rng.normal(size=(s, chain.n_walkers))
        assert chain.append(pos, lp)
    return chain


def test_matches_ram_chain_views(tmp_path):
    rng1, rng2 = (np.random.default_rng(0) for _ in range(2))
    ram = _fill(Chain(8, 3, backend="numpy"), rng1)
    disk = _fill(DiskChain(tmp_path / "c", 8, 3), rng2)
    for kw in ({}, {"burn_in": 4}, {"thin": 3}, {"burn_in": 5, "thin": 4},
               {"flat": True}, {"burn_in": 2, "thin": 2, "flat": True}):
        np.testing.assert_array_equal(ram.get(**kw), disk.get(**kw))
        np.testing.assert_array_equal(ram.get_logp(**kw), disk.get_logp(**kw))
    assert disk.n_steps == ram.n_steps == 23


def test_reopen_and_resume(tmp_path):
    rng = np.random.default_rng(1)
    d = _fill(DiskChain(tmp_path / "c", 4, 2), rng)
    before = d.get()
    # fresh handle over the same directory sees everything and can extend
    d2 = DiskChain.open(tmp_path / "c")
    np.testing.assert_array_equal(d2.get(), before)
    d2.append(np.ones((2, 4, 2)), np.ones((2, 4)))
    assert d2.n_steps == before.shape[0] + 2


def test_compact_streams(tmp_path):
    rng = np.random.default_rng(2)
    d = _fill(DiskChain(tmp_path / "c", 4, 2), rng, blocks=(10, 10, 10))
    expect = d.get(burn_in=7, thin=3)
    d.compact(burn_in=7, thin=3)
    np.testing.assert_array_equal(d.get(), expect)
    assert d.n_steps == expect.shape[0]
    # logp kept aligned
    assert d.get_logp().shape == (expect.shape[0], 4)


def test_byte_cap_endofchain(tmp_path):
    d = DiskChain(tmp_path / "c", 4, 2, max_bytes=5 * 4 * 3 * 4)  # 5 rows
    ok = d.append(np.zeros((8, 4, 2)))
    assert not ok  # partial append, EndOfChain
    assert d.n_steps == 5


def test_geometry_mismatch_rejected(tmp_path):
    DiskChain(tmp_path / "c", 4, 2).append(np.zeros((1, 4, 2)))
    with pytest.raises(ValueError, match="holds a"):
        DiskChain(tmp_path / "c", 8, 2)


def test_sampler_injection_end_to_end(tmp_path):
    s = EnsembleSampler(
        skewed_gaussian_logp, 64, 2, seed=0,
        chain=DiskChain(tmp_path / "ens", 64, 2),
    )
    s.init_ball(np.zeros(2), scale=0.3)
    s.run_mcmc(200, store=False)
    assert s.run_mcmc(800)
    assert s.chain.backend == "disk"
    flat = s.get_samples(burn_in=100, flat=True)
    assert abs(float(np.cov(flat.T)[0, 0]) - 1.13) < 0.3

    import jax.numpy as jnp

    g = HMCSampler(
        lambda t: -0.5 * jnp.sum(t * t), n_chains=8, n_params=2, seed=1,
        n_leapfrog=8, chain=DiskChain(tmp_path / "grad", 8, 2),
    )
    g.init_ball(np.zeros(2), scale=1.0)
    g.warmup(100)
    g.run(300)
    assert g.get_samples(flat=True).std() == pytest.approx(1.0, rel=0.15)

    with pytest.raises(ValueError, match="geometry"):
        EnsembleSampler(skewed_gaussian_logp, 64, 2,
                        chain=DiskChain(tmp_path / "bad", 32, 2))


def test_open_restores_byte_cap(tmp_path):
    """max_bytes must survive reopen (EndOfChain semantics on resume)."""
    cap = 5 * 4 * 3 * 4  # 5 rows
    d = DiskChain(tmp_path / "c", 4, 2, max_bytes=cap)
    d.append(np.zeros((3, 4, 2)))
    d2 = DiskChain.open(tmp_path / "c")
    assert d2.max_bytes == cap
    assert not d2.append(np.zeros((8, 4, 2)))  # cap still enforced
    # explicit override wins
    d3 = DiskChain(tmp_path / "c", 4, 2, max_bytes=10 * cap)
    assert d3.max_bytes == 10 * cap


def test_tempering_accepts_disk_chain(tmp_path):
    from mcmcpp_tpu import ParallelTemperingSampler

    from tests.targets import skewed_gaussian_logp

    s = ParallelTemperingSampler(
        skewed_gaussian_logp, n_walkers=16, n_params=2, n_temps=3, seed=1,
        chain=DiskChain(tmp_path / "pt", 16, 2),
    )
    s.init_ball(np.zeros(2), scale=0.3)
    s.run_mcmc(25)
    assert s.chain.backend == "disk"
    assert s.get_samples().shape == (25, 16, 2)
    assert s.get_log_probs().shape == (25, 16)


def test_streaming_act_consume_disk_chain(tmp_path):
    """consume_chain must fold in only new rows, staying correct across
    multiple appends on a disk spool."""
    from mcmcpp_tpu.analysis import StreamingACT, autocorr_time

    rng = np.random.default_rng(0)
    phi = 0.8
    S, W = 4000, 8
    x = np.zeros((S, W, 1))
    for t in range(1, S):
        x[t] = phi * x[t - 1] + np.sqrt(1 - phi**2) * rng.normal(size=(W, 1))
    d = DiskChain(tmp_path / "c", W, 1)
    act = StreamingACT(max_lag=256)
    for i in range(0, S, 700):
        d.append(x[i : i + 700])
        act.consume_chain(d)
    tau_online = act.autocorr_time()
    tau_batch = autocorr_time(d.get())
    np.testing.assert_allclose(tau_online[0], tau_batch, rtol=0.02)


def test_disk_chain_injects_into_gibbs_and_elliptical(tmp_path):
    """The spool composes with the round-2 engines: identical samples to
    the in-RAM chain for the same seeds."""
    import jax.numpy as jnp
    from mcmcpp_tpu import (
        BlockedGibbsSampler,
        EllipticalSliceSampler,
        MALAKernel,
    )

    def run_gibbs(chain):
        s = BlockedGibbsSampler(
            [("x", 3, MALAKernel(lambda x, o: -0.5 * jnp.sum(x * x), 0.6))],
            n_chains=8, seed=3, chain=chain,
        )
        s.init({"x": np.zeros(3)})
        s.run(40, thin=2)
        return s.get_samples()

    a = run_gibbs(None)
    b = run_gibbs(DiskChain(tmp_path / "g", 8, 3))
    np.testing.assert_array_equal(a, b)

    def run_ess(chain):
        s = EllipticalSliceSampler(
            lambda f: -0.5 * jnp.sum((f - 1.0) ** 2),
            prior_mean=np.zeros(3), prior_scale=np.ones(3),
            n_chains=8, seed=4, chain=chain,
        )
        s.init_prior(seed=5)
        s.run(40, thin=2)
        return s.get_samples()

    a = run_ess(None)
    b = run_ess(DiskChain(tmp_path / "e", 8, 3))
    np.testing.assert_array_equal(a, b)
