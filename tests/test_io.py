"""IO subsystem: engines × outputs matrix, checkpoint/resume round trips."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mcmcpp_tpu import EnsembleSampler, HMCSampler
from mcmcpp_tpu.analysis.histograms import CornerHistograms
from mcmcpp_tpu.io import (
    BinaryEngine, CsvEngine, Hdf5Engine, NpzEngine,
    DataWriter, ScalarOutput, MatrixOutput, Hist1dOutput, Hist2dOutput,
    HistMultiOutput, ChainOutput, save_checkpoint, load_checkpoint,
)
from mcmcpp_tpu.io.engines import read_npz

from tests.targets import skewed_gaussian_logp


def _sampled(tmp_path, n_steps=50):
    s = EnsembleSampler(skewed_gaussian_logp, n_walkers=16, n_params=2, seed=0)
    s.init_ball(np.zeros(2), scale=0.3, seed=1)
    s.run_mcmc(n_steps)
    return s


@pytest.mark.parametrize("engine_cls", [BinaryEngine, CsvEngine, Hdf5Engine,
                                        NpzEngine])
def test_engines_write_all_output_kinds(tmp_path, engine_cls):
    s = _sampled(tmp_path)
    ch = CornerHistograms(n_bins=8).calculate(s.get_samples())
    target = tmp_path / ("out.h5" if engine_cls is Hdf5Engine
                         else "out.npz" if engine_cls is NpzEngine else "out")
    with DataWriter(engine_cls(target)) as w:
        w.add(ScalarOutput("acceptance", s.acceptance_fraction))
        w.add(MatrixOutput("cov", np.cov(s.get_samples(flat=True).T)))
        counts, edges = ch.hist1d[0]
        w.add(Hist1dOutput("h1", counts, edges))
        c2, xe, ye = ch.hist2d[(0, 1)]
        w.add(Hist2dOutput("h2", c2, xe, ye))
        w.add(HistMultiOutput("corner", ch))
        w.add(ChainOutput("chain", s.chain))
    assert target.exists()


def test_npz_round_trip(tmp_path):
    s = _sampled(tmp_path)
    target = tmp_path / "chain.npz"
    with DataWriter(NpzEngine(target)) as w:
        w.add(ChainOutput("chain", s.chain, meta={"run": "r1"}))
        w.add(ScalarOutput("accept", s.acceptance_fraction))
    arrays, meta = read_npz(target)
    np.testing.assert_array_equal(arrays["chain_samples"], s.get_samples())
    np.testing.assert_array_equal(arrays["chain_logp"], s.get_log_probs())
    assert meta["chain_samples"]["run"] == "r1"
    assert arrays["accept"] == pytest.approx(s.acceptance_fraction)


def test_hdf5_readback(tmp_path):
    h5py = pytest.importorskip("h5py")
    s = _sampled(tmp_path)
    target = tmp_path / "out.h5"
    with DataWriter(Hdf5Engine(target)) as w:
        w.add(ChainOutput("chain", s.chain))
    with h5py.File(target, "r") as f:
        np.testing.assert_array_equal(f["chain_samples"][...], s.get_samples())


def test_checkpoint_resume_ensemble_bitwise(tmp_path):
    """Resume from checkpoint == uninterrupted run, bit for bit."""
    a = _sampled(tmp_path, n_steps=30)
    ckpt = save_checkpoint(a, tmp_path / "ck.npz")
    a.run_mcmc(30)  # uninterrupted continuation

    b = EnsembleSampler(skewed_gaussian_logp, n_walkers=16, n_params=2, seed=99)
    b.init_ball(np.zeros(2), scale=0.3, seed=2)  # different everything
    load_checkpoint(b, ckpt)
    b.run_mcmc(30)

    np.testing.assert_array_equal(a.get_samples(), b.get_samples())
    assert a.accepted_steps == b.accepted_steps
    assert a.total_steps == b.total_steps


def test_checkpoint_version_mismatch_is_actionable(tmp_path):
    """Round-2 advisor: a v1/v2 archive died with an opaque KeyError
    (v3 renamed the ensemble keys); loading must fail with a clear
    incompatible-version error instead."""
    import json

    s = _sampled(tmp_path, n_steps=10)
    ckpt = save_checkpoint(s, tmp_path / "old.npz")
    with np.load(ckpt, allow_pickle=False) as z:
        payload = {k: z[k] for k in z.files}
    meta = json.loads(bytes(payload["__meta__"]).decode())
    meta["format"] = 2
    payload["__meta__"] = np.frombuffer(
        json.dumps(meta).encode(), dtype=np.uint8
    )
    np.savez(ckpt, **payload)
    with pytest.raises(ValueError, match="incompatible checkpoint format"):
        load_checkpoint(s, ckpt)


def test_checkpoint_resume_gradient_bitwise(tmp_path):
    def logp(t):
        return -0.5 * jnp.sum(t * t)

    a = HMCSampler(logp, n_chains=8, n_params=3, seed=4, n_leapfrog=8)
    a.init_ball(np.zeros(3), scale=1.0, seed=5)
    a.warmup(50)
    a.run(20)
    ckpt = save_checkpoint(a, tmp_path / "g.npz")
    a.run(20)

    b = HMCSampler(logp, n_chains=8, n_params=3, seed=123, n_leapfrog=8)
    b.init_ball(np.ones(3), scale=2.0, seed=6)
    load_checkpoint(b, ckpt)
    b.run(20)

    np.testing.assert_array_equal(a.get_samples(), b.get_samples())
    np.testing.assert_array_equal(np.asarray(a.step_size), np.asarray(b.step_size))


def test_checkpoint_resume_chees_bitwise(tmp_path):
    from mcmcpp_tpu import CheesHMCSampler

    def logp(t):
        return -0.5 * jnp.sum(t * t)

    a = CheesHMCSampler(logp, n_chains=8, n_params=3, seed=4)
    a.init_ball(np.zeros(3), scale=1.0, seed=5)
    a.warmup(50)
    a.run(20)
    ckpt = save_checkpoint(a, tmp_path / "c.npz")
    a.run(20)

    b = CheesHMCSampler(logp, n_chains=8, n_params=3, seed=123)
    b.init_ball(np.ones(3), scale=2.0, seed=6)
    b.warmup(10)  # stale adapted state + compiled run cache to clobber
    b.run(5)
    b.chain.clear()
    load_checkpoint(b, ckpt)
    assert b.traj_length == a.traj_length
    b.run(20)

    np.testing.assert_array_equal(a.get_samples(), b.get_samples())


def test_checkpoint_resume_chees_continuous_adapt_bitwise(tmp_path):
    """The live (log T, Adam) state must survive a checkpoint so a
    resumed continuously-adapting run is bitwise-identical."""
    from mcmcpp_tpu import CheesHMCSampler

    def logp(t):
        return -0.5 * jnp.sum(t * t)

    a = CheesHMCSampler(logp, n_chains=8, n_params=3, seed=4,
                        continuous_adapt=True)
    a.init_ball(np.zeros(3), scale=1.0, seed=5)
    a.warmup(50)
    a.run(20)
    ckpt = save_checkpoint(a, tmp_path / "ca.npz")
    a.run(20)

    b = CheesHMCSampler(logp, n_chains=8, n_params=3, seed=123,
                        continuous_adapt=True)
    b.init_ball(np.ones(3), scale=2.0, seed=6)
    b.warmup(10)
    b.run(5)
    b.chain.clear()
    load_checkpoint(b, ckpt)
    b.run(20)

    np.testing.assert_array_equal(a.get_samples(), b.get_samples())
    assert float(b._sadapt[0]) == float(a._sadapt[0])


def test_checkpoint_shape_mismatch_rejected(tmp_path):
    a = _sampled(tmp_path, n_steps=5)
    ckpt = save_checkpoint(a, tmp_path / "ck.npz")
    wrong = EnsembleSampler(skewed_gaussian_logp, n_walkers=32, n_params=2)
    with pytest.raises(ValueError):
        load_checkpoint(wrong, ckpt)


def test_auto_checkpoint_during_run(tmp_path):
    """checkpoint_path writes resumable snapshots while sampling."""
    ck = tmp_path / "auto.npz"
    s = EnsembleSampler(skewed_gaussian_logp, n_walkers=16, n_params=2,
                        seed=0, store_chunk_steps=10)
    s.init_ball(np.zeros(2), scale=0.3, seed=1)
    s.run_mcmc(50, checkpoint_path=ck, checkpoint_every=2)
    assert ck.exists()
    r = EnsembleSampler(skewed_gaussian_logp, n_walkers=16, n_params=2, seed=9)
    r.init_ball(np.ones(2), seed=2)
    load_checkpoint(r, ck)
    # snapshot is self-consistent and resumable
    assert r.stored_steps > 0
    assert r.run_mcmc(10) is True
    assert r.stored_steps > 10


def test_readme_quickstart_flow():
    """The README quickstart must keep working verbatim (shrunk sizes)."""
    from mcmcpp_tpu import analysis as _an
    import jax.numpy as _jnp

    def logp(theta):
        return -0.5 * (theta @ theta)

    s = EnsembleSampler(logp, n_walkers=64, n_params=2, seed=0)
    s.init_ball(np.zeros(2), scale=0.3)
    s.run_mcmc(200, store=False)
    s.run_mcmc(2000, thin=10)
    assert 0.3 < s.acceptance_fraction < 0.95
    tau = _an.autocorr_time(s.get_samples())
    assert np.all(tau > 0)
    summ = _an.summary(s.get_samples())
    assert np.all(summ["rhat"] < 1.1)


def test_writer_aborts_on_exception(tmp_path):
    """Body raising inside `with DataWriter(...)` must not finalize ANY
    artifact (no empty .npz, no manifest, no stale .h5)."""
    h5py = pytest.importorskip("h5py", reason="hdf5 abort path needs h5py")
    for engine, artifact in [
        (NpzEngine(tmp_path / "t"), tmp_path / "t.npz"),
        (BinaryEngine(tmp_path / "bin"), tmp_path / "bin" / "manifest.json"),
        (Hdf5Engine(tmp_path / "t.h5"), tmp_path / "t.h5"),
    ]:
        with pytest.raises(RuntimeError, match="boom"):
            with DataWriter(engine) as w:
                w.add("x", np.ones(3))
                raise RuntimeError("boom")
        assert not artifact.exists(), artifact


def test_checkpoint_resume_dense_metric_bitwise(tmp_path):
    """Dense metric round-trips as a rebuilt DenseMassMatrix (a naive
    np.asarray of the NamedTuple would stack it into a (3,P,P) array)."""
    from mcmcpp_tpu.gradient.metric import DenseMassMatrix

    def logp(t):
        return -0.5 * jnp.sum(t * t) - 0.4 * t[0] * t[1]

    a = HMCSampler(logp, n_chains=8, n_params=3, seed=4, n_leapfrog=8,
                   metric="dense")
    a.init_ball(np.zeros(3), scale=1.0, seed=5)
    a.warmup(60)
    a.run(20)
    ckpt = save_checkpoint(a, tmp_path / "d.npz")
    a.run(20)

    b = HMCSampler(logp, n_chains=8, n_params=3, seed=123, n_leapfrog=8,
                   metric="dense")
    b.init_ball(np.ones(3), scale=2.0, seed=6)
    load_checkpoint(b, ckpt)
    assert isinstance(b.inv_mass, DenseMassMatrix)
    b.run(20)

    np.testing.assert_array_equal(a.get_samples(), b.get_samples())


def test_checkpoint_resume_meads_bitwise(tmp_path):
    """MEADS persistent momentum is chain state and must survive resume."""
    from mcmcpp_tpu import MEADSSampler
    from mcmcpp_tpu.gradient.meads import MEADSState

    def logp(t):
        return -0.5 * jnp.sum(t * t)

    a = MEADSSampler(logp, n_chains=16, n_params=3, seed=4)
    a.init_ball(np.zeros(3), scale=1.0, seed=5)
    a.warmup(30)
    a.run(20)
    ckpt = save_checkpoint(a, tmp_path / "m.npz")
    a.run(20)

    b = MEADSSampler(logp, n_chains=16, n_params=3, seed=123)
    b.init_ball(np.ones(3), scale=2.0, seed=6)
    load_checkpoint(b, ckpt)
    assert isinstance(b.state, MEADSState)
    b.run(20)

    np.testing.assert_array_equal(a.get_samples(), b.get_samples())


def test_checkpoint_preserves_sample_stats(tmp_path):
    def logp(t):
        return -0.5 * jnp.sum(t * t)

    a = HMCSampler(logp, n_chains=8, n_params=3, seed=4, n_leapfrog=8)
    a.init_ball(np.zeros(3), scale=1.0, seed=5)
    a.warmup(30)
    a.run(25)
    ckpt = save_checkpoint(a, tmp_path / "s.npz")

    b = HMCSampler(logp, n_chains=8, n_params=3, seed=123, n_leapfrog=8)
    b.init_ball(np.ones(3), scale=2.0, seed=6)
    b.warmup(5)
    b.run(5)  # stale stats that the load must replace
    load_checkpoint(b, ckpt)
    sa, sb = a.get_sample_stats(), b.get_sample_stats()
    np.testing.assert_array_equal(sa["diverging"], sb["diverging"])
    np.testing.assert_array_equal(sa["energy"], sb["energy"])
    b.run(10)
    assert b.get_sample_stats()["energy"].shape[0] == 35


def test_gradient_run_auto_checkpoint_resume(tmp_path):
    """run(checkpoint_path=...): periodic consistent snapshots; resuming
    from the final snapshot bitwise-continues (mirrors the ensemble
    driver's crash-recovery contract)."""
    def logp(t):
        return -0.5 * jnp.sum(t * t)

    ck = tmp_path / "auto.npz"
    a = HMCSampler(logp, n_chains=8, n_params=3, seed=4, n_leapfrog=8)
    a.init_ball(np.zeros(3), scale=1.0, seed=5)
    a.warmup(30)
    a.run(25, checkpoint_path=ck)
    assert ck.exists()
    a.run(25)

    b = HMCSampler(logp, n_chains=8, n_params=3, seed=123, n_leapfrog=8)
    b.init_ball(np.ones(3), scale=2.0, seed=6)
    load_checkpoint(b, ck)
    assert b.get_samples().shape[0] == 25  # snapshot carried the chain
    b.run(25)
    np.testing.assert_array_equal(a.get_samples(), b.get_samples())
    np.testing.assert_array_equal(
        a.get_sample_stats()["energy"], b.get_sample_stats()["energy"]
    )


def test_checkpoint_resume_pt_bitwise(tmp_path):
    """PT resume == uninterrupted run, bit for bit (plain mode), incl.
    swap statistics and a tuned (non-default) ladder."""
    from mcmcpp_tpu import ParallelTemperingSampler

    def make(seed):
        s = ParallelTemperingSampler(
            skewed_gaussian_logp, n_walkers=16, n_params=2, n_temps=4,
            seed=7, swap_every=2,
        )
        s.init_ball(np.zeros(2), scale=0.3, seed=seed)
        return s

    a = make(2)
    a.run_mcmc(40)
    ckpt = save_checkpoint(a, tmp_path / "pt.npz")
    a.run_mcmc(40)

    b = make(55)  # different init; fully overwritten by the checkpoint
    load_checkpoint(b, ckpt)
    b.run_mcmc(40)
    np.testing.assert_array_equal(a.get_samples(), b.get_samples())
    np.testing.assert_array_equal(a.swap_acceptance, b.swap_acceptance)


def test_checkpoint_resume_pt_power_bitwise(tmp_path):
    """Power-posterior PT: the evidence accumulators must travel with the
    checkpoint so log_evidence after resume == uninterrupted."""
    from mcmcpp_tpu import ParallelTemperingSampler, power_ladder

    def lp(t):
        return -0.5 * jnp.sum(t * t) / 4.0

    def ll(t):
        return -0.5 * jnp.sum((t - 1.0) ** 2)

    def make():
        s = ParallelTemperingSampler(
            loglike_fn=ll, logprior_fn=lp, n_walkers=16, n_params=2,
            betas=power_ladder(4), seed=3,
        )
        s.init_ball(np.zeros(2), scale=0.5, seed=4)
        return s

    a = make()
    a.run_mcmc(30)
    ckpt = save_checkpoint(a, tmp_path / "ptp.npz")
    a.run_mcmc(30)

    b = make()
    load_checkpoint(b, ckpt)
    b.run_mcmc(30)
    np.testing.assert_array_equal(a.get_samples(), b.get_samples())
    assert a.log_evidence("stepping_stone") == b.log_evidence(
        "stepping_stone")
    assert a.log_evidence("ti") == b.log_evidence("ti")


def test_checkpoint_resume_smc_bitwise(tmp_path):
    """SMC mid-anneal resume: remaining stages reproduce the uninterrupted
    run's particles and evidence exactly."""
    from mcmcpp_tpu.smc import SMCSampler

    def lp(t):
        return -0.5 * jnp.sum(t**2) / 4.0

    def ll(t):
        return -40.0 * 0.5 * jnp.sum((t - 1.0) ** 2)  # peaked: >1 stage

    def ps(key, n):
        return 2.0 * jax.random.normal(key, (n, 2))

    def make():
        return SMCSampler(lp, ll, ps, n_particles=256, n_params=2,
                          n_mcmc=3, seed=6)

    a = make()
    a.init()
    # advance ONE stage exactly as run() does, then checkpoint mid-anneal
    a._key, k = jax.random.split(a._key)
    a.state, a._flow_carry = a._stage(k, a.state, a._flow_carry)
    a.n_stages += 1
    a.beta_ladder.append(float(a.state.beta))
    assert float(a.state.beta) < 1.0, "oracle needs a multi-stage anneal"
    ckpt = save_checkpoint(a, tmp_path / "smc.npz")
    b = make()
    load_checkpoint(b, ckpt)
    a.run()
    b.run()
    np.testing.assert_array_equal(a.particles, b.particles)
    assert a.log_evidence == b.log_evidence
    assert a.n_stages == b.n_stages
    assert a.beta_ladder == b.beta_ladder


def test_checkpoint_resume_smc_flow_bitwise(tmp_path):
    """Flow-mutation SMC carries flow params + Adam moments across the
    checkpoint: resume must be bitwise (the warm-started per-stage refit
    continues from the saved optimizer state, not from scratch)."""
    from mcmcpp_tpu.smc import SMCSampler
    from mcmcpp_tpu.neutra import RealNVP

    def lp(t):
        return -0.5 * jnp.sum(t**2) / 4.0

    def ll(t):
        return -40.0 * 0.5 * jnp.sum((t - 1.0) ** 2)

    def ps(key, n):
        return 2.0 * jax.random.normal(key, (n, 2))

    def make():
        return SMCSampler(lp, ll, ps, n_particles=256, n_params=2,
                          n_mcmc=3, seed=6, mutation="flow",
                          flow=RealNVP(2, n_layers=2, hidden=16),
                          flow_fit_steps=20)

    a = make()
    a.init()
    a._key, k = jax.random.split(a._key)
    a.state, a._flow_carry = a._stage(k, a.state, a._flow_carry)
    a.n_stages += 1
    a.beta_ladder.append(float(a.state.beta))
    assert float(a.state.beta) < 1.0, "oracle needs a multi-stage anneal"
    ckpt = save_checkpoint(a, tmp_path / "smc_flow.npz")
    b = make()
    load_checkpoint(b, ckpt)
    a.run()
    b.run()
    np.testing.assert_array_equal(a.particles, b.particles)
    assert a.log_evidence == b.log_evidence

    # loading a flow checkpoint into a non-flow sampler is an actionable
    # error, not a silent refit-from-scratch
    c = SMCSampler(lp, ll, ps, n_particles=256, n_params=2, n_mcmc=3,
                   seed=6)
    with pytest.raises(ValueError, match="flow-mutation mismatch"):
        load_checkpoint(c, ckpt)


def test_checkpoint_resume_sgld_bitwise(tmp_path):
    from mcmcpp_tpu import SGLDSampler

    data = np.linspace(-1, 1, 64).astype(np.float32)[:, None]

    def lprior(t):
        return -0.5 * jnp.sum(t * t)

    def llike(t, batch):
        return jnp.sum(-0.5 * (batch - t) ** 2)

    def make(seed):
        s = SGLDSampler(lprior, llike, data, n_chains=4, n_params=1,
                        batch_size=16, step_size=1e-3, seed=9)
        s.init_ball(np.zeros(1), scale=0.1, seed=seed)
        return s

    a = make(1)
    a.run(40, thin=2)
    ckpt = save_checkpoint(a, tmp_path / "sg.npz")
    a.run(40, thin=2)

    b = make(77)
    load_checkpoint(b, ckpt)
    b.run(40, thin=2)
    np.testing.assert_array_equal(a.get_samples(), b.get_samples())


def test_checkpoint_kind_mismatch_rejected(tmp_path):
    from mcmcpp_tpu import ParallelTemperingSampler

    a = _sampled(tmp_path, n_steps=5)
    ckpt = save_checkpoint(a, tmp_path / "e.npz")
    pt = ParallelTemperingSampler(
        skewed_gaussian_logp, n_walkers=16, n_params=2, n_temps=2, seed=0
    )
    with pytest.raises(TypeError, match="EnsembleSampler"):
        load_checkpoint(pt, ckpt)
