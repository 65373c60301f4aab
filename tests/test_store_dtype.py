"""Reduced-precision chain store (store_dtype=bf16/f16).

Round-2 verdict weak-item 3: the store-inclusive ESS/s window is bound by
offload bytes on any link; a reduced-precision store dtype halves the
payload. The COMPUTE path stays full precision — only the emitted rows are
down-cast, on device, inside the scan body (sampler.run_scan) — so the
trajectory is bitwise unchanged and the stored values differ from the
full-precision store only by one rounding (bf16: 8 mantissa bits, rel.
error <= 2^-8). These tests document the analysis-precision tolerance.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from mcmcpp_tpu import EnsembleSampler, analysis

EPS = 0.13


def skewed_logp(t):
    a, b = t[0] / 2 - t[1], t[0] / 2 + t[1]
    return -0.5 * (a * a / EPS + b * b)


def _run(store_dtype, n_steps=2000, seed=3):
    s = EnsembleSampler(
        skewed_logp, n_walkers=64, n_params=2, seed=seed,
        store_dtype=store_dtype,
    )
    s.init_ball(np.zeros(2), scale=0.3, seed=4)
    s.run_mcmc(200, store=False)
    s.run_mcmc(n_steps, thin=2)
    return s


class TestStoreDtype:
    def test_bf16_halves_stored_bytes(self):
        a = _run(None, n_steps=200)
        b = _run(jnp.bfloat16, n_steps=200)
        assert a.chain.n_steps == b.chain.n_steps
        assert b.chain.nbytes * 2 == a.chain.nbytes

    def test_reads_cast_up_to_float32(self):
        s = _run(jnp.bfloat16, n_steps=100)
        assert s.get_samples().dtype == np.float32
        assert s.get_log_probs().dtype == np.float32
        assert s.get_samples(flat=True).dtype == np.float32

    def test_trajectory_unchanged_rows_one_rounding_away(self):
        """Same seed with and without store_dtype: identical trajectory,
        stored rows differ only by the single bf16 rounding."""
        a = _run(None)
        b = _run(jnp.bfloat16)
        xa, xb = a.get_samples(), b.get_samples()
        assert xa.shape == xb.shape
        scale = np.maximum(np.abs(xa), 1e-3)
        assert np.max(np.abs(xa - xb) / scale) <= 2.0 ** -8
        # acceptance bookkeeping untouched by the store cast
        assert a.accepted_steps == b.accepted_steps

    def test_analysis_tolerance_moments_and_act(self):
        """Documented tolerance: bf16 storage shifts posterior moments and
        ACT estimates well inside Monte Carlo error."""
        a = _run(None)
        b = _run(jnp.bfloat16)
        ca = np.cov(a.get_samples(flat=True).T)
        cb = np.cov(b.get_samples(flat=True).T)
        np.testing.assert_allclose(cb, ca, rtol=5e-3, atol=5e-4)
        ta = analysis.autocorr_time(a.get_samples())
        tb = analysis.autocorr_time(b.get_samples())
        np.testing.assert_allclose(tb, ta, rtol=0.02)

    def test_f16_path(self):
        s = _run(jnp.float16, n_steps=100)
        assert s.chain.dtype == np.float16
        x = s.get_samples()
        assert x.dtype == np.float32 and np.isfinite(x).all()

    def test_checkpoint_resume_bitwise_with_bf16_store(self, tmp_path):
        from mcmcpp_tpu.io.checkpoint import load_checkpoint, save_checkpoint

        a = _run(jnp.bfloat16, n_steps=200)
        ck = save_checkpoint(a, tmp_path / "ck.npz")
        a.run_mcmc(100, thin=2)
        b = EnsembleSampler(
            skewed_logp, n_walkers=64, n_params=2, seed=9,
            store_dtype=jnp.bfloat16,
        )
        b.init_ball(np.ones(2), scale=0.9, seed=10)
        load_checkpoint(b, ck)
        b.run_mcmc(100, thin=2)
        np.testing.assert_array_equal(a.get_samples(), b.get_samples())

    def test_sharded_store_dtype(self):
        from mcmcpp_tpu import ShardedEnsembleSampler
        from mcmcpp_tpu.parallel.mesh import make_walker_mesh

        s = ShardedEnsembleSampler(
            skewed_logp, n_walkers=32, n_params=2, seed=5,
            mesh=make_walker_mesh(), store_dtype=jnp.bfloat16,
        )
        s.init_ball(np.zeros(2), scale=0.3, seed=6)
        s.run_mcmc(50)
        x = s.get_samples()
        assert x.shape[0] == 50 and x.dtype == np.float32

    # --- f8 tier (round-3 verdict weak-item 5; round-4 measurement) --------

    def test_f8_tier_layout_and_bytes(self):
        """f8_e4m3 sample rows, bf16 logp plane (e4m3's ±448 range
        overflows on routine |logp|), numpy backend (the native store
        holds both planes at one dtype), quarter the f32 sample bytes."""
        a = _run(None, n_steps=200)
        b = _run(jnp.float8_e4m3fn, n_steps=200)
        assert b.chain.dtype == np.dtype(jnp.float8_e4m3fn)
        assert b.chain.logp_dtype == np.dtype(jnp.bfloat16)
        assert b.chain.backend == "numpy"
        assert a.chain.n_steps == b.chain.n_steps
        # per row: f32 is W*(P+1)*4 bytes; f8 tier is W*(P*1 + 2)
        w, p = 64, 2
        assert a.chain.nbytes == a.chain.n_steps * w * (p + 1) * 4
        assert b.chain.nbytes == b.chain.n_steps * w * (p * 1 + 2)

    def test_f8_large_logp_survives(self):
        def hot_logp(t):
            return -0.5 * jnp.sum((t - 3.0) ** 2) * 500.0  # |logp| >> 448

        s = EnsembleSampler(hot_logp, n_walkers=64, n_params=2, seed=0,
                            store_dtype=jnp.float8_e4m3fn)
        s.init_ball(np.full(2, 3.0), scale=0.05, seed=1)
        s.run_mcmc(100)
        assert np.isfinite(s.get_log_probs()).all()

    def test_f8_analysis_tolerance(self):
        """Documented tolerance: e4m3 storage (3 mantissa bits, rel. step
        ~6%) leaves moments/ACT within Monte Carlo error on O(1) values —
        quantization error is symmetric and averages out over draws."""
        a = _run(None)
        b = _run(jnp.float8_e4m3fn)
        ca = np.cov(a.get_samples(flat=True).T)
        cb = np.cov(b.get_samples(flat=True).T)
        np.testing.assert_allclose(cb, ca, rtol=2e-2, atol=2e-3)
        ta = analysis.autocorr_time(a.get_samples())
        tb = analysis.autocorr_time(b.get_samples())
        np.testing.assert_allclose(tb, ta, rtol=0.05)
        assert a.accepted_steps == b.accepted_steps  # compute path untouched

    def test_f8_injected_narrow_logp_chain_rejected(self):
        """An injected store that would squash the bf16 logp plane back
        to 8 bits is rejected up front (round-4 review: DiskChain(f8))."""
        from mcmcpp_tpu.chain import Chain

        narrow = Chain(64, 2, dtype=np.dtype(jnp.float8_e4m3fn),
                       backend="numpy")
        with pytest.raises(ValueError, match="logp plane"):
            EnsembleSampler(skewed_logp, n_walkers=64, n_params=2,
                            store_dtype=jnp.float8_e4m3fn, chain=narrow)
        wide = Chain(64, 2, dtype=np.dtype(jnp.float8_e4m3fn),
                     logp_dtype=np.dtype(jnp.bfloat16),
                     read_dtype=np.float32, backend="numpy")
        s = EnsembleSampler(skewed_logp, n_walkers=64, n_params=2,
                            store_dtype=jnp.float8_e4m3fn, chain=wide)
        s.init_ball(np.zeros(2), scale=0.3, seed=1)
        s.run_mcmc(20)
        assert np.isfinite(s.get_log_probs()).all()

    def test_empty_chain_logp_dtype_consistent(self):
        from mcmcpp_tpu.chain import Chain

        c = Chain(8, 2, dtype=np.dtype(jnp.float8_e4m3fn),
                  logp_dtype=np.dtype(jnp.bfloat16), backend="numpy")
        empty_dtype = c.get_logp().dtype
        c.append(np.zeros((3, 8, 2)), np.zeros((3, 8)))
        assert c.get_logp().dtype == empty_dtype
