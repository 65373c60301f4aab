"""Headline benchmark: walker-updates/s + ESS/s on a 10-D correlated Gaussian.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline", ...} where the
primary metric is walker-updates/s/chip and the BASELINE.md companion metric
ESS/s (chain-store traffic included) rides along as extra keys.
The reference publishes no numbers (BASELINE.md), so vs_baseline is measured
against the driver's north-star target of 1e8 walker-updates/s/chip
(BASELINE.json). Runs whatever backend JAX selects (TPU on the driver box).
"""

import json
import time

import numpy as np


NORTH_STAR = 1.0e8  # walker-updates/s per chip (BASELINE.md north-star)


def _target(jnp):
    dim = 10
    rho = 0.5
    cov = rho * np.ones((dim, dim)) + (1 - rho) * np.eye(dim)
    prec_chol = jnp.asarray(np.linalg.cholesky(np.linalg.inv(cov)), jnp.float32)

    def logp_batched(theta):  # (n, P) -> (n,): one MXU matmul per half-step
        y = theta @ prec_chol
        return -0.5 * jnp.sum(y * y, axis=-1)

    return dim, logp_batched


def headline_updates_per_s(jax, jnp):
    """Peak walker-updates/s: single-launch jit(fori_loop), state chained
    between calls (see CLAUDE.md microbenchmark rule)."""
    from mcmcpp_tpu import EnsembleSampler
    from mcmcpp_tpu.sampler import run_nostore

    dim, logp_batched = _target(jnp)
    n_walkers = 1 << 21  # 2097152 walkers (throughput peak on v5e)
    # rbg: hardware RngBitGenerator (~16% faster steps; cross-topology
    # bitwise reproducibility is irrelevant for a throughput benchmark)
    s = EnsembleSampler(
        logp_batched, n_walkers=n_walkers, n_params=dim, seed=0, batched=True,
        prng_impl="rbg",
    )
    s.init_ball(np.zeros(dim), scale=0.5, seed=1)

    # 1000 steps/launch (~600 ms device time) amortizes the tunneled
    # dispatch overhead (~25 ms/launch — at 100 steps it understated the
    # steady-state rate by ~30%; see benchmarks/layout_experiments.py)
    steps = 1000
    # warmup/compile the exact program that gets timed (same static shape)
    state = run_nostore(s.state, s._step_fn, steps)
    jax.block_until_ready(state)
    # best of 3 chained launches: the tunneled device occasionally stalls a
    # single dispatch, which would misreport steady-state throughput
    best = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        state = run_nostore(state, s._step_fn, steps)
        jax.block_until_ready(state)
        best = max(best, n_walkers * steps / (time.perf_counter() - t0))
    return best


def ess_per_s(jax, jnp):
    """ESS/s on the same 10-D target, chain-store traffic INCLUDED
    (BASELINE.md: "ESS/s tracked alongside walker-updates/s").

    The measured window covers sampling + the pipelined device->host chain
    offload; under the tunneled dev box the offload link (~18 MB/s) is 2-3
    orders of magnitude below co-located PCIe, so treat the absolute number
    as a hard lower bound for production hardware.
    """
    from mcmcpp_tpu import EnsembleSampler
    from mcmcpp_tpu.utils import ThroughputMonitor

    dim, logp_batched = _target(jnp)
    n_walkers = 1 << 12
    steps, thin, chunk = 3000, 6, 250
    s = EnsembleSampler(
        logp_batched, n_walkers=n_walkers, n_params=dim, seed=0, batched=True,
        prng_impl="rbg", store_chunk_steps=chunk,
    )
    s.init_ball(np.zeros(dim), scale=0.5, seed=1)
    s.run_mcmc(300, store=False)  # burn-in + nostore compile warm
    # warm the EXACT stored-run program (one full (chunk, thin) launch),
    # then clear the chain so the measured window pays zero compile
    s.run_mcmc(chunk * thin, thin=thin)
    s.reset()
    mon = ThroughputMonitor(n_walkers=n_walkers)
    with mon.measure(steps=steps):
        s.run_mcmc(steps, thin=thin)
    rates = mon.ess_per_s(s.get_samples())
    return float(np.nanmin(rates)), mon.updates_per_s


def ess_per_s_device_resident(jax, jnp):
    """Co-located ESS/s: samples never leave HBM (ROADMAP perf item).

    One jitted program runs the full thinned sampling scan AND the
    per-walker autocovariance FFT on device; only the walker-averaged
    rho(t) (P x S floats, ~20 KB) crosses the link for the Sokal window.
    This is what a production host co-located with the chip sees, free of
    the dev tunnel's ~18 MB/s offload path that caps the store-inclusive
    number above.
    """
    from mcmcpp_tpu import EnsembleSampler
    from mcmcpp_tpu.analysis.autocorr import _sokal_window_tau
    from mcmcpp_tpu.sampler import run_scan

    dim, logp_batched = _target(jnp)
    n_walkers = 1 << 12
    steps, thin = 3000, 6
    n_store = steps // thin
    s = EnsembleSampler(
        logp_batched, n_walkers=n_walkers, n_params=dim, seed=0, batched=True,
        prng_impl="rbg",
    )
    s.init_ball(np.zeros(dim), scale=0.5, seed=1)
    s.run_mcmc(300, store=False)  # burn-in

    def prog(state):
        final, pos, _, _, _ = run_scan(state, s._step_fn, n_store, thin)
        # (S, W, P) -> (P*W, S) rows; FFT batched over all rows on device
        rows = pos.transpose(2, 1, 0).reshape(dim * n_walkers, n_store)
        centered = rows - jnp.mean(rows, axis=1, keepdims=True)
        npad = 2 * (1 << (n_store - 1).bit_length())
        f = jnp.fft.rfft(centered, n=npad, axis=1)
        acov = jnp.fft.irfft(f * jnp.conj(f), n=npad, axis=1)[:, :n_store]
        rho = (acov / acov[:, :1]).reshape(dim, n_walkers, n_store).mean(axis=1)
        return final, rho

    prog = jax.jit(prog)
    state, _ = prog(s.state)  # compile + warm the exact program
    jax.block_until_ready(state)
    t0 = time.perf_counter()
    state, rho = prog(state)
    rho = np.asarray(rho)  # ~20 KB transfer, inside the window
    taus = np.array([_sokal_window_tau(r, 4.0) for r in rho])
    dt = time.perf_counter() - t0
    ess = np.where(taus > 0, n_store * n_walkers / np.maximum(taus, 1e-12),
                   np.nan)
    return float(np.nanmin(ess) / dt)


def main():
    import jax
    import jax.numpy as jnp

    updates_per_s = headline_updates_per_s(jax, jnp)
    ess_rate, ess_window_updates = ess_per_s(jax, jnp)
    ess_device = ess_per_s_device_resident(jax, jnp)
    print(
        json.dumps(
            {
                "metric": "walker_updates_per_s_10d_gaussian",
                "value": updates_per_s,
                "unit": "walker-updates/s/chip",
                "vs_baseline": updates_per_s / NORTH_STAR,
                "ess_per_s_10d_gaussian": ess_rate,
                "ess_unit": "ESS/s (worst parameter, chain store included)",
                "ess_window_updates_per_s": ess_window_updates,
                "ess_per_s_device_resident": ess_device,
                "ess_device_unit": "ESS/s (worst parameter, samples+ACT in HBM)",
            }
        )
    )


if __name__ == "__main__":
    main()
