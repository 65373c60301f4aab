"""Headline benchmark: walker-updates/s + ESS/s on a 10-D correlated Gaussian.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline", ...} where the
primary metric is walker-updates/s/chip and the primary ESS metric is the
DEVICE-RESIDENT ESS/s (sampling scan + autocovariance FFT in one jitted
program, W = 2^16 walkers, only the ~20 KB walker-averaged rho crossing the
link). The store-inclusive tiers ride along as secondary keys, explicitly
labeled tunnel-bound: on this dev box the device->host offload link runs at
~18 MB/s, 2-3 orders of magnitude below co-located PCIe, so those numbers
measure the tunnel, not the framework.
The reference publishes no numbers (BASELINE.md), so vs_baseline is measured
against the driver's north-star target of 1e8 walker-updates/s/chip
(BASELINE.json).

Statistical rigor (round-4 verdict items 1+2): every metric is measured
>=3 times (state chained between repeats — see the CLAUDE.md microbenchmark
rule) and reported as median with min/max spread in a "spread" map; a
"vs_prev" map compares each metric to the newest committed BENCH_r{N}.json
artifact so regression-vs-noise is decidable from the artifact alone.

Outage resilience (round-2 verdict item 1): the tunneled axon backend has
documented multi-minute init hangs and full outages (CLAUDE.md). A bare run
during one of those produced a failed driver artifact and silently lost the
round's perf evidence. So ``python bench.py`` is now an orchestrator: each
measurement attempt runs in a fresh subprocess (backend-init failures are
cached per-process by JAX, so in-process retry is useless) under a bounded
timeout, retried with sleeps until an overall deadline. Exactly one JSON line
goes to stdout on success; all diagnostics are timestamped on stderr.
"""

import glob
import json
import os
import re
import subprocess
import sys
import time

import numpy as np

# Per-attempt / overall budgets. A clean run is ~6 min incl. compile; init
# hangs of 2-4 min are documented, so give each attempt 16 min and keep
# retrying (sleeping between failures) until ~55 min have elapsed.
ATTEMPT_TIMEOUT_S = int(os.environ.get("BENCH_ATTEMPT_TIMEOUT_S", 960))
OVERALL_DEADLINE_S = int(os.environ.get("BENCH_DEADLINE_S", 3300))
RETRY_SLEEP_S = int(os.environ.get("BENCH_RETRY_SLEEP_S", 120))

NORTH_STAR = 1.0e8  # walker-updates/s per chip (BASELINE.md north-star)
REPEATS = int(os.environ.get("BENCH_REPEATS", 3))


def _spread(values):
    """(median, {median,min,max,n}) for a list of repeat measurements."""
    v = np.asarray(values, np.float64)
    return float(np.median(v)), {
        "median": float(np.median(v)),
        "min": float(np.min(v)),
        "max": float(np.max(v)),
        "n": int(v.size),
    }


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
    # repeats as chained launches: the tunneled device occasionally stalls
    # a single dispatch, so the spread (min vs median) is itself diagnostic
    rates = []
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        state = run_nostore(state, s._step_fn, steps)
        jax.block_until_ready(state)
        rates.append(n_walkers * steps / (time.perf_counter() - t0))
    return _spread(rates)


def ess_per_s(jax, jnp, store_dtype=None):
    """Store-inclusive ESS/s (TUNNEL-BOUND on this dev box — secondary tier).

    The measured window covers sampling + the pipelined device->host chain
    offload; under the tunneled dev box the offload link (~18 MB/s) is 2-3
    orders of magnitude below co-located PCIe, so treat the absolute number
    as a hard lower bound for production hardware. ``store_dtype=bfloat16``
    measures the reduced-precision store path (half the offload bytes on
    any link).
    """
    from mcmcpp_tpu import EnsembleSampler
    from mcmcpp_tpu.utils import ThroughputMonitor

    dim, logp_batched = _target(jnp)
    n_walkers = 1 << 12
    steps, thin, chunk = 3000, 6, 250
    s = EnsembleSampler(
        logp_batched, n_walkers=n_walkers, n_params=dim, seed=0, batched=True,
        prng_impl="rbg", store_chunk_steps=chunk, store_dtype=store_dtype,
    )
    s.init_ball(np.zeros(dim), scale=0.5, seed=1)
    s.run_mcmc(300, store=False)  # burn-in + nostore compile warm
    # warm the EXACT stored-run program (one full (chunk, thin) launch),
    # then clear the chain so the measured windows pay zero compile
    s.run_mcmc(chunk * thin, thin=thin)
    rates, window_rates = [], []
    for _ in range(REPEATS):
        s.reset()
        mon = ThroughputMonitor(n_walkers=n_walkers)
        with mon.measure(steps=steps):
            s.run_mcmc(steps, thin=thin)
        rates.append(float(np.nanmin(mon.ess_per_s(s.get_samples()))))
        window_rates.append(mon.updates_per_s)
    med, spread = _spread(rates)
    return med, spread, float(np.median(window_rates))


def ess_per_s_device_resident(jax, jnp, w_log2=None, steps=None, thin=None):
    """PRIMARY ESS metric: co-located ESS/s, samples never leave HBM.

    One jitted program runs the full thinned sampling scan AND the
    per-walker autocovariance FFT on device; only the walker-averaged
    rho(t) (P x S floats, ~20 KB) crosses the link for the Sokal window.
    This is what a production host co-located with the chip sees.

    Round-4 verdict item 1: the window now runs at W = 2^16 (vs the old
    2^12, which sat 512x below the throughput-optimal walker count and
    understated the hardware). The autocovariance FFT is CHUNKED over
    walker blocks inside the same program so peak scratch stays bounded
    (the (S, W, P) sample block is ~1.3 GB at 2^16; an unchunked rfft over
    all P*W rows would add ~5.4 GB of complex scratch on top).
    """
    from mcmcpp_tpu import EnsembleSampler
    from mcmcpp_tpu.analysis.autocorr import _sokal_window_tau
    from mcmcpp_tpu.sampler import run_scan

    dim, logp_batched = _target(jnp)
    # Default window from the measured geometry sweep (benchmarks/
    # essdev_sweep.py, 2026-08-20 on v5e): W=2^18 is the HBM ceiling
    # (2^19 OOMs at 25.6G), thin=96 puts the stored-series tau at ~1.4
    # (near the thinning optimum — beyond it thinning discards
    # independent samples) and the window at ~90% of the sampling-only
    # update rate. Measured 2.50e7 ESS/s vs 6.0e6 at the old
    # (2^16, 3000, 6) window.
    if w_log2 is None:
        w_log2 = int(os.environ.get("BENCH_DEVICE_W_LOG2", 18))
    n_walkers = 1 << w_log2
    if steps is None:
        steps = int(os.environ.get("BENCH_DEVICE_STEPS", 48000))
    if thin is None:
        thin = int(os.environ.get("BENCH_DEVICE_THIN", 96))
    n_store = steps // thin
    blk = min(n_walkers, 1 << 13)  # FFT block: 8192 walkers (~0.8 GB scratch)
    s = EnsembleSampler(
        logp_batched, n_walkers=n_walkers, n_params=dim, seed=0, batched=True,
        prng_impl="rbg",
    )
    s.init_ball(np.zeros(dim), scale=0.5, seed=1)
    s.run_mcmc(300, store=False)  # burn-in

    npad = 2 * (1 << (n_store - 1).bit_length())

    def prog(state):
        final, pos, _, _, _ = run_scan(state, s._step_fn, n_store, thin)

        # pos: (S, W, P). Chunk the batched FFT over walker blocks; only
        # the per-block rho sums (n_blocks, P, S) are materialized.
        def block_rho(j):
            b = jax.lax.dynamic_slice(
                pos, (0, j * blk, 0), (n_store, blk, dim)
            )
            rows = b.transpose(2, 1, 0).reshape(dim * blk, n_store)
            centered = rows - jnp.mean(rows, axis=1, keepdims=True)
            f = jnp.fft.rfft(centered, n=npad, axis=1)
            acov = jnp.fft.irfft(f * jnp.conj(f), n=npad, axis=1)[:, :n_store]
            rho_b = (acov / acov[:, :1]).reshape(dim, blk, n_store)
            return rho_b.sum(axis=1)

        rho = jax.lax.map(
            block_rho, jnp.arange(n_walkers // blk)
        ).sum(axis=0) / n_walkers
        return final, rho

    prog = jax.jit(prog)
    state, _ = prog(s.state)  # compile + warm the exact program
    jax.block_until_ready(state)
    rates, window_rates = [], []
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        state, rho = prog(state)
        rho = np.asarray(rho)  # ~20 KB transfer fences the timing (CLAUDE.md)
        taus = np.array([_sokal_window_tau(r, 4.0) for r in rho])
        dt = time.perf_counter() - t0
        ess = np.where(
            taus > 0, n_store * n_walkers / np.maximum(taus, 1e-12), np.nan
        )
        rates.append(float(np.nanmin(ess) / dt))
        window_rates.append(steps * n_walkers / dt)
    med, spread = _spread(rates)
    return med, spread, n_walkers, float(np.median(window_rates))


def _prev_artifact():
    """Newest committed BENCH_r{N}.json with a parsed payload, for vs_prev."""
    best_n, best = -1, None
    here = os.path.dirname(os.path.abspath(__file__))
    for path in glob.glob(os.path.join(here, "BENCH_r*.json")):
        m = re.search(r"BENCH_r(\d+)\.json$", path)
        if not m:
            continue
        try:
            with open(path) as f:
                doc = json.load(f)
        except (OSError, ValueError):
            continue
        parsed = doc.get("parsed")
        if doc.get("rc") == 0 and isinstance(parsed, dict) and int(
            m.group(1)
        ) > best_n:
            best_n, best = int(m.group(1)), parsed
    return best_n, best


def _vs_prev(result):
    """Ratio new/prev for every shared numeric key (regression-vs-noise
    triage — round-4 verdict item 2)."""
    n, prev = _prev_artifact()
    if prev is None:
        return None
    out = {"round": n}
    for key, new in result.items():
        old = prev.get(key)
        if isinstance(new, (int, float)) and isinstance(old, (int, float)) \
                and old:
            out[key] = round(float(new) / float(old), 4)
    return out


def _log(msg):
    print(f"[bench +{time.time() - _T0:7.1f}s] {msg}", file=sys.stderr,
          flush=True)


_T0 = time.time()


def run_attempt():
    """One measurement attempt (runs in a fresh subprocess).

    Timestamps on stderr bracket backend init so a tunnel init-hang is
    distinguishable from a compute hang in the driver tail (CLAUDE.md).
    """
    _log("importing jax")
    import jax
    import jax.numpy as jnp

    _log("import done; initializing backend (jax.devices())")
    devs = jax.devices()
    _log(f"backend up: {devs}")

    _log("headline walker-updates/s (compile + chained repeat launches)")
    updates_per_s, updates_spread = headline_updates_per_s(jax, jnp)
    _log(f"headline done: {updates_per_s:.3e} {updates_spread}")
    ess_device, dev_spread, dev_w, dev_window = ess_per_s_device_resident(
        jax, jnp
    )
    _log(f"device-resident ESS/s done (W=2^{int(np.log2(dev_w))}): "
         f"{ess_device:.3e} {dev_spread}")
    ess_rate, ess_spread, ess_window_updates = ess_per_s(jax, jnp)
    _log(f"store-inclusive ESS/s done: {ess_rate:.3e} {ess_spread}")
    ess_bf16, bf16_spread, _ = ess_per_s(jax, jnp, store_dtype=jnp.bfloat16)
    _log(f"store-inclusive ESS/s (bf16 store) done: {ess_bf16:.3e} "
         f"{bf16_spread}")
    ess_f8, f8_spread, _ = ess_per_s(
        jax, jnp, store_dtype=jnp.float8_e4m3fn
    )
    _log(f"store-inclusive ESS/s (f8 store) done: {ess_f8:.3e} {f8_spread}")
    result = {
        "metric": "walker_updates_per_s_10d_gaussian",
        "value": updates_per_s,
        "unit": "walker-updates/s/chip",
        "vs_baseline": updates_per_s / NORTH_STAR,
        "ess_per_s_device_resident": ess_device,
        "ess_device_unit": "ESS/s (worst parameter, samples+ACT in HBM; "
                           "PRIMARY ESS metric)",
        "ess_device_n_walkers": dev_w,
        "ess_device_window_updates_per_s": dev_window,
        "ess_per_s_10d_gaussian": ess_rate,
        "ess_per_s_10d_gaussian_bf16store": ess_bf16,
        "ess_per_s_10d_gaussian_f8store": ess_f8,
        "ess_unit": "ESS/s (worst parameter, chain store included — "
                    "TUNNEL-BOUND on this dev box, see bench.py docstring)",
        "ess_window_updates_per_s": ess_window_updates,
    }
    result["spread"] = {
        "walker_updates_per_s": updates_spread,
        "ess_per_s_device_resident": dev_spread,
        "ess_per_s_10d_gaussian": ess_spread,
        "ess_per_s_10d_gaussian_bf16store": bf16_spread,
        "ess_per_s_10d_gaussian_f8store": f8_spread,
    }
    vs_prev = _vs_prev(result)
    if vs_prev is not None:
        result["vs_prev"] = vs_prev
    print(json.dumps(result), flush=True)


def main():
    """Orchestrator: retry subprocess attempts until one lands or the
    deadline expires. Emits the child's single JSON line on stdout."""
    deadline = _T0 + OVERALL_DEADLINE_S
    attempt = 0
    last_tail = ""
    while True:
        attempt += 1
        budget = min(ATTEMPT_TIMEOUT_S, max(60, int(deadline - time.time())))
        _log(f"attempt {attempt} (timeout {budget}s)")
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--attempt"],
                capture_output=True, text=True, timeout=budget,
            )
        except subprocess.TimeoutExpired as e:
            _log(f"attempt {attempt} timed out after {budget}s")
            last_tail = (e.stderr or b"")[-2000:] if isinstance(
                e.stderr, bytes) else str(e.stderr or "")[-2000:]
        else:
            sys.stderr.write(proc.stderr[-4000:])
            line = next(
                (ln for ln in reversed(proc.stdout.splitlines())
                 if ln.startswith("{")), None)
            if proc.returncode == 0 and line is not None:
                try:
                    json.loads(line)  # validate before relaying
                except ValueError:
                    line = None
            if proc.returncode == 0 and line is not None:
                print(line, flush=True)
                _log(f"attempt {attempt} succeeded")
                return 0
            _log(f"attempt {attempt} failed rc={proc.returncode}")
            last_tail = proc.stderr[-2000:]
        if time.time() + RETRY_SLEEP_S + 60 > deadline:
            _log(f"deadline exhausted after {attempt} attempts; last tail:\n"
                 f"{last_tail}")
            return 1
        _log(f"sleeping {RETRY_SLEEP_S}s before retry (tunnel outages are "
             "transient per CLAUDE.md)")
        time.sleep(RETRY_SLEEP_S)


if __name__ == "__main__":
    if "--attempt" in sys.argv:
        run_attempt()
    else:
        sys.exit(main())
