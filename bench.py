"""Headline benchmark: walker-updates/s on a 10-D correlated Gaussian.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.
The reference publishes no numbers (BASELINE.md), so vs_baseline is measured
against the driver's north-star target of 1e8 walker-updates/s/chip
(BASELINE.json). Runs whatever backend JAX selects (TPU on the driver box).
"""

import json
import time

import numpy as np


NORTH_STAR = 1.0e8  # walker-updates/s per chip (BASELINE.md north-star)


def main():
    import jax
    import jax.numpy as jnp

    from mcmcpp_tpu import EnsembleSampler
    from mcmcpp_tpu.sampler import run_nostore

    dim = 10
    rho = 0.5
    cov = rho * np.ones((dim, dim)) + (1 - rho) * np.eye(dim)
    prec_chol = jnp.asarray(np.linalg.cholesky(np.linalg.inv(cov)), jnp.float32)

    def logp_batched(theta):  # (n, P) -> (n,): one MXU matmul per half-step
        y = theta @ prec_chol
        return -0.5 * jnp.sum(y * y, axis=-1)

    n_walkers = 1 << 21  # 2097152 walkers (throughput peak on v5e)
    # rbg: hardware RngBitGenerator (~16% faster steps; cross-topology
    # bitwise reproducibility is irrelevant for a throughput benchmark)
    s = EnsembleSampler(
        logp_batched, n_walkers=n_walkers, n_params=dim, seed=0, batched=True,
        prng_impl="rbg",
    )
    s.init_ball(np.zeros(dim), scale=0.5, seed=1)

    steps = 100
    # warmup/compile the exact program that gets timed (same static shape)
    state = run_nostore(s.state, s._step_fn, steps)
    jax.block_until_ready(state)
    t0 = time.perf_counter()
    state = run_nostore(state, s._step_fn, steps)
    jax.block_until_ready(state)
    dt = time.perf_counter() - t0

    updates_per_s = n_walkers * steps / dt
    print(
        json.dumps(
            {
                "metric": "walker_updates_per_s_10d_gaussian",
                "value": updates_per_s,
                "unit": "walker-updates/s/chip",
                "vs_baseline": updates_per_s / NORTH_STAR,
            }
        )
    )


if __name__ == "__main__":
    main()
