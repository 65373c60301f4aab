#!/usr/bin/env python
"""Framework-overhead benchmark: the reference's InnerBenchmark, rebuilt.

Mirrors ``/root/reference/test/{sequential,parallel}/InnerBenchmark``: drive
the deterministic SequenceMove (pure framework cost, no likelihood) over the
reference workload (2400 walkers x 4 params x 20000 steps) and report
walker-updates/s; ``--sharded`` runs the walker-sharded mesh path (the
pthread-pool A/B of the reference collapses into one SPMD program). The
prime-finding busy-work of the reference (SequenceMove.h:135-162) simulated
an expensive CPU likelihood; pass ``--flops`` to add equivalent synthetic
device FLOPs via a dummy matmul logp.

Usage:
    python examples/inner_benchmark.py [--walkers 2400] [--steps 20000]
        [--sharded] [--flops]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np
import jax
import jax.numpy as jnp

from mcmcpp_tpu import EnsembleSampler, SequenceMove, ShardedEnsembleSampler
from mcmcpp_tpu.sampler import run_nostore


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--walkers", type=int, default=2400)
    ap.add_argument("--steps", type=int, default=20000)
    ap.add_argument("--params", type=int, default=4)
    ap.add_argument("--sharded", action="store_true")
    ap.add_argument("--flops", action="store_true",
                    help="add synthetic likelihood FLOPs (64x64 matmul)")
    args = ap.parse_args()

    p = args.params
    mover = SequenceMove(step_sizes=np.full(p, 1e-3))
    if args.flops:
        w_mat = jnp.eye(64, dtype=jnp.float32)

        def logp(t):
            x = jnp.tile(t, (64 // p + 1,))[:64]
            return jnp.sum((x @ w_mat) * x) * 0.0
    else:
        def logp(t):
            return 0.0

    cls = ShardedEnsembleSampler if args.sharded else EnsembleSampler
    n_walkers = args.walkers
    if args.sharded:
        n_dev = len(jax.devices())
        n_walkers = ((n_walkers + 2 * n_dev - 1) // (2 * n_dev)) * 2 * n_dev
    s = cls(logp, n_walkers=n_walkers, n_params=p, seed=0, mover=mover)
    s.set_initial_walker_pos(
        mover.initial_positions(jax.random.key(0), n_walkers)
    )
    # deterministic check ≙ parallel/InnerBenchmark main.cpp:65-69
    warm = min(100, args.steps)
    state = run_nostore(s.state, s._step_fn, warm)
    jax.block_until_ready(state)
    expect = warm * 1e-3
    got = float(state.red[0, 0])
    assert abs(got - expect) < 1e-3, f"determinism check failed: {got}"

    state = run_nostore(s.state, s._step_fn, args.steps)
    jax.block_until_ready(state)  # compile + run once
    t0 = time.perf_counter()
    state = run_nostore(state, s._step_fn, args.steps)
    jax.block_until_ready(state)
    dt = time.perf_counter() - t0
    ups = n_walkers * args.steps / dt
    print(f"walkers={n_walkers} params={p} steps={args.steps} "
          f"sharded={args.sharded}")
    print(f"{ups/1e6:.1f}M walker-updates/s ({dt/args.steps*1e6:.1f} us/step)")


if __name__ == "__main__":
    main()
