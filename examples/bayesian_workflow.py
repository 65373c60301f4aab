#!/usr/bin/env python
"""The Stan-style diagnose-and-fix workflow, end to end on Neal's funnel.

1. NUTS on the CENTERED funnel -> divergences concentrate at the neck
   (sample_stats.diverging, the geometry signal ArviZ plots).
2. Fix #1 — non-centered reparametrization: divergences vanish.
3. Fix #2 — NeuTra flow preconditioning of the original geometry.
4. MEADS on the reparametrized model: tuning-free ensemble alternative.

Capabilities beyond the reference (gradient-free Calculator contract,
``MCMCpp/Utility/UserOjbectsTest.h:144-151``): divergence/energy sample
stats, dense/diag metrics, NeuTra, MEADS, ArviZ export.

Usage: python examples/bayesian_workflow.py [--dim 10]
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np
import jax
import jax.numpy as jnp

from mcmcpp_tpu import MEADSSampler, NUTSSampler, NeuTra
from mcmcpp_tpu.export import to_inference_dict


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dim", type=int, default=10)
    ap.add_argument("--quick", action="store_true",
                    help="tiny budgets for smoke tests")
    args = ap.parse_args()
    d = args.dim
    q = args.quick
    warm, run, fit = (60, 100, 80) if q else (500, 1000, 1500)

    # Neal's funnel: v ~ N(0, 3^2), x_i | v ~ N(0, e^v)
    def centered(t):
        v, x = t[0], t[1:]
        return (-0.5 * (v / 3.0) ** 2
                - 0.5 * jnp.sum(x * x) * jnp.exp(-v) - 0.5 * v * (d - 1))

    print(f"== 1. centered funnel (dim={d}), NUTS ==")
    s = NUTSSampler(centered, n_chains=32, n_params=d, seed=0, max_depth=8)
    s.init_ball(np.zeros(d), scale=1.0, seed=1)
    s.warmup(warm)
    s.run(run)
    div = s.get_sample_stats()["diverging"]
    v = s.get_samples()[:, :, 0]
    print(f"divergent transitions: {int(div.sum())} "
          f"({100 * div.mean():.2f}% of draws)")
    if div.sum():
        print(f"  mean v at divergences {v[div].mean():+.2f} vs overall "
              f"{v.mean():+.2f}  -> the neck, reparametrize!")
    print(f"sampled std(v) = {v.std():.2f} (truth 3.00 — the centered "
          "chain undercovers the neck)")

    print("\n== 2. non-centered reparam: v, z with x = e^{v/2} z ==")

    def noncentered(t):
        v, z = t[0], t[1:]
        return -0.5 * (v / 3.0) ** 2 - 0.5 * jnp.sum(z * z)

    s2 = NUTSSampler(noncentered, n_chains=32, n_params=d, seed=0,
                     max_depth=8)
    s2.init_ball(np.zeros(d), scale=1.0, seed=2)
    s2.warmup(warm)
    s2.run(run)
    st2 = s2.get_sample_stats()
    v2 = s2.get_samples()[:, :, 0]
    en = st2["energy"]
    bfmi = float(np.square(np.diff(en, axis=0)).mean() / en.var())
    print(f"divergent transitions: {int(st2['diverging'].sum())}; "
          f"E-BFMI {bfmi:.2f}")
    print(f"sampled std(v) = {v2.std():.2f} (truth 3.00)")

    print("\n== 3. NeuTra: learn the geometry instead of deriving it ==")
    nt = NeuTra(centered, d, seed=3)
    nt.fit(fit)
    s3 = nt.make_sampler(NUTSSampler, n_chains=32, max_depth=8)
    s3.warmup(warm)
    s3.run(run)
    v3 = nt.transform(s3.get_samples(flat=True))[:, 0]
    print(f"divergent transitions: "
          f"{int(s3.get_sample_stats()['diverging'].sum())}")
    print(f"sampled std(v) = {v3.std():.2f} (truth 3.00)")

    print("\n== 4. MEADS on the reparametrized model (tuning-free) ==")
    s4 = MEADSSampler(noncentered, n_chains=64, n_params=d, seed=4)
    s4.init_ball(np.zeros(d), scale=1.0, seed=5)
    s4.warmup(warm)
    s4.run(run)
    v4 = s4.get_samples(burn_in=run // 5)[:, :, 0]
    print(f"accept {s4.last_mean_accept:.2f}, "
          f"sampled std(v) = {v4.std():.2f} (truth 3.00)")

    d_out = to_inference_dict(s2)
    print("\nArviZ export groups:", sorted(d_out),
          "| sample_stats:", sorted(d_out["sample_stats"]))


if __name__ == "__main__":
    main()
