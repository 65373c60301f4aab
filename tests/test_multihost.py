"""True multi-process SPMD test: 2 processes × 4 CPU devices over Gloo.

Validates what the virtual single-process mesh cannot: cross-process
collective wiring (distributed.initialize), per-host chain shard storage
(fetch_addressable), and replicated statistics agreeing across hosts.
"""

import os
import re
import subprocess
import sys
import textwrap
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]

WORKER = textwrap.dedent("""
    import os, sys
    proc_id = int(sys.argv[1]); nprocs = int(sys.argv[2]); port = sys.argv[3]
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    sys.path.insert(0, {repo!r})
    import jax
    jax.config.update("jax_platforms", "cpu")
    from mcmcpp_tpu.parallel import distributed
    pid, n = distributed.initialize(f"127.0.0.1:{{port}}", nprocs, proc_id)
    import numpy as np
    import jax.numpy as jnp
    from mcmcpp_tpu import ShardedEnsembleSampler

    def logp(t):
        return -0.5 * jnp.sum(t * t)

    s = ShardedEnsembleSampler(logp, n_walkers=64, n_params=2, seed=0)
    s.init_ball(np.zeros(2), scale=0.5, seed=1)
    s.run_mcmc(50)
    samples = s.get_samples()
    assert distributed.is_multihost()
    print(f"RESULT pid={{pid}} nglobal={{len(jax.devices())}} "
          f"shape={{samples.shape}} accept={{s.acceptance_fraction:.4f}}")
""").format(repo=str(REPO))


@pytest.mark.slow
def test_two_process_spmd(tmp_path):
    port = 12000 + os.getpid() % 4000
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(i), "2", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multi-process workers timed out")
        outs.append(out)
        assert p.returncode == 0, out[-2000:]
    results = [re.search(r"RESULT (.*)", o).group(1) for o in outs]
    accepts = set()
    for r in results:
        assert "nglobal=8" in r
        assert "shape=(50, 32, 2)" in r  # per-host walker shard (64/2 hosts/2)
        accepts.add(re.search(r"accept=([\d.]+)", r).group(1))
    # acceptance is a replicated global statistic: identical on both hosts
    assert len(accepts) == 1


def test_import_does_not_initialize_backend():
    """mcmcpp_tpu must be importable BEFORE jax.distributed.initialize()
    (multi-process workers import the package first); any module-level jnp
    computation would initialize the XLA backend and break that."""
    r = subprocess.run(
        [sys.executable, "-c",
         "import mcmcpp_tpu; from jax._src import xla_bridge; "
         "import sys; sys.exit(1 if xla_bridge.backends_are_initialized() "
         "else 0)"],
        capture_output=True, text=True, timeout=120,
    )
    assert r.returncode == 0, (r.stdout, r.stderr)
