"""Utils (throughput monitor) + single-host distributed helpers."""

import numpy as np

import jax

from mcmcpp_tpu.utils import ThroughputMonitor
from mcmcpp_tpu.parallel import distributed
import pytest


def test_throughput_monitor_counts():
    mon = ThroughputMonitor(n_walkers=100)
    with mon.measure(steps=50):
        pass
    assert mon.updates == 5000
    assert mon.updates_per_s > 0


def test_throughput_monitor_ess_per_s():
    rng = np.random.default_rng(0)
    samples = rng.standard_normal((500, 8, 2))
    mon = ThroughputMonitor(n_walkers=8)
    with mon.measure(steps=500):
        pass
    ess_rate = mon.ess_per_s(samples)
    assert ess_rate.shape == (2,)
    assert np.all(ess_rate > 0)


def test_distributed_single_host():
    assert not distributed.is_multihost()
    x = jax.numpy.arange(8.0)
    out = distributed.process_allgather(x)
    np.testing.assert_array_equal(np.asarray(out).ravel()[:8], np.arange(8.0))


@pytest.mark.slow
def test_trace_profile_writes_trace(tmp_path):
    from mcmcpp_tpu.utils import trace_profile
    import jax.numpy as jnp

    with trace_profile(tmp_path):
        (jnp.ones((64, 64)) @ jnp.ones((64, 64))).block_until_ready()
    written = list(tmp_path.rglob("*"))
    assert written, "profiler produced no trace files"
