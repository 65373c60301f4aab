"""Test configuration: run everything on a virtual 8-device CPU mesh.

Sets XLA_FLAGS before jax import (must precede backend init), then forces
the cpu platform via jax.config — the env var JAX_PLATFORMS is overridden
by the site's TPU plugin (it rewrites jax_platforms to "axon,cpu"), so the
config update is the only reliable way to keep unit tests off the tunneled
TPU chip. Multi-chip sharding logic is validated on these virtual devices.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)
