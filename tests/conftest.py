"""Test harness configuration.

Tests run on a virtual 8-device CPU mesh (no TPU needed).  The env must be
adjusted before jax initializes: this container boots an `axon` TPU PJRT
plugin through sitecustomize (guarded by PALLAS_AXON_POOL_IPS) which would
otherwise claim the backend, so both the guard and JAX_PLATFORMS are
overridden here.  sitecustomize runs before pytest imports this conftest,
but registration only pins the backend at first jax backend init, which
happens later — forcing JAX_PLATFORMS=cpu keeps tests off the tunnel.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
