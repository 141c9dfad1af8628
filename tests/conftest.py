"""Test harness configuration.

Tests run on a virtual 8-device CPU mesh (no TPU needed).  This container
boots an `axon` TPU PJRT plugin through sitecustomize (guarded by
PALLAS_AXON_POOL_IPS); its ``register()`` pins ``jax_platforms`` via
``jax.config.update``, so plain env-var overrides are a no-op — the pinned
config wins.  The reliable in-process fix is to counter-update the config
*before any backend initializes* (verified on the bench machine: yields 8
CpuDevices).  XLA_FLAGS is read at CPU-client creation, so setting it here
(before the first jax op) still works.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu", (
    "tests must run on the virtual CPU mesh, got "
    f"{jax.devices()}")
assert len(jax.devices()) >= 8, (
    "expected an 8-device virtual CPU mesh, got "
    f"{len(jax.devices())} devices")
