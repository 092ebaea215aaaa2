"""Test harness configuration.

Tests run on a virtual 8-device CPU mesh — the TPU analog of the reference's
loopback flux-node testing (flux-node binds 0.0.0.0 and the master connects
to localhost; see flux-node/src/main.rs:141-146). Multi-chip sharding paths
are exercised without TPU hardware via
``--xla_force_host_platform_device_count``.

Note: this environment's axon TPU plugin force-selects itself through
``jax.config.update("jax_platforms", ...)`` at interpreter start, so the
``JAX_PLATFORMS`` env var alone is not enough — we override the config after
import, before any backend is instantiated.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def devices8():
    devs = jax.devices()
    assert len(devs) >= 8, f"expected 8 virtual devices, got {len(devs)}"
    return devs[:8]
