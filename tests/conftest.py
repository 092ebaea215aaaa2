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

# Persistent compilation cache: the suite compiles hundreds of programs
# (8-device mesh × many shapes); caching them across pytest runs turns a
# cold ~1 h single-core run into minutes. Subprocess tests inherit the env
# var. Keyed by backend+program so CPU/TPU entries never collide.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/flux_tpu_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Env vars alone are ignored if a pytest plugin imported jax before this
# conftest ran (config values snapshot the env at import time) — set the
# config explicitly too.
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def devices8():
    devs = jax.devices()
    assert len(devs) >= 8, f"expected 8 virtual devices, got {len(devs)}"
    return devs[:8]
