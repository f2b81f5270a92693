"""Test config: force the CPU backend with 8 virtual devices.

The ambient environment registers a remote axon TPU plugin from
``sitecustomize`` (which imports jax BEFORE pytest starts), so setting
``JAX_PLATFORMS`` via env here is too late — we must flip the already-loaded
jax config.  Tests run modelless logic and float32 numerics on CPU, with 8
virtual devices so multi-chip sharding compiles and executes (the driver
separately dry-runs the real multichip path via
``__graft_entry__.dryrun_multichip``).
"""

import os

# For any subprocesses spawned by tests.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("PALLAS_AXON_REMOTE_COMPILE", None)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
# 8 virtual CPU devices even though sitecustomize already imported jax:
# the backend is created lazily, so flag changes here still take effect.
jax.config.update("jax_num_cpu_devices", 8)

assert jax.default_backend() == "cpu", f"tests must run on CPU, got {jax.default_backend()}"
assert len(jax.devices()) == 8, f"expected 8 virtual CPU devices, got {len(jax.devices())}"


# ── memory hygiene across the (single-process) suite ─────────────────
#
# ~700 tests jit-compile thousands of programs; XLA:CPU executables are
# never freed while referenced by jax's global caches, and the image has
# one core + bounded RAM — a full-suite run previously segfaulted inside
# backend_compile around the 600th test. Dropping the caches between test
# modules keeps the high-water mark flat (each module re-compiles its own
# tiny programs in milliseconds).

import gc

import pytest


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    yield
    jax.clear_caches()
    gc.collect()
