"""Host-CPU fingerprint for keying the persistent XLA compile cache.

JAX's persistent compilation cache keys entries by backend, XLA flags,
and jax version — but NOT by host CPU features.  XLA:CPU executables are
AOT-compiled for the build host's ISA extensions (AVX-512 subsets etc.),
so a cache directory carried to a machine with a different feature set
(CI cache restore, the bench driver hopping containers) loads foreign
machine code and dies with SIGILL / "Fatal Python error" mid-suite.
Root-caused in round 5: a warm ``.jax_cache`` written on another host
aborted this host's suite at the first cache *hit*.

Every cache-dir consumer (tests/conftest.py, bench.py, microbenches)
appends :func:`host_cache_tag` to the directory name so entries from a
different CPU can never be loaded — a foreign cache costs one cold
compile instead of a crash.

Must stay importable before/without jax (bench.py sets the env var
pre-import).
"""

from __future__ import annotations

import hashlib
import platform


def _cpu_feature_string() -> str:
    """Best-effort description of the ISA extensions XLA:CPU targets."""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                # one physical package ⇒ the first core's flag line is
                # representative; flags order is kernel-stable
                if line.startswith(("flags", "Features")):
                    return line.split(":", 1)[1].strip()
    except OSError:
        pass
    return f"{platform.machine()} {platform.processor()}"


def host_cache_tag() -> str:
    """Short stable tag identifying this host's CPU feature set."""
    return hashlib.sha256(_cpu_feature_string().encode()).hexdigest()[:10]


def fingerprinted_cache_dir(base_dir: str) -> str:
    """``<base_dir>-<cpu tag>`` — same base name, per-CPU suffix."""
    return f"{base_dir.rstrip('/')}-{host_cache_tag()}"
