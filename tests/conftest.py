"""Test config: force the CPU backend with 8 virtual devices.

The ambient environment points JAX at the remote axon TPU tunnel
(``JAX_PLATFORMS=axon``); tests must NOT ride it — they run modelless logic
and numerics on CPU, with 8 virtual devices so multi-chip sharding compiles
and executes (the driver separately dry-runs the real multichip path via
``__graft_entry__.dryrun_multichip``).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("PALLAS_AXON_REMOTE_COMPILE", None)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
