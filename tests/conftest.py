"""Test configuration: force an 8-device virtual CPU mesh before JAX imports.

Multi-chip sharding paths are validated on virtual CPU devices (SURVEY section 7
step 7-8); the driver separately dry-runs the real multi-chip path via
__graft_entry__.dryrun_multichip.
"""

import os

# XLA:CPU JIT maps ~3 anonymous regions per compiled executable (code +
# rodata + rw); a full-suite process compiles thousands of executables and
# crosses the default vm.max_map_count (65530), after which mmap fails and
# the process SEGFAULTS inside whatever allocates next (observed r4: crashes
# in the jax compilation-cache read/write paths at ~61% of the suite, only
# in long single-process runs). Raise the limit when the container allows
# it (we run as root); harmless no-op otherwise.
try:
    with open("/proc/sys/vm/max_map_count", "r+") as _f:
        if int(_f.read()) < 262144:
            _f.seek(0)
            _f.write("262144")
except (OSError, ValueError):
    pass

# Force CPU: the session env pins JAX_PLATFORMS to the real TPU tunnel, which
# must not be grabbed by unit tests (bench.py uses it instead).
os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8").strip()

# This box has 2 CPUs; XLA compiles dominate test time. The persistent cache
# makes re-runs fast.
import jax  # noqa: E402

# The env var alone is NOT enough: the axon sitecustomize hook (baked into
# every interpreter via PYTHONPATH) calls jax.config.update("jax_platforms",
# "axon,cpu") at startup, overriding JAX_PLATFORMS and silently routing
# "CPU" tests through the TPU tunnel (slow, and a wedged tunnel hangs every
# fetch). A post-import config update takes final precedence.
jax.config.update("jax_platforms", "cpu")

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_ksd_tests"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
