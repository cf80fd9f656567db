"""Test config: force JAX onto a virtual 8-device CPU backend.

Tests must not grab the TPU (bench.py owns it) and multi-chip sharding
tests need >1 device, so we emulate 8 CPU devices.
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
# Cheap compiles: model-shape tests spend almost all wall-clock in XLA CPU
# optimization passes otherwise.
os.environ.setdefault("JAX_DISABLE_MOST_OPTIMIZATIONS", "true")
# Persistent compilation cache: repeated pytest runs skip XLA recompiles.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "5")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
