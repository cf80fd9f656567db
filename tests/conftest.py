"""Test config: force JAX onto a virtual 8-device CPU backend.

Tests must not grab the TPU (bench.py owns it) and multi-chip sharding
tests need >1 device, so we emulate 8 CPU devices.
"""

import os
import sys

# HARD-set (not setdefault): the machine environment may preset
# JAX_PLATFORMS=axon and a sitecustomize that imports jax at interpreter
# startup, so we must both override the env and update the live config.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
if "jax" in sys.modules:
    import jax

    try:
        jax.clear_backends()
    except Exception:
        pass
    jax.config.update("jax_platforms", "cpu")
# Cheap compiles: model-shape tests spend almost all wall-clock in XLA CPU
# optimization passes otherwise.
os.environ.setdefault("JAX_DISABLE_MOST_OPTIMIZATIONS", "true")
# Persistent compilation cache: repeated pytest runs skip XLA recompiles.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "5")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
