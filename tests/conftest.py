"""Test configuration.

Tests run on CPU with 8 virtual XLA devices so every multi-chip sharding
path is exercised without TPU hardware.  Must run before jax is imported
anywhere.
"""

import os

# Force CPU even when the ambient environment points JAX at a TPU
# (JAX_PLATFORMS=axon is pre-set in the TPU image); set
# PLAYAID_TEST_TPU=1 to run the suite against real hardware instead.
if not os.environ.get("PLAYAID_TEST_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
    _flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = (
            _flags + " --xla_force_host_platform_device_count=8"
        ).strip()

# Persistent compile cache makes repeated suite runs fast (model compiles
# dominate otherwise).
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_test_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if not os.environ.get("PLAYAID_TEST_TPU"):
    # The TPU image pins JAX at the 'axon' platform through its own config,
    # so the env var alone is not enough — override via jax.config before
    # any backend initialisation.
    import jax

    jax.config.update("jax_platforms", "cpu")
