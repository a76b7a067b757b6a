"""Test configuration.

Kernels and sharding tests run on a virtual 8-device CPU mesh so they are
hardware-independent; the driver benches on the real TPU chip separately.
Must set the XLA flags before jax is imported anywhere.
"""
import os
import sys

# Force CPU: the ambient environment registers the 'axon' TPU-tunnel
# platform from sitecustomize (before this conftest runs) and overrides
# JAX_PLATFORMS, so the env var alone is not enough — set the config
# directly too. The tunnel is single-chip with very slow remote compiles;
# bit-exactness tests are hardware-independent and the driver benches on
# the real chip separately.
os.environ["JAX_PLATFORMS"] = "cpu"
try:
    import jax
    jax.config.update("jax_platforms", "cpu")
except ImportError:
    pass
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
