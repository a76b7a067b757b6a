"""Test configuration.

Kernels and sharding tests run on a virtual 8-device CPU mesh so they are
hardware-independent; the driver benches on the real TPU chip separately.
Must set the XLA flags before jax is imported anywhere.
"""
import os
import sys

# Force CPU: the ambient environment may set JAX_PLATFORMS=axon (the real
# TPU tunnel), which is single-chip, slow to init, and not needed for the
# bit-exactness tests. The driver benches on the real chip separately.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
