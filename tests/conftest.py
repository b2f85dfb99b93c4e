"""Test configuration: run JAX on CPU with a virtual 8-device mesh so
sharding / context-parallel tests work without TPU hardware.

The host image imports jax at interpreter startup (sitecustomize registers
the TPU plugin), so plain env vars are too late — use jax.config instead.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

if not os.environ.get("RECONVAT_TEST_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
