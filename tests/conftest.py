"""Test configuration: run everything on a virtual 8-device CPU mesh so
sharded paths are exercised without TPU hardware (SURVEY.md §4 item 8).

Some environments pre-register an out-of-process TPU backend and force
``jax_platforms`` via ``jax.config.update`` (which beats the JAX_PLATFORMS
env var), so we override through the same config API before any test
touches a device.
"""
import os

if not os.environ.get("NDDMS_TEST_TPU"):
    # Default: force the virtual CPU mesh. Set NDDMS_TEST_TPU=1 to keep the
    # real backend (used to run tests/test_pallas_tpu.py on hardware).
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    os.environ["JAX_PLATFORMS"] = "cpu"

    import jax

    jax.config.update("jax_platforms", "cpu")
