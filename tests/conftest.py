"""Test configuration: run on CPU with float64 and 8 virtual devices.

Float64 on CPU is the correctness-parity configuration (the reference is a
double-precision C solver); TPU float32 behaviour is exercised separately in
the benchmark.  The 8 virtual devices let sharding/mesh tests run without TPU
hardware.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The environment pre-registers a TPU platform via sitecustomize and pins
# JAX_PLATFORMS; override through the config (effective as long as no
# computation ran yet in this process).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
