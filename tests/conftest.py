"""Test harness config: run everything on CPU with 8 virtual devices.

This is the standard JAX way to exercise pjit/shard_map/psum logic without a
pod (SURVEY.md §4d). The environment pre-registers a remote TPU platform via
sitecustomize (and jax may already be imported), so we force the CPU backend
through jax.config rather than env vars. Set RTT_TEST_PLATFORM=tpu to run
the suite against the real chip instead.
"""

import os

_platform = os.environ.get("RTT_TEST_PLATFORM", "cpu")

if _platform == "cpu":
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

if _platform == "cpu":
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
