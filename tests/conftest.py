"""Test harness: run everything on a virtual 8-device CPU mesh so sharding
paths are exercised without TPU hardware (mirrors the driver's
`dryrun_multichip` environment).

Note: the environment's sitecustomize imports jax and registers the TPU
plugin before pytest starts, so JAX_PLATFORMS in os.environ is captured too
early to help — use jax.config.update instead, before any backend init.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
