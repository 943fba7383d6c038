"""Test harness: run everything on a virtual 8-device CPU mesh so sharding
paths are exercised without TPU hardware (mirrors the driver's
`dryrun_multichip` environment).

Note: the environment's sitecustomize imports jax and registers the TPU
plugin before pytest starts, so JAX_PLATFORMS in os.environ is captured too
early to help — use jax.config.update instead, before any backend init.
"""

import os

import pytest

TPU_LANE = bool(os.environ.get("SRSLTE_TPU_TESTS"))

if not TPU_LANE:
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import jax

if not TPU_LANE:
    jax.config.update("jax_platforms", "cpu")
else:
    # hardware lane: persistent cache — remote compiles are minutes cold
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "tpu: hardware-lane test (runs only with SRSLTE_TPU_TESTS=1, e.g. "
        "`SRSLTE_TPU_TESTS=1 pytest -m tpu`); the default suite forces CPU",
    )


def pytest_collection_modifyitems(config, items):
    skip_tpu = pytest.mark.skip(reason="TPU lane: set SRSLTE_TPU_TESTS=1")
    skip_cpu = pytest.mark.skip(reason="CPU-suite test (TPU lane active)")
    for item in items:
        if "tpu" in item.keywords:
            if not TPU_LANE:
                item.add_marker(skip_tpu)
        elif TPU_LANE:
            item.add_marker(skip_cpu)
