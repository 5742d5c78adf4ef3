"""Test harness configuration.

All unit tests run on a virtual 8-device CPU mesh so parallelism (FSDP, TP,
CP, PP, EP) is exercised without TPU hardware, mirroring the reference's
single-host v4-8 strategy (reference: MaxText/tests/context_parallelism_test.py,
pipeline_parallelism_test.py). Pallas kernels run in interpreter mode on CPU.

The environment pins JAX_PLATFORMS=axon via sitecustomize; we override it
in-process before any backend initialization.
"""

import os

# MTT_TPU_TESTS=1 flips the harness to the real attached TPU: the CPU mesh
# override is skipped and tpu-marked tests RUN instead of being skipped
# (use for tests/test_tpu_smoke.py on a chip-attached host).
_TPU_RUN = bool(os.environ.get("MTT_TPU_TESTS"))

# Must be set before the XLA CPU client is created.
_flags = os.environ.get("XLA_FLAGS", "")
if not _TPU_RUN and "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

if not _TPU_RUN:
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)

import pytest  # noqa: E402


def pytest_collection_modifyitems(config, items):
    for item in items:
        if "tpu" in item.keywords and not _TPU_RUN:
            item.add_marker(
                pytest.mark.skip(reason="requires real TPU; CPU test mesh active")
            )


@pytest.fixture(scope="session")
def eight_cpu_devices():
    devices = jax.devices()
    assert len(devices) == 8, f"expected 8 virtual CPU devices, got {devices}"
    return devices
