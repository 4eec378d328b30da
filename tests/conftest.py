"""Test configuration: run hermetically on an 8-device virtual CPU mesh.

Pallas kernels run in interpreter mode on CPU (selected automatically by
qgemm_pallas); tests marked `tpu` only run when a real TPU is present
(e.g. `pytest -m tpu` on hardware).
"""

import os

# Must happen before jax import anywhere in the test process.
# Set TMAC_TEST_TPU=1 to run the suite against real hardware instead.
_USE_TPU = os.environ.get("TMAC_TEST_TPU", "") == "1"
if not _USE_TPU:
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import jax  # noqa: E402
import pytest  # noqa: E402

if not _USE_TPU:
    # Some environments pre-register a TPU platform that ignores the env
    # var; the config update always wins.
    jax.config.update("jax_platforms", "cpu")


def pytest_configure(config):
    config.addinivalue_line("markers", "tpu: requires real TPU hardware")


def pytest_collection_modifyitems(config, items):
    on_tpu = jax.default_backend() == "tpu"
    skip = pytest.mark.skip(reason="requires real TPU hardware")
    for item in items:
        if "tpu" in item.keywords and not on_tpu:
            item.add_marker(skip)
