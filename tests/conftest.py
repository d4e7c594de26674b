"""Test configuration: run everything on a virtual 8-device CPU mesh.

Pallas kernels run in interpreter mode on CPU (ops.render.default_interpret);
multi-chip sharding tests use the 8 virtual devices.  Must set the env vars
before jax initialises its backends.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # the shell presets axon (TPU)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# sitecustomize pre-imports jax._src, latching JAX_PLATFORMS=axon before the
# env override above can take effect — force the config directly.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import pytest  # noqa: E402


def pytest_addoption(parser):
    parser.addoption(
        "--runslow", action="store_true", default=False,
        help="also run tests marked slow (full interpreter-mode coverage)",
    )


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: heavyweight interpreter-mode test; skipped unless --runslow",
    )


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow"):
        return
    skip = pytest.mark.skip(reason="slow (run with --runslow)")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
