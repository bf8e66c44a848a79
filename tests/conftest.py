"""Test configuration: CPU backend with 8 virtual devices, float64 enabled.

Multi-device code paths run in CI without TPUs via
``--xla_force_host_platform_device_count`` (SURVEY.md section 4); float64
matches the reference C solver's double precision for numerical parity.

Note: the environment may pre-import jax (sitecustomize) with a TPU backend
selected via JAX_PLATFORMS, so the platform must be forced through
``jax.config`` -- env-var edits here would be read too late.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running end-to-end workloads"
    )
    config.addinivalue_line(
        "markers",
        "smoke: fast pre-commit gate (one tiny test per production path); "
        "run `pytest tests -m smoke -q` before every commit",
    )
