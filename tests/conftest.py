"""Test configuration: force an 8-device CPU platform + float64.

Sharding tests run on a virtual 8-device CPU mesh (no TPU pod needed), and
correctness tests use float64 to compare against scipy references at tight
tolerances.

Note: a pytest plugin imports jax before this conftest runs, so plain env
vars are too late -- the config must be updated through jax.config (backends
are initialized lazily, so this still takes effect).
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)


def pytest_report_header(config):
    return f"jax platform: {jax.default_backend()}, devices: {jax.device_count()}"
