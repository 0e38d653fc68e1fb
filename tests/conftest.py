"""Test harness: run everything on a virtual 8-device CPU mesh.

The reference has no automated test suite (SURVEY.md §4); our strategy is shape/golden unit
tests per module plus multi-device sharding tests on a host-platform device mesh.

NOTE: the session environment registers an accelerator PJRT plugin at interpreter startup
(sitecustomize imports jax), so env-var overrides are too late — we must force the platform
through jax.config before any backend is initialized.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

assert jax.devices()[0].platform == "cpu", "tests must run on the host CPU mesh"

def pytest_configure(config):
    config.addinivalue_line("markers", "slow: long-running end-to-end tests")
