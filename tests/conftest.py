"""Test harness configuration.

Tests run on a virtual 8-device CPU mesh (the standard JAX analog of a
fake distributed backend -- SURVEY.md section 4d) with x64 enabled so the
parity oracle path can run in float64.

Note: this environment pre-imports jax at interpreter startup (site
customization), so env vars like JAX_PLATFORMS/JAX_ENABLE_X64 are too
late here -- we must go through jax.config.update, and XLA_FLAGS before
first backend use.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
# Headless pygame for UI tests.
os.environ.setdefault("SDL_VIDEODRIVER", "dummy")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def devices8():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices")
    return devs[:8]
