"""Test harness config: run on a virtual 8-device CPU mesh with f64.

Multi-chip sharding is validated on host CPU devices
(`xla_force_host_platform_device_count`), the TPU-native analog of a
fake distributed backend (SURVEY.md §4).
"""

import os

# Force CPU: the session environment pins JAX_PLATFORMS to the real TPU
# backend (axon); tests must not depend on (or monopolize) the one chip.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"
os.environ["JAX_ENABLE_X64"] = "1"

import jax  # noqa: E402

# The image's sitecustomize force-registers the axon TPU backend and
# rewrites jax_platforms to "axon,cpu"; override it back to CPU-only so
# the suite never claims (or hangs on) the single tunneled TPU chip.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running end-to-end pipeline tests"
    )
