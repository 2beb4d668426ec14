"""Test configuration: force an 8-device virtual CPU mesh.

The reference has no tests (SURVEY.md §4); our test strategy follows §4's
implications: numerics goldens on CPU, plus "distributed" tests on a faked
8-device host platform (the standard JAX substitute for a fake backend).
"""
import os

# Must be set before jax is imported anywhere.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_default_matmul_precision", "highest")

# The TPU plugin in this environment force-registers itself even when
# JAX_PLATFORMS=cpu; pin computation to the (8 virtual) CPU devices so tests
# are hermetic and the fake 8-device mesh is available.
try:
    jax.config.update("jax_default_device", jax.devices("cpu")[0])
except RuntimeError:
    pass
