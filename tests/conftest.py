"""Test configuration: force an 8-device virtual CPU mesh.

The reference has no tests (SURVEY.md §4); our test strategy follows §4's
implications: numerics goldens on CPU, plus "distributed" tests on a faked
8-device host platform (the standard JAX substitute for a fake backend).
"""
import os

# Must be set before jax is imported anywhere. Force (not setdefault): the
# shell environment exports JAX_PLATFORMS=axon (the remote-TPU tunnel), and
# tests must be hermetic on CPU — otherwise backend-dispatched ops (e.g.
# ops.pallas_blur.depthwise_blur_fast) route through the tunnel and hang.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import tempfile  # noqa: E402

# Keep test-run JSONL logs out of the repo's runs/ directory (RunLogger
# honors this env var; see utils/logging.py).
os.environ.setdefault(
    "FOOD101_SR_RUN_DIR", tempfile.mkdtemp(prefix="food101_sr_test_runs_"))

import jax  # noqa: E402

jax.config.update("jax_default_matmul_precision", "highest")

# The axon TPU plugin in this environment IGNORES the JAX_PLATFORMS env var
# (it re-registers at import), so jax.devices() would still return the real
# TPU and anything mesh-shaped (make_mesh, train()) would run through the
# remote tunnel. use_cpu_backend() applies the config route (which does
# work), making tests genuinely CPU-hermetic with the 8 virtual devices —
# and disables the persistent compile cache, whose XLA:CPU AOT entries
# warn on every reload (see food101_sr_tpu.use_cpu_backend).
import food101_sr_tpu  # noqa: E402

assert food101_sr_tpu.use_cpu_backend()
