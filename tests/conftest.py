import os

# Tests run on a virtual 8-device CPU mesh so sharding paths are exercised
# without TPU hardware (SURVEY.md §4 test strategy).  XLA_FLAGS must be set
# before jax initializes; the platform override must go through
# jax.config.update because the axon TPU plugin ignores JAX_PLATFORMS.
# SBL_TEST_TPU=1 keeps the real TPU backend instead, so the two
# TPU-only Pallas kernel tests (test_pallas_attention.py) can run on the
# chip once per round:  SBL_TEST_TPU=1 pytest tests/test_pallas_attention.py
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

if not os.environ.get("SBL_TEST_TPU"):
    jax.config.update("jax_platforms", "cpu")
