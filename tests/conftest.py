import os

# Tests run on CPU with a virtual 8-device mesh so sharding paths are
# exercised without TPU hardware (SURVEY.md §4 implication).
#
# NOTE: a sitecustomize hook may pre-register a remote TPU backend and force
# jax_platforms to it at interpreter start, ignoring JAX_PLATFORMS from the
# environment — so we must override via jax.config *after* import, and set
# XLA_FLAGS before the CPU client is instantiated (backends init lazily).
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# WTW_TEST_TPU=1 leaves the real backend in place so the TPU-only tests
# (e.g. the Pallas-vs-XLA parity test, tests/test_physics_batched.py) can
# run against hardware: the night supervisor captures that run in a
# driver-visible artifact (results/pallas_tpu_r4.txt).
if os.environ.get("WTW_TEST_TPU") != "1":
    jax.config.update("jax_platforms", "cpu")
