# Test configuration: force CPU with 8 virtual devices so sharding tests can
# exercise a multi-chip mesh without TPU hardware (see SURVEY.md §4.6).
#
# The environment preloads jax (sitecustomize) and points JAX_PLATFORMS at a
# real TPU tunnel, so plain env-var setdefault is too late; override through
# jax.config before any backend is initialized. Set KA9Q_TEST_PLATFORM to
# opt out (e.g. to run the numerics tests on the real chip).
import os

_platform = os.environ.get("KA9Q_TEST_PLATFORM", "cpu")
os.environ["JAX_PLATFORMS"] = _platform
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", _platform)
