"""Test configuration.

Tests run on CPU with 8 virtual XLA devices — the idiomatic JAX substitute
for a mocked multi-chip TPU pod (SURVEY.md §4): sharding/collective code
paths compile and execute against a real 8-device mesh without TPU hardware.
"""

import os
import sys

# Must be set before jax initialises its backends.  (The sandbox's axon
# sitecustomize pins JAX_PLATFORMS=axon in the environment, so the env var
# alone is not sufficient — jax.config wins over it.)
os.environ["JAX_PLATFORMS"] = "cpu"
# The stand-in-encoder stderr banner (frontend.text.warn_standin_encoder) is
# intentionally loud for users; hundreds of tests build PRNG embedders, so
# silence it suite-wide.  Tests that assert the banner unset this var.
os.environ.setdefault("ICASSP_SUPPRESS_STANDIN_WARNING", "1")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
