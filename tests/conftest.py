import os
import sys

# Force a virtual 8-device CPU platform for all tests: sharding tests run on
# a fake multi-chip mesh, everything else is CPU-deterministic.  NB: this
# environment pre-registers a TPU ("axon") backend in sitecustomize and sets
# JAX_PLATFORMS=axon, so the env var alone is not enough — we must override
# the jax config directly before any computation runs.
#
# SIMPLEPATH_TEST_TPU=1 opts out: tests run on the real default device
# (used for the TPU-gated tiers, e.g. the headline spp-matched parity run).
if os.environ.get("SIMPLEPATH_TEST_TPU") != "1":
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

    import jax

    jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
