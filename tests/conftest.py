"""Test configuration: run everything on CPU with 8 virtual devices so the
multi-chip sharding paths are testable without TPU hardware (the driver
separately dry-runs the multi-chip path; benches run on the real chip).

The environment may pre-register a TPU platform plugin via sitecustomize and
pin JAX_PLATFORMS — override both the env var and the live config."""

import os

# FOAST pipeline bugs must FAIL tests, not silently fall back to the raw
# definition (production default is graceful fallback with the reason
# recorded on the operator).
os.environ.setdefault("GT4PY_FOAST_STRICT", "1")

if os.environ.get("GT4PY_TEST_PLATFORM", "cpu") != "tpu":
    os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

if os.environ.get("GT4PY_TEST_PLATFORM", "cpu") != "tpu":
    jax.config.update("jax_platforms", "cpu")
