"""Test harness: force an 8-device virtual CPU mesh before jax import.

Multi-chip sharding is validated on host CPU devices
(XLA_FLAGS=--xla_force_host_platform_device_count=8) — the standard JAX
substitute for a fake cluster (SURVEY §4).
"""

import os
import sys

# Force CPU even when the environment pins JAX_PLATFORMS to a TPU platform:
# the TPU is single-client and must stay free for the bench; tests run on a
# virtual 8-device CPU mesh. NOTE: this image's sitecustomize imports jax at
# interpreter start, so env vars are too late — use jax.config.update, which
# works as long as no backend has been initialised yet.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
