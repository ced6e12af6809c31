"""Test harness configuration.

Tests run on a virtual 8-device CPU mesh (the standard technique for
validating TPU-style sharding code without chips — SURVEY §4) with x64
enabled so parity fixtures match the reference's float64 NumPy oracle.

NOTE: this environment pre-imports jax via an axon sitecustomize with
``JAX_PLATFORMS=axon`` pinned, so the platform must be overridden through
``jax.config`` (env vars are read too early to help).
"""
import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def mesh8():
    from koopmanx.parallel import make_mesh

    return make_mesh(jax.devices()[:8])
