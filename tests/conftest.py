"""Test harness: run everything on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI, so sharding/replica tests
exercise the same pjit/Mesh code paths on 8 virtual CPU devices (SURVEY.md
§4). Env must be set before jax initializes.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import pathlib

import jax
import pytest

# The hosting environment pins JAX_PLATFORMS to its TPU plugin via a site
# hook, so the env var alone is not enough — force the CPU backend through
# the config API before any backend initialization.
jax.config.update("jax_platforms", "cpu")

# This JAX build's default matmul precision truncates inputs to bf16 even on
# CPU; numeric-parity tests compare f32 math, so force full precision here.
# Production code controls precision explicitly where it matters.
jax.config.update("jax_default_matmul_precision", "highest")

REFERENCE_DIR = pathlib.Path("/root/reference")


@pytest.fixture(scope="session")
def reference_dir():
    if not REFERENCE_DIR.is_dir():
        pytest.skip("reference checkout not available")
    return REFERENCE_DIR


@pytest.fixture(scope="session")
def flac_fixture_3s(reference_dir):
    p = reference_dir / "client" / "3sec.flac"
    if not p.is_file():
        pytest.skip("3sec.flac fixture not available")
    return p
