"""Test harness config.

Runs everything on a virtual 8-device CPU mesh so sharded code paths execute
in CI without TPU hardware — the multi-device testing the reference lacks
(SURVEY.md §4: reference tests multi-node only on self-hosted CI runners).

Platform forcing must happen BEFORE the first backend initialization; note
the environment's sitecustomize may pre-register an accelerator plugin and
override JAX_PLATFORMS, so we also set jax.config explicitly.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def mesh8():
    from intel_extension_for_transformers_tpu.parallel import create_mesh

    return create_mesh(dp=2, tp=4)
