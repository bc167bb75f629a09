"""Test configuration: force an 8-virtual-device CPU mesh.

Tests never touch the real TPU: they run on the host CPU platform with 8
virtual XLA devices so sharding/collective tests exercise real multi-device
programs (the driver separately dry-run-compiles the multi-chip path via
__graft_entry__.dryrun_multichip).
"""

import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax

jax.config.update("jax_platforms", "cpu")

import pytest


@pytest.fixture
def rng():
    return jax.random.PRNGKey(0)
