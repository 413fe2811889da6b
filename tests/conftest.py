"""Test harness: run everything on an 8-virtual-device CPU mesh.

The container pre-imports jax with the axon TPU backend registered
(JAX_PLATFORMS=axon via sitecustomize), so plain env-var defaults are too
late. We force the platform through jax.config before any backend is
initialized: tests must run on the virtual CPU mesh — eager dispatch over
the TPU tunnel is orders of magnitude too slow for unit tests, and the
multi-device sharding paths need 8 devices.

The reference has no fake multi-device backend at all (its pmap paths are
only exercised on real GPUs, see SURVEY.md §4); this conftest is the missing
piece that lets the full sharded training path run in CI.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

assert jax.devices()[0].platform == "cpu", "tests must run on CPU"
assert len(jax.devices()) == 8, "tests expect an 8-device virtual mesh"
