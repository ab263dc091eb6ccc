"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip hardware isn't available in CI; sharding correctness is validated
on host-platform virtual devices (SURVEY.md §4 test plan).
"""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The axon sitecustomize hook force-selects jax_platforms="axon,cpu", which
# makes the first op block ~80s dialing the TPU tunnel. Tests are CPU-only;
# override explicitly (config update wins over the hook).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
