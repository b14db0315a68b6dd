"""Test configuration: force an 8-device virtual CPU mesh.

The axon sitecustomize registers a TPU backend and programmatically sets
``jax_platforms=axon,cpu``; env vars alone cannot override it, so we update the
config after import. This gives every test 8 virtual CPU devices, which is how
the multi-chip sharding paths (halo exchange, psum observables) are exercised
without a pod — see SURVEY.md §4.
"""

import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
