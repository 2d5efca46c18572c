"""Test harness configuration.

Tests run on a *virtual 8-device CPU mesh* — the standard JAX substitute for
multi-chip TPU hardware (see SURVEY.md §4).  The env vars must be set before
jax is imported anywhere, hence this conftest sets them at collection time.
"""

import os
import sys

# Force CPU even when the surrounding environment selects a TPU platform
# (e.g. JAX_PLATFORMS=axon): unit tests must run on the virtual CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Site hooks (sitecustomize) may re-register a TPU platform *after* env vars
# are read, via jax.config.update("jax_platforms", ...).  Re-force CPU here:
# conftest runs before any test module imports jax-dependent code.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
