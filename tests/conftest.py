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


import pytest  # noqa: E402


@pytest.fixture(scope="session")
def tiny_model_dir(tmp_path_factory):
    """A minimal self-describing model directory (opts.json +
    Final_Model.nn) that render/movie/serving tools can load."""
    import jax.numpy as jnp
    from season_nerf_tpu.config import Config
    from season_nerf_tpu.models.tnerf import model_from_config
    from season_nerf_tpu.train.state import save_model_artifact

    d = tmp_path_factory.mktemp("model_dir")
    cfg = Config(site_name="tiny", fc_units=32, fc_layers=2,
                 n_samples=16, chunk=4096)
    cfg.save_json(str(d / "opts.json"))
    model = model_from_config(cfg)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((2, 3)),
                           jnp.zeros((2, 3)), jnp.zeros((2, 4)), train=False)
    save_model_artifact(str(d / "Final_Model.nn"), variables["params"],
                        variables.get("batch_stats", {}), meta={})
    # synthetic-style world artifact: no world frame, but a height range —
    # exercises both the wc-None guard and meters-unit serving
    from season_nerf_tpu.data.ingest import save_world_artifact
    save_world_artifact(str(d / "W2C_W2L_H.npy"), None, None, (0.0, 30.0))
    return str(d)
