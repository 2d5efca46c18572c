"""Loading a trained model directory into a ready Renderer.

One canonical implementation of the model-dir loading sequence
(opts.json -> model_from_config -> template init -> restore_variables
[-> W2C_W2L_H.npy world frame]) shared by the CLI render path
(cli.render_novel_view), the HTTP service (render/serving.py), the movie
maker (tools/make_movie.py) and the export tool (tools/export_render.py).
The model-dir layout is the reference's self-describing artifact contract
(main_run_Season_NeRF.py:60-90).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Callable, Optional, Tuple


@dataclasses.dataclass
class LoadedModel:
    """Everything a render surface needs from a trained model directory."""
    cfg: object                              # Config
    model: object                            # TNeRF
    variables: dict
    renderer: object                         # Renderer
    angles_to_vec: Optional[Callable]        # world (el, az) -> cube vec
    h_range: Optional[Tuple[float, float]]   # site height range, meters


def load_model_dir(model_dir: str, n_samples: Optional[int] = None,
                   chunk: Optional[int] = None,
                   use_mesh: bool = False,
                   fast_render: Optional[Tuple[int, int]] = None
                   ) -> LoadedModel:
    """Load ``model_dir`` (opts.json + Final_Model.nn [+ W2C_W2L_H.npy]).

    ``n_samples``/``chunk`` override the run's recorded values.
    ``use_mesh=True`` shards render chunks over all visible devices (the
    training mesh's serving-side twin) — the right default for long-lived
    services and one-shot CLI renders alike.
    ``fast_render=(n_coarse, n_fine)`` enables depth-guided fast rendering
    on the full-composite path (renderer.render_chunk_outputs_fast).
    """
    import jax
    import jax.numpy as jnp

    from season_nerf_tpu.config import Config
    from season_nerf_tpu.data.ingest import load_w2c_w2l
    from season_nerf_tpu.models.tnerf import model_from_config
    from season_nerf_tpu.render.renderer import Renderer
    from season_nerf_tpu.train.state import restore_variables

    cfg = Config.load_json(os.path.join(model_dir, "opts.json"))
    model = model_from_config(cfg)
    template = model.init(jax.random.PRNGKey(0), jnp.zeros((2, 3)),
                          jnp.zeros((2, 3)), jnp.zeros((2, 4)), train=False)
    variables, _ = restore_variables(
        template, os.path.join(model_dir, "Final_Model.nn"))

    angles_to_vec, h_range = None, None
    w2c_path = os.path.join(model_dir, "W2C_W2L_H.npy")
    if os.path.exists(w2c_path):
        wc, S, h_range = load_w2c_w2l(w2c_path)
        if wc is not None:
            from season_nerf_tpu.geometry.units import angles_to_vec_from_site
            angles_to_vec = angles_to_vec_from_site(wc, S)

    mesh = None
    if use_mesh:
        from season_nerf_tpu.train.engine import _auto_mesh
        mesh = _auto_mesh(cfg, strict=False)
    renderer = Renderer(model, variables,
                        n_samples=n_samples or cfg.n_samples,
                        chunk=chunk or cfg.chunk,
                        classic_solar=cfg.Solar_Type_2,
                        use_hsluv=cfg.use_HSLuv, mesh=mesh,
                        fast_render=fast_render)
    return LoadedModel(cfg=cfg, model=model, variables=variables,
                       renderer=renderer, angles_to_vec=angles_to_vec,
                       h_range=h_range)
