from season_nerf_tpu.render.renderer import Renderer, encode_time  # noqa: F401
