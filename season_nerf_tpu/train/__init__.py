from season_nerf_tpu.train.engine import Trainer  # noqa: F401
