from season_nerf_tpu.ops import rendering, sampling, robust_loss, metrics
