from season_nerf_tpu.geometry import units, rpc, camera, time_enc, solar, spline
