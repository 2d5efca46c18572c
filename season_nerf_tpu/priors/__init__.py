from season_nerf_tpu.priors.space_carving import space_carve_dsm, get_dsm  # noqa: F401
