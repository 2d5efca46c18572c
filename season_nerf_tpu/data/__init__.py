from season_nerf_tpu.data.rays import RayTable, build_ray_table, RAY_DIM
from season_nerf_tpu.data.dataset import DeviceRayDataset
from season_nerf_tpu.data import synthetic
