"""Ground-truth lidar DSM loading (DFC2019 Track-3).

Equivalent of ``all_NeRF/mg_Load_Lidar.py``: read ``<site>_DSM.tif`` and its
UTM sidecar ``<site>_DSM.txt`` (easting, northing, n_pixels, gsd), resample
onto the normalized lat/lon grid by WGS84->UTM pixel lookup, normalize
heights into [-1, 1] by the site bounds (get_GT_DSM:5-17,
build_ground_truth_UTM:38-74).  NaN marks no-data, deliberately propagated.
"""

from __future__ import annotations

import os
from typing import Tuple

import numpy as np

from season_nerf_tpu.data.io import read_tiff
from season_nerf_tpu.geometry.units import wgs84_to_utm


def build_gt_dsm_utm(dsm_path: str, out_hw: Tuple[int, int],
                     bounds_lla: np.ndarray, utm_path: str) -> np.ndarray:
    """Raster of GT heights (meters) over the normalized site grid."""
    img = read_tiff(dsm_path)
    if img.ndim == 3:
        img = img[..., 0]
    easting, northing, _pixels, gsd = np.loadtxt(utm_path)

    H, W = out_hw
    vx = np.repeat(np.arange(H), W)
    vy = np.tile(np.arange(W), H)
    lat = vx / max(H - 1, 1) * (bounds_lla[0][1] - bounds_lla[0][0]) + bounds_lla[0][0]
    lon = vy / max(W - 1, 1) * (bounds_lla[1][1] - bounds_lla[1][0]) + bounds_lla[1][0]
    # pin every conversion to the site-center zone: sites straddling a UTM
    # zone boundary must use one consistent frame (the sidecar's)
    from season_nerf_tpu.geometry.units import latlon_to_zone_number
    zone = latlon_to_zone_number(float(np.mean(bounds_lla[0])),
                                 float(np.mean(bounds_lla[1])))
    e, n, _, _ = wgs84_to_utm(lat, lon, force_zone_number=zone)
    gx = np.round((n - northing) / gsd).astype(int)
    gy = np.round((e - easting) / gsd).astype(int)
    good = (gx >= 0) & (gx < img.shape[0]) & (gy >= 0) & (gy < img.shape[1])
    out = np.full((H, W), np.nan, np.float64)
    out[vx[good], vy[good]] = img[gx[good], gy[good]]
    return np.flip(out, 0)


def get_gt_dsm(gt_dir: str, site_name: str, out_hw: Tuple[int, int],
               bounds_lla: np.ndarray) -> np.ndarray:
    """[-1, 1]-normalized GT DSM raster (get_GT_DSM, mg_Load_Lidar.py:5-17)."""
    dsm = os.path.join(gt_dir, f"{site_name}_DSM.tif")
    utm = dsm[:-3] + "txt"
    gt = build_gt_dsm_utm(dsm, out_hw, bounds_lla, utm)
    h0, h1 = bounds_lla[2][0], bounds_lla[2][1]
    return (gt - h0) / (h1 - h0) * 2.0 - 1.0


def height_range_from_dsm(gt_dir: str, site_name: str,
                          margin: float = 5.0) -> Tuple[float, float]:
    """(min_h - 5, max_h + 5) from the lidar DSM (mg_pre_NeRF.py:41-47)."""
    img = read_tiff(os.path.join(gt_dir, f"{site_name}_DSM.tif"))
    if img.ndim == 3:
        img = img[..., 0]
    return float(np.nanmin(img) - margin), float(np.nanmax(img) + margin)
