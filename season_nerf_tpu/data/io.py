"""File IO for DFC2019-style sites without GDAL.

The reference reads imagery through gdal and RPCs through rpcm
(mg_Sat_Img.py:68-74, mg_pre_NeRF.py:70-87).  Neither ships in this
environment, so this module provides native readers:

- ``read_tiff``: PIL-based TIFF reader (uint8/uint16 RGB and float32 DSM
  rasters), returning [H, W, C] float arrays; -9999 nodata -> NaN for DSMs.
- ``rpc_from_tiff``: the standard TIFF RPCCoefficient tag (50844, 92
  doubles) -> RPCModel, the same source rpcm.rpc_from_geotiff uses.
- ``parse_imd``: the WorldView IMD metadata fields the reference scans for
  (mg_Sat_Img.py:21-66): meanSunAz/El, meanOffNadirViewAngle, meanSatAz,
  firstLineTime.
"""

from __future__ import annotations

import os
import re
from typing import Dict, Optional

import numpy as np

from season_nerf_tpu.geometry.rpc import RPCModel, parse_rpc_file

RPC_TIFF_TAG = 50844


def read_tiff(path: str, nodata_to_nan: bool = True) -> np.ndarray:
    """Read a TIFF into float32 [H, W] or [H, W, C]."""
    from PIL import Image
    Image.MAX_IMAGE_PIXELS = None
    with Image.open(path) as im:
        arr = np.asarray(im)
    arr = arr.astype(np.float32)
    if nodata_to_nan and arr.ndim == 2:
        arr[arr == -9999.0] = np.nan
    return arr


def rpc_from_tiff(path: str) -> Optional[RPCModel]:
    """Extract the RPC model from TIFF tag 50844 when present."""
    from PIL import Image
    Image.MAX_IMAGE_PIXELS = None
    with Image.open(path) as im:
        tag = getattr(im, "tag_v2", {})
        vals = tag.get(RPC_TIFF_TAG)
    if vals is None:
        return None
    v = np.asarray(vals, np.float64)
    if v.size != 92:
        return None
    return RPCModel(
        row_offset=v[2], col_offset=v[3],
        lat_offset=v[4], lon_offset=v[5], alt_offset=v[6],
        row_scale=v[7], col_scale=v[8],
        lat_scale=v[9], lon_scale=v[10], alt_scale=v[11],
        row_num=v[12:32], row_den=v[32:52],
        col_num=v[52:72], col_den=v[72:92])


def parse_imd(path_or_text: str) -> Dict:
    """Parse the IMD fields the pipeline needs (mg_Sat_Img.py:21-66).

    Returns dict with sun_el, sun_az, off_nadir, view_az (degrees) and
    first_line_time (ISO UTC string)."""
    if os.path.exists(str(path_or_text)):
        with open(path_or_text, "r") as fin:
            text = fin.read()
    else:
        text = str(path_or_text)
    out = {}
    patterns = {
        "sun_az": r"meanSunAz\s*=\s*([-\d.]+)",
        "sun_el": r"meanSunEl\s*=\s*([-\d.]+)",
        "off_nadir": r"meanOffNadirViewAngle\s*=\s*([-\d.]+)",
        "view_az": r"meanSatAz\s*=\s*([-\d.]+)",
    }
    for k, pat in patterns.items():
        m = re.search(pat, text)
        if m:
            out[k] = float(m.group(1))
    m = re.search(r"firstLineTime\s*=\s*([\w\-.:]+)", text)
    if m:
        out["first_line_time"] = m.group(1).rstrip(";")
    return out


def find_site_images(root_dir: str, site_name: str):
    """`<SITE>_<id>_RGB.tif` scan (load_sat_imgs.py:13-29)."""
    img_dir = os.path.join(root_dir, "Images")
    if not os.path.isdir(img_dir):
        img_dir = root_dir
    names = sorted(f for f in os.listdir(img_dir)
                   if f.startswith(site_name) and f.endswith("_RGB.tif"))
    return [(f[:-len(".tif")], os.path.join(img_dir, f)) for f in names]


def load_rpc_for_image(img_name: str, tif_path: str, cache_dir: str,
                       prefer_corrected: bool = True) -> RPCModel:
    """RPC resolution order (mg_pre_NeRF.py:53-87): corrected .ikono in the
    cache, then original .ikono, then the GeoTIFF's RPC tag."""
    candidates = []
    if prefer_corrected:
        candidates.append(os.path.join(cache_dir,
                                       f"rpc_{img_name}_corrected.ikono"))
    candidates.append(os.path.join(cache_dir, f"rpc_{img_name}_original.ikono"))
    for c in candidates:
        if os.path.exists(c):
            return parse_rpc_file(c)
    rpc = rpc_from_tiff(tif_path)
    if rpc is None:
        raise FileNotFoundError(
            f"no RPC for {img_name}: no .ikono in {cache_dir} and no RPC "
            "tag in the GeoTIFF")
    return rpc
