"""Site preprocessing: images + RPCs + IMD -> scaled cameras + bounds.

Equivalent of the reference's ``mg_pre_NeRF.run_pre_NeRF`` (mg_pre_NeRF.py:
34-140) + ``pre_NeRF/load_sat_imgs.py``: scan the site's RGB GeoTIFFs, load
RPCs (bundle-adjusted .ikono from cache when present — the reference cannot
*run* BA either, it only loads pre-corrected RPCs, mg_pre_NeRF.py:58-65),
parse IMD sun/view/time metadata, derive the height range from the lidar
DSM +-5 m, shrink-fit the common lat/lon bounds, fit the 3x4 projective
camera per image with an accuracy self-check, and scale everything into the
[-1, 1]^3 cube.

Caching happens downstream of this module, where the expensive products
live: the ray table (data/rays.build_ray_table, npz keyed by row-shaping
settings) and the space-carving prior (SC_<site>_hm.npy).  The GeoTIFF
pixels themselves are needed in memory every run regardless, so the fits
here are recomputed (they are seconds, the reference pickles them mostly
to carry Python objects across entry points).
"""

from __future__ import annotations

import dataclasses
import os
from typing import List, Optional, Tuple

import numpy as np

from season_nerf_tpu.data import io as data_io
from season_nerf_tpu.data.lidar import height_range_from_dsm
from season_nerf_tpu.geometry.camera import (
    Camera, fit_camera_from_rpc, find_bounds, test_accuracy)
from season_nerf_tpu.geometry.time_enc import CaptureTime


@dataclasses.dataclass
class SiteData:
    cameras: List[Camera]          # scaled into the cube, with .image set
    bounds_lla: np.ndarray         # [[lat0,lat1],[lon0,lon1],[h0,h1]]
    accuracy: dict                 # projective-fit reprojection stats


def load_site_images(root_dir: str, site_name: str, rpc_dir: str,
                     cache_dir: str, imd_dir: Optional[str] = None,
                     skip_bundle_adjust: bool = False):
    """-> list of (name, image, rpc, imd_meta)."""
    entries = []
    found = data_io.find_site_images(root_dir, site_name)
    if not found:
        raise FileNotFoundError(
            f"no {site_name}_*_RGB.tif under {root_dir}")
    for name, path in found:
        img = data_io.read_tiff(path, nodata_to_nan=False)
        if img.max() > 1.5:
            img = img / 255.0
        rpc = data_io.load_rpc_for_image(
            name, path, cache_dir, prefer_corrected=not skip_bundle_adjust)
        imd_path = find_imd(name, [imd_dir, rpc_dir, root_dir])
        if imd_path is None:
            raise FileNotFoundError(f"no IMD metadata for {name}")
        meta = data_io.parse_imd(imd_path)
        entries.append((name, img, rpc, meta))
    return entries


def find_imd(name: str, search_dirs) -> Optional[str]:
    """Resolve the IMD metadata file for image ``name``.

    DFC naming is ``<PFX>_<site#>_<img-id>_RGB``: the per-image id is the
    THIRD token, and the reference resolves IMDs as
    ``IMD_location/<PFX>/<id-minus-leading-char>.IMD``
    (load_sat_imgs.py:21, ``file_name[2][1::]``).  Also accepts the flat
    ``<name>.IMD`` / ``<id>.IMD`` layouts used by repackaged datasets.
    """
    parts = name.split("_")
    sid = parts[2] if len(parts) >= 3 else name
    for cand_dir in search_dirs:
        if cand_dir is None:
            continue
        for cand in (os.path.join(cand_dir, name + ".IMD"),
                     os.path.join(cand_dir, parts[0], sid[1:] + ".IMD"),
                     os.path.join(cand_dir, parts[0], sid + ".IMD"),
                     os.path.join(cand_dir, sid + ".IMD")):
            if os.path.exists(cand):
                return cand
    return None


def preprocess_site(root_dir: str, site_name: str, rpc_dir: str,
                    cache_dir: str, gt_dir: Optional[str] = None,
                    height_range: Optional[Tuple[float, float]] = None,
                    skip_bundle_adjust: bool = False,
                    camera_model: str = "Pinhole",
                    cache: bool = True) -> SiteData:
    """The run_pre_NeRF pipeline.  Returns scaled cameras + bounds."""
    tag = "" if skip_bundle_adjust else "_Refined"
    entries = load_site_images(root_dir, site_name, rpc_dir, cache_dir,
                               skip_bundle_adjust=skip_bundle_adjust)

    if height_range is None:
        if gt_dir is not None:
            height_range = height_range_from_dsm(gt_dir, site_name)
        else:
            raise ValueError("need gt_dir or an explicit height_range")
    h_min, h_max = height_range

    # fit per-image cameras in raw LLA, find joint bounds, then scale
    cams = []
    errs = []
    for name, img, rpc, meta in entries:
        cam = fit_camera_from_rpc(rpc, img.shape, h_min, h_max, name=name,
                                  affine=(camera_model == "Parallel"))
        mu, sigma, emin, emax = test_accuracy(cam, h_min, h_max)
        errs.append((mu, sigma, emin, emax))
        t = CaptureTime.parse(meta["first_line_time"])
        cam = dataclasses.replace(
            cam,
            sun_el_az=(meta["sun_el"], meta["sun_az"]),
            view_el_az=(90.0 - meta.get("off_nadir", 0.0),
                        meta.get("view_az", 0.0)),
            time_frac=t.year_frac, day_frac=t.day_frac,
            rpc=rpc)
        cam.image = img
        cams.append(cam)

    bounds = find_bounds(cams, (h_min, h_max))
    scaled = []
    for cam in cams:
        sc = cam.scale(bounds)
        sc.image = cam.image
        scaled.append(sc)

    errs = np.array(errs)
    acc = {"mean_px": float(errs[:, 0].mean()),
           "std_px": float(errs[:, 1].mean()),
           "min_px": float(errs[:, 2].min()),
           "max_px": float(errs[:, 3].max())}
    site = SiteData(cameras=scaled, bounds_lla=np.asarray(bounds), accuracy=acc)

    if cache:
        os.makedirs(cache_dir, exist_ok=True)
        np.save(os.path.join(cache_dir, f"bounds_LLA{tag}.npy"),
                site.bounds_lla)
    return site


def world_transform(site: SiteData):
    """(world_center, W2L similarity) — the ``W2C_W2L_H.npy`` artifact
    contract (main.py:27-32): the saved pair lets a pretrained model dir
    convert world el/az angles into cube-frame vectors."""
    cam = site.cameras[0]
    return cam.get_world_center(), cam.S


def save_w2c_w2l(path: str, site: SiteData):
    wc, S = world_transform(site)
    save_world_artifact(path, wc, S, tuple(site.bounds_lla[2]))


def save_world_artifact(path: str, wc, S, h_range=None):
    """Write the W2C_W2L_H.npy artifact: (world_center, W2L similarity,
    site height range in meters).  The reference stores only the first two
    (main.py:27-32); carrying h_range lets a deployed model dir serve
    height maps in meters without the original site data.  Any field may
    be None (synthetic runs have no world frame)."""
    arr = np.empty(3, object)
    arr[0], arr[1], arr[2] = wc, S, h_range
    np.save(path, arr, allow_pickle=True)


def load_w2c_w2l(path: str):
    """-> (world_center, W2L similarity, h_range-or-None).  Reads both the
    3-element artifact and the legacy 2-element layout (h_range None)."""
    arr = np.load(path, allow_pickle=True)
    h_range = arr[2] if arr.shape[0] > 2 else None
    if h_range is not None:
        h_range = (float(h_range[0]), float(h_range[1]))
    return arr[0], arr[1], h_range
