"""Data-ingestion tests on a fabricated DFC-style site: TIFF round trip,
IMD parsing, RPC text parsing, full preprocess_site pipeline."""

import os

import numpy as np
import pytest

from season_nerf_tpu.data import io as data_io
from season_nerf_tpu.data.ingest import preprocess_site, save_w2c_w2l, load_w2c_w2l
from season_nerf_tpu.geometry.rpc import RPCModel, fit_rpc_from_projector


IMD_TEXT = """
BEGIN_GROUP = IMAGE_1
   meanSunAz = 156.7;
   meanSunEl = 62.3;
   meanOffNadirViewAngle = 12.1;
   meanSatAz = 201.4;
   firstLineTime = 2015-07-19T15:31:06.892174Z;
END_GROUP = IMAGE_1
"""


def _toy_rpc(dlat=0.0, dlon=0.0):
    """RPC fit to a synthetic near-nadir projective view of a small site."""
    lat0, lon0 = 39.0, -84.0

    def project(lat, lon, alt):
        row = (lat - lat0 - dlat) * 111_000 / 0.5 + 512 + alt * 0.08
        col = (lon - lon0 - dlon) * 85_000 / 0.5 + 512 + alt * 0.05
        return row, col

    return fit_rpc_from_projector(
        project, (lat0 - 0.004, lat0 + 0.004), (lon0 - 0.004, lon0 + 0.004),
        (200.0, 260.0))


def _rpc_text(rpc: RPCModel) -> str:
    lines = [
        f"LINE_OFF: {rpc.row_offset}", f"SAMP_OFF: {rpc.col_offset}",
        f"LAT_OFF: {rpc.lat_offset}", f"LONG_OFF: {rpc.lon_offset}",
        f"HEIGHT_OFF: {rpc.alt_offset}",
        f"LINE_SCALE: {rpc.row_scale}", f"SAMP_SCALE: {rpc.col_scale}",
        f"LAT_SCALE: {rpc.lat_scale}", f"LONG_SCALE: {rpc.lon_scale}",
        f"HEIGHT_SCALE: {rpc.alt_scale}",
    ]
    for prefix, vec in [("LINE_NUM_COEFF", rpc.row_num),
                        ("LINE_DEN_COEFF", rpc.row_den),
                        ("SAMP_NUM_COEFF", rpc.col_num),
                        ("SAMP_DEN_COEFF", rpc.col_den)]:
        for i, v in enumerate(vec):
            lines.append(f"{prefix}_{i + 1}: {v:.17e}")
    return "\n".join(lines)


@pytest.fixture()
def fake_site(tmp_path):
    from PIL import Image
    site = "OMA_999"
    root = tmp_path / "IEEE_Data"
    imgs = root / "Images"
    cache = tmp_path / "Cache" / site
    rpc_dir = tmp_path / "RPCs"
    gt = tmp_path / "GT"
    for d in (imgs, cache, rpc_dir, gt):
        d.mkdir(parents=True)
    rng = np.random.default_rng(0)
    for i, (dlat, dlon) in enumerate([(0, 0), (2e-5, -1e-5), (-1e-5, 2e-5)]):
        name = f"{site}_{i:03d}_RGB"
        arr = (rng.random((1024, 1024, 3)) * 255).astype(np.uint8)
        Image.fromarray(arr).save(imgs / f"{name}.tif")
        rpc = _toy_rpc(dlat, dlon)
        (cache / f"rpc_{name}_original.ikono").write_text(_rpc_text(rpc))
        (rpc_dir / f"{name}.IMD").write_text(IMD_TEXT)
    # GT DSM + UTM sidecar
    dsm = (rng.random((64, 64)) * 20 + 210).astype(np.float32)
    Image.fromarray(dsm, mode="F").save(gt / f"{site}_DSM.tif")
    from season_nerf_tpu.geometry.units import wgs84_to_utm
    e, n, _, _ = wgs84_to_utm(39.0, -84.0)
    np.savetxt(gt / f"{site}_DSM.txt", [e - 320, n - 320, 64, 10.0])
    return dict(site=site, root=str(root), cache=str(cache),
                rpc_dir=str(rpc_dir), gt=str(gt), tmp=tmp_path)


def test_read_tiff_roundtrip(fake_site):
    imgs = data_io.find_site_images(fake_site["root"], fake_site["site"])
    assert len(imgs) == 3
    arr = data_io.read_tiff(imgs[0][1])
    assert arr.shape == (1024, 1024, 3)
    assert arr.dtype == np.float32


def test_parse_imd():
    meta = data_io.parse_imd(IMD_TEXT)
    assert meta["sun_el"] == 62.3
    assert meta["sun_az"] == 156.7
    assert meta["off_nadir"] == 12.1
    assert meta["view_az"] == 201.4
    assert meta["first_line_time"].startswith("2015-07-19T15:31")


def test_find_imd_dfc_layout(tmp_path):
    """The DFC layout the reference resolves (load_sat_imgs.py:21):
    IMD_location/<PFX>/<id-minus-leading-char>.IMD for image
    <PFX>_<site#>_<id>_RGB — the per-image id is the THIRD token, not the
    (constant-per-site) site number."""
    from season_nerf_tpu.data.ingest import find_imd
    d = tmp_path / "OMA"
    d.mkdir()
    (d / "12.IMD").write_text("meanSunAz = 100;")
    (d / "13.IMD").write_text("meanSunAz = 110;")
    a = find_imd("OMA_281_012_RGB", [str(tmp_path)])
    b = find_imd("OMA_281_013_RGB", [str(tmp_path)])
    assert a and a.endswith(os.path.join("OMA", "12.IMD"))
    assert b and b.endswith(os.path.join("OMA", "13.IMD"))
    assert a != b                       # distinct images -> distinct IMDs
    assert find_imd("OMA_281_014_RGB", [str(tmp_path)]) is None
    # flat <name>.IMD still wins when present
    (tmp_path / "OMA_281_012_RGB.IMD").write_text("meanSunAz = 1;")
    flat = find_imd("OMA_281_012_RGB", [str(tmp_path)])
    assert flat.endswith("OMA_281_012_RGB.IMD")


def test_rpc_text_roundtrip():
    rpc = _toy_rpc()
    from season_nerf_tpu.geometry.rpc import parse_rpc_file
    back = parse_rpc_file(_rpc_text(rpc))
    r0, c0 = rpc.project(39.001, -84.001, 230.0)
    r1, c1 = back.project(39.001, -84.001, 230.0)
    np.testing.assert_allclose([r0, c0], [r1, c1], rtol=1e-9)


def test_preprocess_site_pipeline(fake_site):
    site = preprocess_site(
        fake_site["root"], fake_site["site"], fake_site["rpc_dir"],
        fake_site["cache"], gt_dir=fake_site["gt"],
        skip_bundle_adjust=True, cache=True)
    assert len(site.cameras) == 3
    cam = site.cameras[0]
    assert cam.scaled and cam.image is not None
    # fitted approximation is sub-pixel on this smooth synthetic RPC
    assert site.accuracy["mean_px"] < 1.0
    # sun vector points up in the cube frame
    assert cam.sun_vec[2] > 0.5
    assert 0.0 <= cam.time_frac <= 1.0
    # bounds sane: lat/lon ordered, heights from the DSM +-5
    b = site.bounds_lla
    assert b[0, 0] < b[0, 1] and b[1, 0] < b[1, 1]
    assert b[2, 0] < 210 and b[2, 1] > 225
    # rays from scaled cameras stay near the cube
    img_pts, tops, bots, valid = cam.pixel_rays(downscale=64)
    assert valid.any()


def test_gt_dsm_loader(fake_site):
    from season_nerf_tpu.data.lidar import get_gt_dsm
    bounds = np.array([[38.9985, 39.0015], [-84.0015, -83.9985],
                       [205.0, 235.0]])
    gt = get_gt_dsm(fake_site["gt"], fake_site["site"], (32, 32), bounds)
    assert gt.shape == (32, 32)
    ok = np.isfinite(gt)
    assert ok.any()
    assert (gt[ok] >= -1.5).all() and (gt[ok] <= 1.5).all()


def test_w2c_w2l_roundtrip(fake_site, tmp_path):
    site = preprocess_site(
        fake_site["root"], fake_site["site"], fake_site["rpc_dir"],
        fake_site["cache"], gt_dir=fake_site["gt"],
        skip_bundle_adjust=True, cache=False)
    p = str(tmp_path / "W2C_W2L_H.npy")
    save_w2c_w2l(p, site)
    wc, S, h_range = load_w2c_w2l(p)
    assert wc.shape == (3,)
    assert S.shape == (4, 4)
    # the artifact carries the site height range (meters) for deployment
    assert h_range == tuple(site.bounds_lla[2])

    # legacy 2-element artifacts (reference layout, pre-h_range runs) load
    # with h_range None
    legacy = np.empty(2, object)
    legacy[0], legacy[1] = wc, S
    lp = str(tmp_path / "legacy.npy")
    np.save(lp, legacy, allow_pickle=True)
    wc2, S2, h2 = load_w2c_w2l(lp)
    assert h2 is None and wc2.shape == (3,) and S2.shape == (4, 4)
