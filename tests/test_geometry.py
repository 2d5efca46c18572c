"""Geometry-core unit tests, mirroring the reference's inline self-checks
(SURVEY.md §4): RPC <-> projective round trips, accuracy tolerances, bounds
fitting, unit conversion sanity."""

import numpy as np
import pytest

from season_nerf_tpu.geometry import units, rpc, camera, time_enc, solar, spline


# --- helpers ---------------------------------------------------------------

def make_synthetic_rpc(seed=0, off_nadir_deg=15.0, az_deg=40.0):
    """Build an RPC by fitting the rational model to a synthetic projective
    camera over a small site (~500 m box near Omaha)."""
    lat0, lon0, h0 = 41.26, -95.93, 300.0
    dlat, dlon, dh = 0.004, 0.005, 100.0
    rng = np.random.default_rng(seed)

    # a plausible pushbroom-ish projective camera: scale lat/lon to pixels
    # with a parallax term in h controlled by the viewing angle
    px_per_lat = 512 / dlat
    px_per_lon = 512 / dlon
    tan_on = np.tan(np.deg2rad(off_nadir_deg))
    drdh = -tan_on * np.cos(np.deg2rad(az_deg)) * px_per_lat * dlat / 111_000 / dlat * 1.0
    dcdh = tan_on * np.sin(np.deg2rad(az_deg)) * px_per_lon * dlon / 90_000 / dlon * 1.0

    def project(lat, lon, h):
        r = (lat0 + dlat / 2 - lat) / dlat * 512 + drdh * (h - h0) * 512 / 111_000 * 5
        c = (lon - (lon0 - dlon / 2)) / dlon * 512 + dcdh * (h - h0) * 512 / 90_000 * 5
        return r, c

    model = rpc.fit_rpc_from_projector(
        project, (lat0 - dlat / 2, lat0 + dlat / 2),
        (lon0 - dlon / 2, lon0 + dlon / 2), (h0 - dh, h0 + dh))
    return model, project, (lat0, lon0, h0, dlat, dlon, dh)


# --- units -----------------------------------------------------------------

def test_haversine_known_distance():
    # one degree of latitude ~ 111.3 km at the equator with R=6378.137
    d = units.lat_lon_to_meters(0.0, 0.0, 1.0, 0.0)
    assert abs(d - 111_319) < 200


def test_lat_lon_shift_roundtrip():
    lat, lon = 41.26, -95.93
    lat2, lon2 = units.lat_lon_shift(lat, lon, 500.0, -300.0)
    d_north = units.lat_lon_to_meters(lat, lon, lat2, lon)
    d_east = units.lat_lon_to_meters(lat, lon, lat, lon2)
    assert abs(d_north - 500) < 1.0
    assert abs(d_east - 300) < 1.0


def test_world_angle_2_local_vec_up():
    bounds = np.array([[41.0, 41.004], [-95.005, -95.0], [250.0, 350.0]])
    S = units.make_similarity(bounds, np.array([[-1.0, 1], [-1, 1], [-1, 1]]))
    v = units.world_angle_2_local_vec(90.0, 0.0, np.mean(bounds, 1), S)
    assert np.allclose(np.linalg.norm(v), 1.0)
    assert v[2] > 0.999  # straight up


def test_world_angle_roundtrip():
    bounds = np.array([[41.0, 41.01], [-95.01, -95.0], [0.0, 100.0]])
    S = units.make_similarity(bounds, np.array([[-1.0, 1], [-1, 1], [-1, 1]]))
    center = np.mean(bounds, 1)
    for el, az in [(45, 30), (70, 200), (30, -60)]:
        v = units.world_angle_2_local_vec(el, az, center, S)
        el2, az2 = units.local_vec_2_world_angle(v, center, np.linalg.inv(S))
        assert abs(el - el2) < 1.0
        assert abs((az - az2 + 180) % 360 - 180) < 1.0


def test_wgs84_to_utm_zone():
    e, n, zone, letter = units.wgs84_to_utm(41.26, -95.93)
    assert zone == 15 and letter == "T"
    assert 100_000 < e < 900_000 and 4_000_000 < n < 5_000_000


# --- RPC -------------------------------------------------------------------

def test_rpc_fit_and_project():
    model, project, (lat0, lon0, h0, dlat, dlon, dh) = make_synthetic_rpc()
    rng = np.random.default_rng(1)
    lat = lat0 + (rng.random(200) - 0.5) * dlat
    lon = lon0 + (rng.random(200) - 0.5) * dlon
    h = h0 + (rng.random(200) - 0.5) * 2 * dh
    r_gt, c_gt = project(lat, lon, h)
    r, c = model.project(lat, lon, h)
    assert np.max(np.abs(r - r_gt)) < 1e-3
    assert np.max(np.abs(c - c_gt)) < 1e-3


def test_rpc_localize_roundtrip():
    model, _, (lat0, lon0, h0, dlat, dlon, dh) = make_synthetic_rpc()
    rows = np.array([10.0, 100.0, 400.0, 256.0])
    cols = np.array([20.0, 300.0, 40.0, 256.0])
    alts = np.array([h0 - 50, h0, h0 + 50, h0 + 80])
    lat, lon, h = model.localize(rows, cols, alts)
    r2, c2 = model.project(lat, lon, h)
    assert np.max(np.abs(r2 - rows)) < 1e-6
    assert np.max(np.abs(c2 - cols)) < 1e-6


def test_rpc_parse_rpb_text():
    model, *_ = make_synthetic_rpc()
    # serialize to an RPB-ish text and re-parse
    def fmt_vec(name, v):
        return f"{name} = ({', '.join(str(x) for x in v)});"
    text = "\n".join([
        f"lineOffset = {model.row_offset};", f"lineScale = {model.row_scale};",
        f"sampOffset = {model.col_offset};", f"sampScale = {model.col_scale};",
        f"latOffset = {model.lat_offset};", f"latScale = {model.lat_scale};",
        f"longOffset = {model.lon_offset};", f"longScale = {model.lon_scale};",
        f"heightOffset = {model.alt_offset};", f"heightScale = {model.alt_scale};",
        fmt_vec("lineNumCoef", model.row_num), fmt_vec("lineDenCoef", model.row_den),
        fmt_vec("sampNumCoef", model.col_num), fmt_vec("sampDenCoef", model.col_den),
    ])
    m2 = rpc.parse_rpc_file(text)
    r1, c1 = model.project(41.26, -95.93, 310.0)
    r2, c2 = m2.project(41.26, -95.93, 310.0)
    assert abs(r1 - r2) < 1e-9 and abs(c1 - c2) < 1e-9


def test_rpc_monomial_order_matches_spec():
    """Pin the RPC00B term order against an independent spec transcription.

    The standard cubic-polynomial term order (STDI-0002; GDAL RPCEvaluate;
    what rpcm evaluates for the reference at mg_Sat_Img.py:108-118) written
    out longhand.  The in-repo round-trip tests cannot catch an order bug —
    fit and evaluate share the monomial table — so this oracle is coded
    independently of geometry/rpc.py.
    """
    rng = np.random.default_rng(7)
    P, L, H = rng.uniform(-1, 1, (3, 64))  # normalized lat, lon, alt

    def spec_poly(c, P, L, H):
        return (c[0]
                + c[1] * L + c[2] * P + c[3] * H
                + c[4] * L * P + c[5] * L * H + c[6] * P * H
                + c[7] * L * L + c[8] * P * P + c[9] * H * H
                + c[10] * P * L * H
                + c[11] * L * L * L
                + c[12] * L * P * P + c[13] * L * H * H
                + c[14] * L * L * P
                + c[15] * P * P * P
                + c[16] * P * H * H
                + c[17] * L * L * H + c[18] * P * P * H
                + c[19] * H * H * H)

    coefs = rng.normal(size=20)
    M = rpc.monomials(P, L, H)
    np.testing.assert_allclose(M @ coefs, spec_poly(coefs, P, L, H),
                               rtol=0, atol=1e-12)


# --- projective camera -----------------------------------------------------

def test_projective_fit_accuracy_vs_rpc():
    """Mirror of the reference's test_accuracy tolerance check (P_Img.py:373)."""
    model, _, (lat0, lon0, h0, dlat, dlon, dh) = make_synthetic_rpc()
    cam = camera.fit_camera_from_rpc(model, (512, 512), h0 - dh, h0 + dh)
    mean_err, std_err, min_err, max_err = camera.test_accuracy(cam, h0 - dh, h0 + dh)
    assert mean_err < 0.5, f"projective approx too coarse: {mean_err}px"


def test_backproject_roundtrip():
    model, _, (lat0, lon0, h0, dlat, dlon, dh) = make_synthetic_rpc()
    cam = camera.fit_camera_from_rpc(model, (512, 512), h0 - dh, h0 + dh)
    bounds = np.array([[lat0 - dlat / 2, lat0 + dlat / 2],
                       [lon0 - dlon / 2, lon0 + dlon / 2],
                       [h0 - dh, h0 + dh]])
    cam = cam.scale(bounds)
    rows = np.array([0.0, 128, 256, 511])
    cols = np.array([0.0, 400, 50, 511])
    x, y, h = cam.backproject(rows, cols, 0.35)
    r2, c2 = cam.project(x, y, h)
    assert np.max(np.abs(r2 - rows)) < 1e-6
    assert np.max(np.abs(c2 - cols)) < 1e-6


def test_pixel_rays_vectorized():
    model, _, (lat0, lon0, h0, dlat, dlon, dh) = make_synthetic_rpc()
    cam = camera.fit_camera_from_rpc(model, (512, 512), h0 - dh, h0 + dh)
    bounds = np.array([[lat0 - dlat / 2, lat0 + dlat / 2],
                       [lon0 - dlon / 2, lon0 + dlon / 2],
                       [h0 - dh, h0 + dh]])
    cam = cam.scale(bounds)
    img_pts, tops, bots, valid = cam.pixel_rays(downscale=8)
    assert img_pts.shape == (64 * 64, 2)
    assert tops.shape == (64 * 64, 3) and bots.shape == (64 * 64, 3)
    assert np.all(tops[:, 2] == 1.0) and np.all(bots[:, 2] == -1.0)
    assert valid.sum() > 0
    # view directions should be unit-normalizable and pointing downward
    v = bots[valid] - tops[valid]
    assert np.all(v[:, 2] < 0)


def test_find_bounds_inside_all_images():
    model, _, (lat0, lon0, h0, dlat, dlon, dh) = make_synthetic_rpc()
    model2, _, _ = make_synthetic_rpc(seed=3, off_nadir_deg=25.0, az_deg=200.0)
    cams = [camera.fit_camera_from_rpc(m, (512, 512), h0 - dh, h0 + dh)
            for m in (model, model2)]
    bounds = camera.find_bounds(cams, (h0 - dh, h0 + dh))
    assert bounds[0, 0] < bounds[0, 1]
    assert bounds[1, 0] < bounds[1, 1]
    # corners project inside every image
    for cam in cams:
        for h in (bounds[2, 0], bounds[2, 1]):
            lats = bounds[0, [0, 0, 1, 1]]
            lons = bounds[1, [0, 1, 0, 1]]
            r, c = cam.rpc.project(lats, lons, np.full(4, h))
            assert np.all(r >= -1) and np.all(r <= 512)
            assert np.all(c >= -1) and np.all(c <= 512)


# --- time + solar ----------------------------------------------------------

def test_capture_time_parse_and_encode():
    t = time_enc.CaptureTime.parse("2014-10-05T16:01:38.873575Z")
    assert t.year == 2014 and t.month == 10 and t.day == 5
    assert 0.75 < t.year_frac < 0.78
    assert 0.66 < t.day_frac < 0.68
    e = t.encode()
    assert e.shape == (4,)
    assert np.allclose(e[0] ** 2 + e[1] ** 2, 1.0)


def test_solar_position_sanity():
    # solar noon in Omaha in late June: sun high in the south
    el, az = solar.solar_el_az_utc(41.26, -95.93, 2015, 6, 21, 18, 30)
    assert el > 65, f"midsummer noon sun should be high, got {el}"
    assert 120 < az < 240
    # midnight: sun below horizon
    el2, _ = solar.solar_el_az_utc(41.26, -95.93, 2015, 6, 21, 6, 0)
    assert el2 < 0 or el2 < el  # 6:00 UTC ~ 1 am local
    el3, _ = solar.solar_el_az_utc(41.26, -95.93, 2015, 12, 21, 18, 30)
    assert el3 < el - 30  # winter sun much lower


def test_solar_position_vs_reference_values():
    # Omaha (41.26N, 95.93W), 2014-10-05 16:01:38 UTC (= 11:01 CDT).
    # Hand-derived via spherical trig with decl=-4.9deg, EoT=+11.5min:
    # el ~= 35.0 deg, az ~= 138.8 deg (sun in the SE, late morning).
    el, az = solar.solar_el_az_utc(41.26, -95.93, 2014, 10, 5, 16, 1, 38.0)
    assert abs(el - 35.0) < 0.7
    assert abs(az - 138.8) < 1.5


# --- spline ----------------------------------------------------------------

def test_spline_interpolates_keyframes():
    pts = np.array([[0, 0, 0], [1, 2, 0], [3, 1, 1], [4, 4, 0.0]])
    sp = spline.Spline3(pts)
    assert np.allclose(sp.at(0.0), pts[0], atol=1e-9)
    assert np.allclose(sp.at(1.0), pts[-1], atol=1e-9)
    assert np.allclose(sp.at(1 / 3), pts[1], atol=1e-9)


def test_spline_constant_speed():
    # unevenly spaced keyframes along a smooth arc
    t = np.array([0.0, 0.05, 0.15, 0.6, 1.0]) * np.pi
    pts = np.stack([np.cos(t), np.sin(t), 0 * t], -1) * 3
    sp = spline.Spline3(pts)
    ss = np.linspace(0, 1, 21)
    xs = np.stack([sp.at_arc(s) for s in ss])
    seg = np.sqrt(np.sum(np.diff(xs, axis=0) ** 2, axis=1))
    assert np.std(seg) / np.mean(seg) < 0.05  # near-constant speed
