"""Test harness configuration.

Tests run on a *virtual 8-device CPU mesh* — the standard JAX substitute for
multi-chip TPU hardware (see SURVEY.md §4).  The env vars must be set before
jax is imported anywhere, hence this conftest sets them at collection time.
"""

import os
import sys

# Force CPU even when the surrounding environment selects a TPU platform
# (e.g. JAX_PLATFORMS=axon): unit tests must run on the virtual CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Site hooks (sitecustomize) may re-register a TPU platform *after* env vars
# are read, via jax.config.update("jax_platforms", ...).  Re-force CPU here:
# conftest runs before any test module imports jax-dependent code.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


import contextlib  # noqa: E402

import pytest  # noqa: E402

REFERENCE_DIR = "/root/reference"


# Top-level module names belonging to the reference tree, plus the dep names
# tests stub out to import it.  Only these are restored by the sandbox —
# a blanket sys.modules restore would evict and force re-import of live
# jax-backed modules (season_nerf_tpu.*), which segfaults CPython.
_REF_SANDBOX_TOPLEVEL = {
    "T_NeRF_Full_2", "T_NeRF_Eval_Utils", "pre_NeRF", "all_NeRF",
    "NN_loaders", "Space_Carving", "Generate_Summary_Images", "misc",
    "opt", "opt2", "main", "main_lite", "mg_pre_NeRF", "mg_run_NeRF",
    "mg_Pt_holder", "mg_get_DSM",
    # stubbed heavy deps
    "gdal", "sewar", "image_similarity_measures", "maxflow", "hsluv",
    "rpcm", "astropy", "robust_loss_pytorch", "tensorboard", "pyfftw",
}
_REF_SANDBOX_EXACT = {"scipy.spatial.kdtree"}


def _ref_sandboxed(key):
    return (key.split(".")[0] in _REF_SANDBOX_TOPLEVEL
            or key in _REF_SANDBOX_EXACT or key.startswith("ref_"))


@contextlib.contextmanager
def reference_import_sandbox():
    """Restore reference-related sys.modules entries (and sys.path) after
    reference imports.

    Tests that import the reference's code stub heavy deps into sys.modules
    (gdal, hsluv, …) and sometimes install bare package shells.  Left in
    place, those stubs poison LATER reference imports in the same process —
    the round-4 regression where the protocol-metrics fixture's bare
    `T_NeRF_Eval_Utils` shell made all 8 torch-parity tests skip in the
    full-suite run ("cannot import name 'load_t_nerf'").  Every reference-
    importing fixture/test must run inside this sandbox.
    """
    mod_snapshot = {k: v for k, v in sys.modules.items() if _ref_sandboxed(k)}
    path_snapshot = list(sys.path)
    try:
        yield
    finally:
        for k in [k for k in sys.modules if _ref_sandboxed(k)]:
            if k not in mod_snapshot:
                del sys.modules[k]
            elif sys.modules[k] is not mod_snapshot[k]:
                sys.modules[k] = mod_snapshot[k]
        sys.path[:] = path_snapshot


# ---- zero-skip guard for reference-oracle tests --------------------------
# On this host the reference tree and its import deps are available, so the
# oracle tests (torch parity, protocol metrics, reference-ckpt tools) are
# all runnable: a skip is a harness bug, not an environment limitation.
# Round 4 proved silent skips are invisible — make them fail the suite.
ORACLE_TEST_FILES = ("test_torch_parity.py", "test_reference_protocol_metrics.py",
                     "test_tools_cli.py")
_oracle_skips = []


def pytest_runtest_logreport(report):
    if report.skipped and any(f in report.nodeid for f in ORACLE_TEST_FILES):
        reason = ""
        if isinstance(report.longrepr, tuple):
            reason = report.longrepr[2]
        _oracle_skips.append(f"{report.nodeid}: {reason}")


def pytest_sessionfinish(session, exitstatus):
    if (_oracle_skips and os.path.isdir(REFERENCE_DIR)
            and not os.environ.get("SEASON_NERF_ALLOW_ORACLE_SKIPS")):
        tr = session.config.pluginmanager.get_plugin("terminalreporter")
        msg = ("reference-oracle tests skipped although /root/reference is "
               "present — this host can run them all (see tests/conftest.py):")
        lines = [msg] + [f"  {s}" for s in _oracle_skips]
        if tr is not None:
            tr.write_line("\nERROR: " + "\n".join(lines), red=True)
        session.exitstatus = 1


@pytest.fixture(scope="session")
def tiny_model_dir(tmp_path_factory):
    """A minimal self-describing model directory (opts.json +
    Final_Model.nn) that render/movie/serving tools can load."""
    import jax.numpy as jnp
    from season_nerf_tpu.config import Config
    from season_nerf_tpu.models.tnerf import model_from_config
    from season_nerf_tpu.train.state import save_model_artifact

    d = tmp_path_factory.mktemp("model_dir")
    cfg = Config(site_name="tiny", fc_units=32, fc_layers=2,
                 n_samples=16, chunk=4096)
    cfg.save_json(str(d / "opts.json"))
    model = model_from_config(cfg)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((2, 3)),
                           jnp.zeros((2, 3)), jnp.zeros((2, 4)), train=False)
    save_model_artifact(str(d / "Final_Model.nn"), variables["params"],
                        variables.get("batch_stats", {}), meta={})
    # synthetic-style world artifact: no world frame, but a height range —
    # exercises both the wc-None guard and meters-unit serving
    from season_nerf_tpu.data.ingest import save_world_artifact
    save_world_artifact(str(d / "W2C_W2L_H.npy"), None, None, (0.0, 30.0))
    return str(d)


# ---- fabricated DFC-format site (shared by real-branch e2e + tools) ------

_IMD_TEMPLATE = """meanSunAz = {az};
meanSunEl = {el};
meanOffNadirViewAngle = {off};
meanSatAz = {vaz};
firstLineTime = 2015-{mm:02d}-15T15:30:00.000000Z;
"""


def _toy_rpc(dlat, dlon, drow_per_m=0.0):
    from season_nerf_tpu.geometry.rpc import fit_rpc_from_projector
    lat0, lon0 = 39.0, -83.95   # away from the UTM zone edge

    def project(lat, lon, alt):
        row = (lat - lat0 - dlat) * 111_000 / 0.5 + 512 + alt * drow_per_m
        col = (lon - lon0 - dlon) * 85_000 / 0.5 + 512 + alt * 0.05
        return row, col

    return fit_rpc_from_projector(
        project, (lat0 - 0.004, lat0 + 0.004), (lon0 - 0.004, lon0 + 0.004),
        (200.0, 260.0))


def _rpc_text(rpc):
    lines = [f"LINE_OFF: {rpc.row_offset}", f"SAMP_OFF: {rpc.col_offset}",
             f"LAT_OFF: {rpc.lat_offset}", f"LONG_OFF: {rpc.lon_offset}",
             f"HEIGHT_OFF: {rpc.alt_offset}", f"LINE_SCALE: {rpc.row_scale}",
             f"SAMP_SCALE: {rpc.col_scale}", f"LAT_SCALE: {rpc.lat_scale}",
             f"LONG_SCALE: {rpc.lon_scale}", f"HEIGHT_SCALE: {rpc.alt_scale}"]
    for prefix, vec in [("LINE_NUM_COEFF", rpc.row_num),
                        ("LINE_DEN_COEFF", rpc.row_den),
                        ("SAMP_NUM_COEFF", rpc.col_num),
                        ("SAMP_DEN_COEFF", rpc.col_den)]:
        lines += [f"{prefix}_{i+1}: {v:.17e}" for i, v in enumerate(vec)]
    return "\n".join(lines)


@pytest.fixture(scope="session")
def dfc_site(tmp_path_factory):
    """A fabricated DFC-style site: GeoTIFF images + .ikono RPCs + IMD
    metadata + lidar DSM with UTM sidecar (see tests/test_real_branch_e2e.py
    for the e2e flows over it)."""
    import numpy as np
    from PIL import Image
    io_root = tmp_path_factory.mktemp("io")
    site = "OMA_777"
    imgs = io_root / "IEEE_Data" / "Images"
    truth = io_root / "IEEE_Data" / "Track3-Truth"
    cache = io_root / "Cache" / site
    rpcs = io_root / "Cache" / site / "RPCs"
    for d in (imgs, truth, cache, rpcs):
        d.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(3)
    offs = [(0, 0), (1.5e-5, -1e-5), (-1e-5, 1.5e-5), (2e-5, 2e-5)]
    for i, (dlat, dlon) in enumerate(offs):
        name = f"{site}_{i:03d}_RGB"
        arr = (rng.random((1024, 1024, 3)) * 255).astype(np.uint8)
        Image.fromarray(arr).save(imgs / f"{name}.tif")
        (cache / f"rpc_{name}_original.ikono").write_text(
            _rpc_text(_toy_rpc(dlat, dlon)))
        (rpcs / f"{name}.IMD").write_text(_IMD_TEMPLATE.format(
            az=150 + 10 * i, el=55 + 5 * i, off=8 + 3 * i, vaz=90 * i,
            mm=2 + 3 * i))
    dsm = (rng.random((64, 64)) * 20 + 210).astype(np.float32)
    Image.fromarray(dsm, mode="F").save(truth / f"{site}_DSM.tif")
    from season_nerf_tpu.geometry.units import wgs84_to_utm
    e, n, _, _ = wgs84_to_utm(39.0, -83.95)
    np.savetxt(truth / f"{site}_DSM.txt", [e - 320, n - 320, 64, 10.0])
    return str(io_root), site
