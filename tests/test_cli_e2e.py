"""End-to-end CLI pipeline test: train a tiny synthetic site through
run_test, verify every artifact the reference contract promises, then
render a novel view from the saved model directory, build a movie, and run
the report/summary-figure writers."""

import os

import numpy as np
import pytest

from season_nerf_tpu.config import Config
from season_nerf_tpu import cli


@pytest.fixture(scope="module")
def trained_dir(tmp_path_factory):
    logs = str(tmp_path_factory.mktemp("exp"))
    cfg = Config(site_name="SYNTH_TEST", exp_name="synth_e2e",
                 max_train_steps=10, n_samples=8, batch_size=64,
                 fc_units=32, chunk=2048, n_saves=2, testing_size=2,
                 logs_dir=logs, IO_Location=str(tmp_path_factory.mktemp("io")))
    cfg.resolve_dirs()
    cfg.logs_dir = logs   # keep the temp dir
    cfg.save_json()
    trainer, analysis = cli.run_test(cfg, eval_img_size=(12, 12),
                                     eval_season_size=(8, 8))
    return cfg, logs, analysis, trainer


def test_artifacts_exist(trained_dir):
    cfg, logs, analysis, _trainer = trained_dir
    assert os.path.exists(os.path.join(logs, "Final_Model.nn"))
    assert os.path.exists(os.path.join(logs, "opts.json"))
    assert os.path.exists(os.path.join(logs, "Analysis.pickle"))
    out = os.path.join(logs, "Output")
    assert os.path.exists(os.path.join(out, "Image_scores.txt"))
    assert os.path.exists(os.path.join(out, "Time_Walk.gif"))
    # per-test-image comparison figures (load.py:485-500 contract)
    import glob as _glob
    comps = _glob.glob(os.path.join(out, "*_comparison.png"))
    assert len(comps) == 2, comps    # one per testing camera
    detailed = os.path.join(logs, "Detailed_Output")
    for f in ("HM_Summary.pickle", "Img_Summary.pickle",
              "Shadow_Scores_Summary.pickle", "Season_Summary.pickle",
              "Image_scores.txt", "Shadow_scores.txt", "Season_scores.txt",
              "Data_Sat_and_Sun_pose.png"):
        assert os.path.exists(os.path.join(detailed, f)), f


def test_cli_builds_mesh(trained_dir):
    """The production CLI path must train data-parallel whenever more than
    one device is visible (conftest forces a virtual 8-device CPU mesh)."""
    import jax
    cfg, logs, analysis, trainer = trained_dir
    assert trainer is not None and trainer.mesh is not None
    assert trainer.mesh.devices.size == len(jax.devices())
    # the ray table was eagerly replicated over that mesh
    rows = trainer.train_ds.rows
    assert len(rows.sharding.device_set) == len(jax.devices())


def test_analysis_contents(trained_dir):
    cfg, logs, analysis, _trainer = trained_dir
    assert "HM" in analysis and "Images" in analysis
    assert np.isfinite(analysis["HM"]["After"]["RMSE"])
    assert len(analysis["Images"]) == 2    # testing_size cameras


def test_render_pretrained(trained_dir):
    cfg, logs, analysis, _trainer = trained_dir
    shown, imgs = cli.render_pretrained(logs, (70, 30), (45, 180), "07/19",
                                        out_size=12)
    assert shown.shape == (12, 12, 3)
    assert np.isfinite(shown).all()
    # MM/DD parse and fraction parse agree
    shown2, _ = cli.render_pretrained(logs, (70, 30), (45, 180), "0.55",
                                      out_size=8)
    assert shown2.shape == (8, 8, 3)


def test_eval_only_reload(trained_dir):
    cfg, logs, analysis, _trainer = trained_dir
    trainer, analysis2 = cli.run_test(cfg, eval_only=True,
                                      eval_img_size=(8, 8),
                                      eval_season_size=(8, 8))
    assert trainer is None
    assert "Images" in analysis2


def test_multi_region_merge(trained_dir, tmp_path):
    cfg, logs, analysis, _trainer = trained_dir
    from season_nerf_tpu.eval.regional import multi_region_merge
    merged = multi_region_merge([os.path.join(logs, "Detailed_Output")],
                                str(tmp_path / "Full_Summary"))
    assert merged["HM"] or merged["Images"]
    assert os.path.exists(tmp_path / "Full_Summary" / "Merged_Results.pickle")


def test_movie_and_summary_figs(trained_dir, tmp_path):
    cfg, logs, analysis, _trainer = trained_dir
    import jax
    import jax.numpy as jnp
    from season_nerf_tpu.models.tnerf import TNeRF
    from season_nerf_tpu.train.state import restore_variables
    from season_nerf_tpu.render.renderer import Renderer
    from season_nerf_tpu.render.movie import MovieScript, render_movie, \
        export_film
    from season_nerf_tpu.eval.summary_images import season_sun_grid

    model = TNeRF(layer_width=cfg.fc_units, n_layers=cfg.fc_layers,
                  n_classes=cfg.number_low_frequency_cases)
    template = model.init(jax.random.PRNGKey(0), jnp.zeros((2, 3)),
                          jnp.zeros((2, 3)), jnp.zeros((2, 4)), train=False)
    variables, _ = restore_variables(
        template, os.path.join(logs, "Final_Model.nn"))
    r = Renderer(model, variables, n_samples=8, chunk=2048)

    script = (MovieScript()
              .add((90, 0), (45, 90), 0.1)
              .add((70, 120), (50, 180), 0.5)
              .add((80, 240), (40, 270), 0.9))
    frames = render_movie(r, script, n_frames=4, out_size=8)
    assert frames.shape == (4, 8, 8, 3) and frames.dtype == np.uint8
    # the 2-stage frame pipeline (default) is bit-identical to the serial
    # loop — overlap changes scheduling, never math
    frames_serial = render_movie(r, script, n_frames=4, out_size=8,
                                 pipeline=1)
    np.testing.assert_array_equal(frames, frames_serial)
    path = export_film(frames, str(tmp_path / "movie.gif"), fps=4)
    assert os.path.exists(path)

    grid_path = season_sun_grid(
        r, [0.1, 0.6], [(40, 160), (60, 200)], (90, 0), 8,
        str(tmp_path / "grid.png"))
    assert os.path.exists(grid_path)

    # 6-DoF free-camera orbit through the projective path
    # (mg_movie_maker.py:209-461 / sample_rays_projective:52-70 parity)
    pose_script = (
        MovieScript()
        .add(None, (45, 90), 0.2, cam_pose=(-0.8, 0.0, 0.6, 25, 0, 60))
        .add(None, (50, 180), 0.5, cam_pose=(0.0, 0.8, 0.7, 30, 90, 55))
        .add(None, (40, 270), 0.8, cam_pose=(0.8, 0.0, 0.6, 25, 180, 60)))
    assert pose_script.six_dof
    frames6 = render_movie(r, pose_script, n_frames=3, out_size=8)
    assert frames6.shape == (3, 8, 8, 3) and frames6.dtype == np.uint8
    # mixing pose and direction keyframes is rejected
    bad = MovieScript().add((90, 0), (45, 90), 0.1).add(
        None, (45, 90), 0.2, cam_pose=(0, 0, 0.5, 20, 0, 60))
    with pytest.raises(ValueError):
        bad.sample(2)


def test_val_renders_at_save_points(trained_dir):
    """Save points must render validation images (eval_img cadence,
    mg_run_NeRF.py:148-227): Testing/Mean_PSNR appears at a step *before*
    the end of training."""
    import json
    cfg, logs, analysis, _trainer = trained_dir
    steps = [json.loads(l)["step"]
             for l in open(os.path.join(logs, "metrics.jsonl"))
             if json.loads(l)["tag"] == "Testing/Mean_PSNR"]
    assert steps, "no validation renders logged"
    assert min(steps) < cfg.max_train_steps


def test_hsluv_e2e(tmp_path):
    """use_HSLuv=True trains on HSLuv-encoded targets; every rendered/eval
    color must be converted back to sRGB (the reference scores HSLuv renders
    against RGB truth — a bug we deliberately do not match)."""
    logs = str(tmp_path / "hsluv_exp")
    os.makedirs(logs, exist_ok=True)
    cfg = Config(site_name="SYNTH_HSLUV", exp_name="hsluv_e2e",
                 max_train_steps=6, n_samples=8, batch_size=64,
                 fc_units=32, chunk=2048, n_saves=0, testing_size=2,
                 use_HSLuv=True, logs_dir=logs,
                 IO_Location=str(tmp_path / "io"))
    cfg.resolve_dirs()
    cfg.logs_dir = logs
    cfg.save_json()
    trainer, analysis = cli.run_test(cfg, eval_img_size=(8, 8),
                                     eval_season_size=(8, 8))
    # training targets really are HSLuv rows (encode differs from RGB)...
    gt_rows = trainer.train_ds.table.rows[:, 19:22]
    from season_nerf_tpu.utils.hsluv import hsluv_normalized_to_rgb
    assert not np.allclose(gt_rows, hsluv_normalized_to_rgb(gt_rows),
                           atol=0.05)
    # ...but validation images come back in sRGB
    rend, gt, _h, seen = trainer.render_table_image(trainer.val_table, 0)
    assert np.isfinite(rend[seen]).all()
    assert rend.min() >= 0.0 and rend.max() <= 1.0
    # renders through the saved model dir are sRGB as well
    shown, imgs = cli.render_pretrained(logs, (70, 30), (45, 180), "07/19",
                                        out_size=8)
    assert np.isfinite(shown).all()
    assert np.nanmin(shown) >= 0.0 and np.nanmax(shown) <= 1.0 + 1e-6


def test_setup_data_unzip(tmp_path):
    import zipfile
    zdir = tmp_path / "zips"
    zdir.mkdir()
    with zipfile.ZipFile(zdir / "Track3.zip", "w") as z:
        z.writestr("Track3-RGB/OMA_000_RGB.tif", b"fake")
        z.writestr("Track3-RGB/readme.md", b"skip me")
    with zipfile.ZipFile(zdir / "Data.zip", "w") as z:
        z.writestr("Data/OMA_132/rpc_x_original.ikono", b"rpc")
    out = cli.setup_data(str(zdir), str(tmp_path / "io"))
    assert os.path.exists(os.path.join(out, "OMA_000_RGB.tif"))
    assert os.path.exists(
        tmp_path / "io" / "Cache" / "OMA_132" / "rpc_x_original.ikono")


def test_area_overviews(trained_dir, tmp_path):
    cfg, logs, analysis, _trainer = trained_dir
    from season_nerf_tpu.eval.regional import area_overviews
    out = area_overviews([logs], str(tmp_path / "overview.png"), out_size=8)
    assert os.path.exists(out)


def test_lite_defaults_match_reference():
    """main_lite.py defaults (reference main_lite.py:63-78): 5000 steps,
    3x lr, 10 saves, 4x/8x image downscales."""
    from season_nerf_tpu.config import lite_defaults
    cfg = lite_defaults()
    assert cfg.max_train_steps == 5000
    assert abs(cfg.lr - 3 * 10 ** -4.86) < 1e-9
    assert cfg.n_saves == 10
    assert cfg.img_training_downscale == 4
    assert cfg.img_validation_downscale == 8
    assert cfg.site_name == "OMA_281" and cfg.exp_name == "OMA_281_Lite"


def test_select_best_geometry_cli(trained_dir):
    """The post-hoc geometry-best study tool runs against a completed
    synthetic run dir and ranks its save points (tools/select_best_geometry)."""
    import json
    import subprocess
    import sys
    cfg, logs, _analysis, _trainer = trained_dir
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    # drop PYTHONPATH so the axon site hook can't re-force the TPU platform
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["JAX_PLATFORMS"] = "cpu"
    res = subprocess.run(
        [sys.executable, os.path.join(repo, "tools", "select_best_geometry.py"),
         logs, "--skip-full-eval"],
        capture_output=True, text=True, timeout=900, env=env)
    assert res.returncode == 0, res.stderr
    json_rows = [json.loads(ln) for ln in res.stdout.splitlines()
                 if ln.startswith("{")]
    assert json_rows, res.stdout
    assert all("step" in r and "prior_mae" in r for r in json_rows)
    assert "selected (argmin prior-DSM MAE)" in res.stdout
