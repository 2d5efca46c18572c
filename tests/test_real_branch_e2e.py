"""End-to-end run_test through the REAL-data branch: a fabricated DFC-style
site (GeoTIFF images + .ikono RPCs + IMD metadata + lidar DSM with UTM
sidecar) flows through preprocess -> ray tables -> training -> eval, and the
model dir renders via the saved W2C_W2L_H transform."""

import os

import numpy as np
import pytest

from season_nerf_tpu.config import Config
from season_nerf_tpu import cli


# dfc_site fixture + RPC/IMD fabrication helpers live in conftest.py


def test_run_test_real_branch(dfc_site):
    io_root, site = dfc_site
    cfg = Config(site_name=site, exp_name=f"{site}_e2e",
                 IO_Location=io_root, max_train_steps=6, n_samples=8,
                 batch_size=64, fc_units=32, chunk=2048, n_saves=0,
                 testing_size=1, jump_start=False,
                 img_training_downscale=16, skip_Bundle_Adjust=True)
    cfg.resolve_dirs()
    cfg.save_json()
    trainer, analysis = cli.run_test(cfg, eval_img_size=(10, 10),
                                     eval_season_size=(8, 8))
    logs = cfg.logs_dir
    assert os.path.exists(os.path.join(logs, "Final_Model.nn"))
    assert os.path.exists(os.path.join(logs, "W2C_W2L_H.npy"))
    assert "HM" in analysis       # lidar GT DSM flowed through
    assert np.isfinite(analysis["HM"]["After"]["RMSE"])
    # render through the saved world transform
    shown, imgs = cli.render_pretrained(logs, (75, 120), (50, 170), "06/15",
                                        out_size=8)
    assert np.isfinite(shown).all()


def test_space_carve_prior_real_branch(dfc_site):
    """The Space_Carve prior path on real-branch cameras (tiny grid)."""
    io_root, site = dfc_site
    from season_nerf_tpu.data.ingest import preprocess_site
    from season_nerf_tpu.priors.space_carving import space_carve_dsm
    s = preprocess_site(os.path.join(io_root, "IEEE_Data"), site,
                        os.path.join(io_root, "Cache", site, "RPCs"),
                        os.path.join(io_root, "Cache", site),
                        gt_dir=os.path.join(io_root, "IEEE_Data",
                                            "Track3-Truth"),
                        skip_bundle_adjust=True, cache=False)
    hm = space_carve_dsm(s.cameras, [c.image for c in s.cameras],
                         grid_size=(8, 8, 6), patch=3)
    assert hm.shape == (8, 8)
    assert np.isfinite(hm).all()
    assert (hm >= -1).all() and (hm <= 1).all()


def test_typod_testing_image_names_raises(dfc_site):
    """A nonexistent --testing_image_names must fail loudly, not silently
    fall back to another split (evaluation leakage)."""
    io_root, site = dfc_site
    cfg = Config(site_name=site, exp_name=f"{site}_typo", IO_Location=io_root,
                 testing_image_names=os.path.join(io_root, "nope.txt"))
    cfg.resolve_dirs()
    with pytest.raises(FileNotFoundError, match="testing_image_names"):
        cli._prepare_real(cfg)


def test_missing_truth_needs_height_range(dfc_site, tmp_path):
    """Without Track3-Truth the run must either get --height_range or fail
    with a clear error; with the flag, preprocessing proceeds GT-less."""
    io_root, site = dfc_site
    import shutil
    # clone the site layout minus the truth dir
    root2 = tmp_path / "io2"
    shutil.copytree(os.path.join(io_root, "IEEE_Data"),
                    root2 / "IEEE_Data")
    shutil.copytree(os.path.join(io_root, "Cache"), root2 / "Cache")
    shutil.rmtree(root2 / "IEEE_Data" / "Track3-Truth")
    cfg = Config(site_name=site, exp_name=f"{site}_nogt",
                 IO_Location=str(root2), skip_Bundle_Adjust=True,
                 img_training_downscale=16, img_validation_downscale=16,
                 testing_size=1, jump_start=False)
    cfg.resolve_dirs()
    with pytest.raises(FileNotFoundError, match="height_range"):
        cli._prepare_real(cfg)
    cfg.height_range = (200.0, 260.0)
    prep = cli._prepare_real(cfg)
    cams, table = prep[0], prep[1]
    assert len(cams) == 4 and len(table) > 0
    assert prep[5] is None              # gt_dsm absent, run still prepared


def test_split_files_written(dfc_site):
    io_root, site = dfc_site
    logs = os.path.join(io_root, "Logs", f"{site}_e2e")
    assert os.path.exists(os.path.join(logs, "Training_Imgs.txt"))
    with open(os.path.join(logs, "Testing_Imgs.txt")) as f:
        names = [l for l in f.read().split("\n") if l]
    assert len(names) == 1 and names[0].startswith(site)
