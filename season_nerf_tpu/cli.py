"""Command-line drivers: the reference's five entry points, TPU-native.

- ``run_test``       == main.py:34-104 (preprocess -> train -> eval)
- ``run_lite``       == main_lite.py (quick-train defaults)
- ``render_pretrained`` == main_run_Season_NeRF.py (novel view from a saved
  model directory: Final_Model.nn + opts.json + W2C_W2L_H.npy)
- ``setup_data``     == main_setup_data.py (unzip DFC2019 + Data.zip)
- ``eval_region``    == main_eval_region.py (regional eval + merge)

Sites named ``SYNTH*`` run on the built-in synthetic scene generator so the
entire pipeline exercises end-to-end without the (non-redistributable)
DFC2019 imagery.
"""

from __future__ import annotations

import os
import zipfile
from typing import Optional, Tuple

import numpy as np

from season_nerf_tpu.config import Config, get_opts, lite_defaults


# thin geometry closures; canonical home is geometry/units (render surfaces
# import them from there without pulling in the CLI layer)
from season_nerf_tpu.geometry.units import (       # noqa: F401
    angles_to_vec_from_site, sun_frame_from_site)


def _prepare_synthetic(cfg: Config):
    from season_nerf_tpu.data.synthetic import make_scene
    from season_nerf_tpu.data.rays import build_ray_table, train_test_split
    from season_nerf_tpu.data.rays import camera_weights
    scene = make_scene(n_views=cfg.synth_views, img_size=cfg.synth_img_size,
                       grid=cfg.synth_grid, seed=cfg.seed)
    weights = (camera_weights(scene.cameras)
               if cfg.weight_training_samples else None)
    table = build_ray_table(scene.cameras, scene.images, weights=weights,
                            use_hsluv=cfg.use_HSLuv)
    train_idx, test_idx = train_test_split(len(scene.cameras),
                                           testing_size=cfg.testing_size)
    if cfg.logs_dir:
        from season_nerf_tpu.data.ingest import save_world_artifact
        names = [c.name for c in scene.cameras]
        with open(os.path.join(cfg.logs_dir, "Training_Imgs.txt"), "w") as f:
            f.write("\n".join(names[i] for i in train_idx))
        with open(os.path.join(cfg.logs_dir, "Testing_Imgs.txt"), "w") as f:
            f.write("\n".join(names[i] for i in test_idx))
        # no world frame for a synthetic site, but the height range still
        # lets a deployed model dir serve height maps in meters
        save_world_artifact(os.path.join(cfg.logs_dir, "W2C_W2L_H.npy"),
                            None, None, (0.0, 30.0))
    return (scene.cameras, table, list(train_idx), list(test_idx),
            scene.prior_hm, scene.hm, (0.0, 30.0), None, None)


def _prepare_real(cfg: Config):
    from season_nerf_tpu.data.ingest import preprocess_site, save_w2c_w2l, \
        world_transform
    from season_nerf_tpu.data.rays import build_ray_table, train_test_split
    from season_nerf_tpu.data.lidar import get_gt_dsm
    from season_nerf_tpu.priors.space_carving import space_carve_dsm, \
        model_grid_from_bounds

    if cfg.testing_image_names and not os.path.exists(cfg.testing_image_names):
        # a typo'd path must not silently fall back to another split —
        # that trains on images the user meant to hold out
        raise FileNotFoundError(
            f"--testing_image_names {cfg.testing_image_names} not found")
    gt_dir = os.path.join(cfg.root_dir, "Track3-Truth")
    if not os.path.isdir(gt_dir):
        gt_dir = None
    h_override = tuple(cfg.height_range) if cfg.height_range else None
    if gt_dir is None and h_override is None:
        raise FileNotFoundError(
            f"{cfg.root_dir}/Track3-Truth not found: the site height range "
            "is derived from the lidar DSM. Either provide the Track3-Truth "
            "directory or pass an explicit --height_range MIN_M MAX_M "
            "(training then runs without GT evaluation).")
    site = preprocess_site(cfg.root_dir, cfg.site_name, cfg.rpc_dir,
                           cfg.cache_dir, gt_dir=gt_dir,
                           height_range=h_override,
                           skip_bundle_adjust=cfg.skip_Bundle_Adjust,
                           camera_model=cfg.camera_model)
    save_w2c_w2l(os.path.join(cfg.logs_dir, "W2C_W2L_H.npy"), site)
    wc, S = world_transform(site)

    testing_names = None
    t_file = os.path.join(cfg.cache_dir, "Testing_Imgs.txt")
    if cfg.testing_image_names:
        t_file = cfg.testing_image_names
    if os.path.exists(t_file):
        with open(t_file) as f:
            testing_names = [l.strip() for l in f if l.strip()]
    names = [c.name for c in site.cameras]
    train_idx, test_idx = train_test_split(
        len(site.cameras), testing_size=cfg.testing_size,
        testing_names=testing_names if testing_names else None,
        names=names)
    # persist the split (the Training_Imgs.txt / Testing_Imgs.txt artifact
    # contract, mg_Pt_holder.py:165-167)
    with open(os.path.join(cfg.logs_dir, "Training_Imgs.txt"), "w") as f:
        f.write("\n".join(names[i] for i in train_idx))
    with open(os.path.join(cfg.logs_dir, "Testing_Imgs.txt"), "w") as f:
        f.write("\n".join(names[i] for i in test_idx))

    from season_nerf_tpu.data.rays import camera_weights
    weights = (camera_weights(site.cameras)
               if cfg.weight_training_samples else None)
    # validation cameras render at their own downscale
    # (img_validation_downscale, mg_run_NeRF.py:74-82 val loader)
    test_set = set(test_idx)
    downscales = [cfg.img_validation_downscale if i in test_set
                  else cfg.img_training_downscale
                  for i in range(len(site.cameras))]
    # cache name carries the row-shaping settings so config changes can't
    # resurrect a stale table; the split digest covers the per-camera
    # downscale assignment (which depends on test_idx, not just the two
    # downscale ints — changing testing_size/testing_image_names must miss)
    import hashlib
    split_key = hashlib.sha1(
        ",".join(map(str, downscales)).encode()).hexdigest()[:8]
    cache_name = (f"ray_table_ds{cfg.img_training_downscale}"
                  f"_v{cfg.img_validation_downscale}"
                  f"{'_hsluv' if cfg.use_HSLuv else ''}"
                  f"{'_w' if cfg.weight_training_samples else ''}"
                  f"_s{split_key}.npz")
    table = build_ray_table(
        site.cameras, [c.image for c in site.cameras],
        downscales=downscales,
        weights=weights, use_hsluv=cfg.use_HSLuv,
        cache_path=os.path.join(cfg.cache_dir, cache_name))

    h_range = tuple(site.bounds_lla[2])
    gt_dsm = None
    if gt_dir is not None:
        grid = model_grid_from_bounds(site.bounds_lla)
        gt_dsm = get_gt_dsm(gt_dir, cfg.site_name, grid[:2],
                            site.bounds_lla)
    prior = None
    if cfg.jump_start and cfg.DSM_Mode == "Space_Carve":
        train_cams = [site.cameras[i] for i in train_idx]
        prior = space_carve_dsm(
            train_cams, [c.image for c in train_cams],
            bounds_lla=site.bounds_lla,
            cache_path=os.path.join(cfg.cache_dir,
                                    f"SC_{cfg.site_name}_hm.npy"))
    elif cfg.jump_start and cfg.DSM_Mode == "LiDAR":
        prior = gt_dsm
    return (site.cameras, table, list(train_idx), list(test_idx), prior,
            gt_dsm, h_range, wc, S)


def run_test(cfg: Config, eval_only: bool = False, train_steps=None,
             eval_img_size=None, eval_season_size=None):
    """The main.py:34-104 pipeline.  The eval size overrides exist for tiny
    smoke configurations; None uses the reference's quick sizes."""
    from season_nerf_tpu.train.engine import Trainer
    from season_nerf_tpu.train import state as state_lib
    from season_nerf_tpu.render.renderer import Renderer
    from season_nerf_tpu.eval.regional import (
        analyze_model, write_analysis_outputs, regional_eval)
    import jax
    import jax.numpy as jnp

    synth = cfg.site_name.upper().startswith("SYNTH")
    prep = _prepare_synthetic(cfg) if synth else _prepare_real(cfg)
    cams, table, train_idx, test_idx, prior, gt_dsm, h_range, wc, S = prep
    train_table = table.split(np.array(train_idx))
    val_table = table.split(np.array(test_idx)) if test_idx else None

    sun_frame = sun_frame_from_site(wc, S) if wc is not None else None
    angles_to_vec = (angles_to_vec_from_site(wc, S)
                     if wc is not None else None)

    if eval_only:
        # one shared model-dir loading sequence (render/loading) — the
        # saved opts.json governs the architecture, as everywhere else
        from season_nerf_tpu.render.loading import load_model_dir
        loaded = load_model_dir(cfg.logs_dir)
        model, variables = loaded.model, loaded.variables
        trainer = None
    else:
        trainer = Trainer(cfg, train_table, val_table, prior_hm=prior,
                          gt_dsm=gt_dsm, sun_frame=sun_frame)
        # auto-resume from the latest full-state checkpoint in the log dir
        # (capability the reference lacks — a crash there loses the run)
        import glob
        import re
        ckpts = sorted(
            glob.glob(os.path.join(cfg.logs_dir, "Model_*.nn")),
            key=lambda p: int(re.search(r"Model_(\d+)", p).group(1)))
        completed = False
        if ckpts and getattr(cfg, "resume", True):
            last = ckpts[-1]
            step = int(re.search(r"Model_(\d+)", last).group(1))
            if step > 0:
                print(f"resuming from {last} (step {step})")
                trainer.resume(last)
                completed = step >= cfg.max_train_steps
        if completed:
            # re-running a finished experiment dir must not silently retrain
            # from scratch and overwrite Final_Model.nn — load and skip to
            # eval instead (pass --no-resume to retrain deliberately)
            print("training already complete; skipping to eval")
        else:
            trainer.run(n_steps=train_steps, scan_chunk=cfg.scan_chunk)
        trainer.finalize()
        trainer.validation_report()
        model = trainer.model
        variables = {"params": trainer.state.params}
        if jax.tree_util.tree_leaves(trainer.state.batch_stats):
            variables["batch_stats"] = trainer.state.batch_stats
        if cfg.final_model_selection != "last" and cfg.logs_dir:
            # evaluate the shipped artifact: finalize() may have selected an
            # earlier save point, and the analysis below must describe
            # Final_Model.nn, not the last-step weights
            variables, _ = state_lib.restore_variables(
                trainer.variables_template,
                os.path.join(cfg.logs_dir, "Final_Model.nn"))
    from season_nerf_tpu.train.engine import _auto_mesh
    renderer = Renderer(model, variables, n_samples=cfg.n_samples,
                        chunk=cfg.chunk, classic_solar=cfg.Solar_Type_2,
                        use_hsluv=cfg.use_HSLuv,
                        mesh=trainer.mesh if trainer else _auto_mesh(cfg, strict=False))

    out_dir = os.path.join(cfg.logs_dir, "Output")
    analysis = analyze_model(
        renderer, model, variables, cams, test_idx, gt_dsm,
        h_range, cfg.logs_dir, hm_samples=cfg.n_samples,
        img_size=eval_img_size or (256, 256),
        walk_size=(eval_img_size[0] if eval_img_size else 128),
        angles_to_vec=angles_to_vec)
    write_analysis_outputs(analysis, out_dir)

    detailed = os.path.join(cfg.logs_dir, "Detailed_Output")
    regional_eval(renderer, model, variables, cams, test_idx,
                  gt_dsm, prior, h_range, detailed, quick=True,
                  img_size=eval_img_size, season_size=eval_season_size,
                  hm_samples=cfg.n_samples if eval_img_size else None,
                  angles_to_vec=angles_to_vec)
    return trainer, analysis


def render_pretrained(model_dir: str, va: Tuple[float, float],
                      sa: Tuple[float, float], tf: str,
                      out_size=256, exact_shadow: bool = False,
                      save_name: Optional[str] = None):
    """main_run_Season_NeRF.py equivalent: novel view from a model dir.

    ``out_size`` follows the reference's --Output_Size contract
    (main_run_Season_NeRF.py:26): an int renders square at the model's
    n_samples; (H, W) sets the frame; (H, W, S) also overrides
    samples-per-ray."""
    from season_nerf_tpu.render.renderer import images_from_components
    from season_nerf_tpu.render.loading import load_model_dir
    from season_nerf_tpu.geometry.time_enc import year_frac_from_month_day

    try:
        if "/" in tf:
            month, day = tf.split("/")
            year_frac = year_frac_from_month_day(int(month), int(day))
        else:
            year_frac = float(tf)
    except (ValueError, TypeError):
        raise SystemExit(
            f"--tf must be MM/DD (e.g. 07/19) or a year fraction in [0,1); "
            f"got {tf!r}")

    size = ((out_size, out_size, None)
            if np.isscalar(out_size) else tuple(out_size))
    hw = (size[0], size[1] if len(size) > 1 else size[0])
    n_samples = size[2] if len(size) > 2 else None

    loaded = load_model_dir(model_dir, n_samples=n_samples, use_mesh=True)
    cfg = loaded.cfg
    comp = loaded.renderer.component_render_by_dir(
        tuple(va), tuple(sa), year_frac, hw,
        angles_to_vec=loaded.angles_to_vec, exact_solar=exact_shadow)
    imgs = images_from_components(comp, hw,
                                  classic_shadows=cfg.Solar_Type_2)
    shown = imgs["Season_Adj_Img"] * imgs["Shadow_Adjust"]
    if save_name:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        plt.imsave(save_name, np.clip(np.nan_to_num(shown), 0, 1))
    return shown, imgs


def setup_data(zip_dir: str, io_location: str, code_data_path=None):
    """main_setup_data.py equivalent: unpack DFC2019 Track-3 zips into
    IEEE_Data/Images and the repo Data.zip (cached RPCs + region lists)
    into the cache (main_setup_data.py:22-82).

    ``code_data_path``: where the repo's Data.zip lives (the reference's
    --code_data_path flag); searched after ``zip_dir`` itself and this
    repository's root."""
    img_out = os.path.join(io_location, "IEEE_Data", "Images")
    os.makedirs(img_out, exist_ok=True)
    zips = [os.path.join(zip_dir, f) for f in sorted(os.listdir(zip_dir))
            if f.endswith(".zip")]
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for extra in (code_data_path, repo_root):
        if not extra:
            continue
        dz = os.path.join(extra, "Data.zip")
        if os.path.exists(dz) and dz not in zips and not any(
                os.path.basename(z) == "Data.zip" for z in zips):
            zips.append(dz)
    for path in zips:
        fname = os.path.basename(path)
        with zipfile.ZipFile(path) as z:
            for member in z.namelist():
                base = os.path.basename(member)
                if not base:
                    continue
                if fname == "Data.zip":
                    # cached RPCs + testing-region lists -> Cache/<site>/
                    parts = member.split("/")
                    site = next((p for p in parts if "_" in p and
                                 p[:3].isalpha()), None)
                    dest_dir = os.path.join(io_location, "Cache",
                                            site or "misc")
                    os.makedirs(dest_dir, exist_ok=True)
                    with z.open(member) as src, \
                            open(os.path.join(dest_dir, base), "wb") as dst:
                        dst.write(src.read())
                elif base.endswith((".tif", ".IMD", ".txt")):
                    with z.open(member) as src, \
                            open(os.path.join(img_out, base), "wb") as dst:
                        dst.write(src.read())
    return img_out


def main_train(argv=None, defaults: Optional[Config] = None, **overrides):
    cfg = get_opts(argv, defaults=defaults, **overrides)
    return run_test(cfg)


def main_lite(argv=None):
    return main_train(argv, defaults=lite_defaults())
