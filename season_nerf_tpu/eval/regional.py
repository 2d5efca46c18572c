"""Post-training analysis + regional evaluation + multi-region merge.

Drivers equivalent to the reference's:
- ``eval_T_NeRF`` (T_NeRF_Full_2/mg_eval.py:16-145): height-map eval,
  per-testing-image eval, solar walk, season walk -> ``Analysis.pickle``;
- ``regional_eval`` (main_eval_region.py:10-123): data-overview figures,
  Full_Eval_HM, Full_Eval_Imgs, shadow-point tests, Full_Eval_Seasons, each
  pickled + written as text/figure reports into ``Detailed_Output/``;
- ``multi_region_merge`` (main_eval_region.py:125-157 + mg_merge_*): read
  every region's summaries and emit combined tables.
"""

from __future__ import annotations

import os
import pickle
from typing import Dict, Optional, Sequence

import numpy as np

from season_nerf_tpu.render.renderer import Renderer
from season_nerf_tpu.eval import hm_eval, img_eval, shadow_eval, season_eval
from season_nerf_tpu.eval import reports, summary_images
from season_nerf_tpu.eval.walks import get_walking_points


def _dump(obj, path):
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        pickle.dump(obj, f)


def _hm_figure(imgs: Dict, path: str):
    """GT / raw / aligned height-map triptych (the Orgainize_Output_Imgs_HM
    figure, mg_HM_Eval.py:126-340)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    fig, axes = plt.subplots(1, 4, figsize=(17, 4))
    keys = ["GT", "Est_HM_no_Shift", "Est_HM_after_Shift", "CI_width_m"]
    for ax, key in zip(axes, keys):
        if key not in imgs:
            continue
        im = ax.imshow(imgs[key])
        ax.set_title(key)
        fig.colorbar(im, ax=ax)
    fig.tight_layout()
    fig.savefig(path, dpi=110)
    plt.close(fig)


def analyze_model(renderer: Renderer, model, variables, cams: Sequence,
                  test_idx: Sequence[int], gt_dsm: Optional[np.ndarray],
                  h_range, out_dir: str, *, hm_samples: int = 96,
                  img_size=(256, 256), n_align_times: int = 100,
                  n_sun_walk: int = 5, n_time_walk: int = 12,
                  walk_size: int = 128, angles_to_vec=None) -> Dict:
    """The eval_T_NeRF pipeline -> Analysis.pickle equivalent."""
    analysis: Dict = {}
    test_idx = list(test_idx)
    test_cams = [cams[i] for i in test_idx]

    if gt_dsm is not None:
        imgs, before, after = hm_eval.eval_hm(
            model, variables, gt_dsm, h_range, n_samples=hm_samples)
        analysis["HM"] = {"Imgs": imgs, "Before": before, "After": after}

    analysis["Images"] = img_eval.full_eval_images(
        renderer, test_cams, img_size, n_align_times=n_align_times)
    analysis["Image_Summary"] = img_eval.summarize_image_scores(
        analysis["Images"])

    # solar walk: renders over interpolated dataset sun angles
    # (mg_eval.py:89-98); season walk over times (:100-104)
    _, walk_sun, walk_times = get_walking_points(
        cams, 3, n_sun_walk, n_time_walk, min_day_sep=0)
    nadir = (90.0, 0.0)
    analysis["Solar_Walk"] = [
        renderer.render_img(nadir, tuple(s), float(cams[0].time_frac),
                            walk_size,
                            angles_to_vec=angles_to_vec)["Col_Img"]
        for s in walk_sun]
    analysis["Season_Walk"] = {
        "times": walk_times,
        "imgs": [renderer.render_img(
            nadir, tuple(cams[0].sun_el_az), float(t), walk_size,
            angles_to_vec=angles_to_vec)["Col_Img"] for t in walk_times]}

    # pickle without the raw per-sample component arrays (rho/col/adjust per
    # sample — hundreds of MB at production render sizes); the composited
    # images + scores are what load_results_2 consumes (load.py:485-500)
    slim_images = {}
    for name, e in analysis["Images"].items():
        se = {k: v for k, v in e.items() if k != "Result"}
        se["Result"] = {k: v for k, v in e["Result"].items()
                        if k != "Components"}
        slim_images[name] = se
    _dump({**analysis, "Images": slim_images},
          os.path.join(out_dir, "Analysis.pickle"))
    return analysis


def _per_image_figure(name: str, entry: Dict, path: str):
    """GT / base / seasonally-aligned / shadow-adjusted side-by-side with a
    per-image score strip (the Output/ per-test-image PNGs, load.py:485-500
    + Orgainize_Output_Imgs_Imgs, mg_Img_Eval.py:625-799)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    res = entry["Result"]
    al = res["Seasonal_Aligned_Imgs"]
    panels = [
        ("GT", res["Ground_Truth"], None),
        ("Base", res["Images"]["Season_Adj_Img"], "Base_Img"),
        ("Aligned", al["Season_Adj_Img"], "Aligned_Img"),
        ("Aligned+Shadow", al["Season_Adj_Img"] * al["Shadow_Adjust"],
         "Aligned_Shadow_Img"),
    ]
    fig, axes = plt.subplots(1, len(panels), figsize=(3.4 * len(panels), 4))
    scores = entry.get("Scores", {})
    for ax, (title, img, score_key) in zip(axes, panels):
        ax.imshow(np.clip(np.nan_to_num(np.asarray(img, float)), 0, 1))
        sub = ""
        if score_key and score_key in scores:
            _l2, p, s, em = scores[score_key]
            sub = f"\nPSNR {p:.2f}  SSIM {s:.3f}  EM {em:.3f}"
        ax.set_title(title + sub, fontsize=9)
        ax.set_xticks([])
        ax.set_yticks([])
    cvec, sky, t_best = entry["Aligned_Vals"]
    fig.suptitle(f"{name}  (aligned time {t_best:.3f})", fontsize=10)
    fig.tight_layout()
    fig.savefig(path, dpi=110)
    plt.close(fig)


def write_analysis_outputs(analysis: Dict, out_dir: str):
    """load_results_2 equivalent (load.py:485-500): PNG figures + GIF +
    per-test-image comparison figures."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from season_nerf_tpu.render.movie import giffify

    os.makedirs(out_dir, exist_ok=True)
    for name, entry in analysis.get("Images", {}).items():
        if "Result" in entry:
            safe = str(name).replace(os.sep, "_")
            _per_image_figure(name, entry,
                              os.path.join(out_dir, f"{safe}_comparison.png"))
    if "HM" in analysis:
        hm = analysis["HM"]
        fig, axes = plt.subplots(1, 3, figsize=(13, 4))
        for ax, key in zip(axes, ("GT", "Est_HM_no_Shift",
                                  "Est_HM_after_Shift")):
            im = ax.imshow(hm["Imgs"][key])
            ax.set_title(key)
            fig.colorbar(im, ax=ax)
        fig.tight_layout()
        fig.savefig(os.path.join(out_dir, "Height_Maps.png"), dpi=110)
        plt.close(fig)
        reports.hm_report(os.path.join(out_dir, "HM_scores.txt"),
                          hm["Before"], hm["After"])
    reports.image_report(os.path.join(out_dir, "Image_scores.txt"),
                         analysis["Image_Summary"])
    if analysis.get("Season_Walk", {}).get("imgs"):
        giffify(analysis["Season_Walk"]["imgs"],
                os.path.join(out_dir, "Time_Walk.gif"))
    if analysis.get("Solar_Walk"):
        giffify(analysis["Solar_Walk"],
                os.path.join(out_dir, "Solar_Walk.gif"))


def regional_eval(renderer: Renderer, model, variables, cams: Sequence,
                  test_idx: Sequence[int], gt_dsm, prior_dsm, h_range,
                  out_dir: str, *, quick: bool = True,
                  img_size=None, season_size=None, hm_samples=None,
                  angles_to_vec=None) -> Dict:
    """The regional_eval driver (main_eval_region.py:10-123).  ``quick``
    selects the reference's fast sizes (main_eval_region.py:51-55); the
    explicit size kwargs override both (tiny test configs)."""
    os.makedirs(out_dir, exist_ok=True)
    test_idx = list(test_idx)
    train_idx = [i for i in range(len(cams)) if i not in set(test_idx)]
    test_cams = [cams[i] for i in test_idx]
    train_cams = [cams[i] for i in train_idx]

    # data overview figures
    summary_images.angle_scatter(
        cams, test_idx, os.path.join(out_dir, "Data_Sat_and_Sun_pose.png"))
    summary_images.proto_time_plot(
        cams, train_idx, test_idx, test_idx[:3], np.array([]),
        os.path.join(out_dir, "Prototypical_Imgs.png"))

    results: Dict = {}
    # 1. height maps (Full_Eval_HM)
    if gt_dsm is not None:
        imgs, before, after = hm_eval.eval_hm(
            model, variables, gt_dsm, h_range,
            n_samples=hm_samples or (48 if quick else 96))
        prior_scores = None
        if prior_dsm is not None:
            h0, h1 = h_range
            p_m = (np.asarray(prior_dsm) + 1) / 2 * (h1 - h0) + h0
            g_m = (np.asarray(gt_dsm) + 1) / 2 * (h1 - h0) + h0
            if p_m.shape != g_m.shape:
                import cv2
                p_m = cv2.resize(p_m.astype(np.float32),
                                 (g_m.shape[1], g_m.shape[0]))
            prior_scores = hm_eval.hm_scores(
                p_m + np.nanmean(g_m - p_m), g_m)
        hm_summary = {"Imgs": imgs, "Before": before, "After": after,
                      "Prior": prior_scores}
        _dump(hm_summary, os.path.join(out_dir, "HM_Summary.pickle"))
        reports.hm_report(os.path.join(out_dir, "HM_scores.txt"),
                          before, after, prior_scores)
        _hm_figure(imgs, os.path.join(out_dir, "Height_Maps.png"))
        results["HM"] = hm_summary

    # 2. image quality (Full_Eval_Imgs)
    size = img_size or ((256, 256) if quick else (512, 512))
    img_summary = img_eval.full_eval_images(
        renderer, test_cams, size, n_align_times=25 if quick else 100)
    # drop raw render payloads before pickling (the reference hits 4GB
    # pickle failures here, main_eval_region.py:57-71 — we avoid them)
    slim = {k: {"Scores": v["Scores"], "Aligned_Vals": v["Aligned_Vals"]}
            for k, v in img_summary.items()}
    _dump(slim, os.path.join(out_dir, "Img_Summary.pickle"))
    summary = img_eval.summarize_image_scores(img_summary)
    reports.image_report(os.path.join(out_dir, "Image_scores.txt"), summary)
    results["Images"] = {"Summary": summary, "Per_Image": slim}

    # 3. shadow claims (Test_Shadow_Points)
    shadow_summary = shadow_eval.test_shadow_points(
        model, variables, train_cams, test_cams,
        n_samples=hm_samples or (48 if quick else 96),
        points_in_space=16 if quick else 64,
        points_across_angles=6 if quick else 20,
        angles_to_vec=angles_to_vec)
    _dump({"Stats": shadow_summary["Stats"],
           "Sun_El_Az": shadow_summary["Sun_El_Az"]},
          os.path.join(out_dir, "Shadow_Scores_Summary.pickle"))
    reports.shadow_report(os.path.join(out_dir, "Shadow_scores.txt"),
                          shadow_summary["Stats"])
    results["Shadows"] = shadow_summary["Stats"]

    # 4. seasonal claims (Full_Eval_Seasons)
    walk = season_eval.full_eval_seasons(
        renderer, cams, season_size or ((64, 64) if quick else (128, 128)),
        n_sun=3 if quick else 5, n_view=3 if quick else 11,
        n_time=4 if quick else 12, angles_to_vec=angles_to_vec)
    stability = season_eval.season_stability(walk)
    proto = [cams[i].image for i in test_idx[:3]
             if cams[i].image is not None]
    baseline = (season_eval.prototype_baseline_em(proto)
                if len(proto) >= 2 else np.full((1, 1), np.nan))
    _dump({"Input_Vals": walk["Input_Vals"], "Stability": stability,
           "Baseline": baseline},
          os.path.join(out_dir, "Season_Summary.pickle"))
    reports.season_report(os.path.join(out_dir, "Season_scores.txt"),
                          stability, baseline)
    results["Seasons"] = {"Stability": stability["Stats"],
                          "Baseline": baseline}
    _dump(results, os.path.join(out_dir, "Region_Results.pickle"))
    return results


def multi_region_merge(region_dirs: Sequence[str], out_dir: str) -> Dict:
    """Aggregate per-region summaries into combined tables
    (main_eval_region.py:125-157 + mg_merge_HM/imgs/seasons)."""
    os.makedirs(out_dir, exist_ok=True)
    merged: Dict = {"HM": {}, "Images": {}, "Shadows": {}, "Seasons": {}}
    for d in region_dirs:
        name = os.path.basename(os.path.normpath(d))
        path = os.path.join(d, "Region_Results.pickle")
        if not os.path.exists(path):
            continue
        with open(path, "rb") as f:
            r = pickle.load(f)
        if "HM" in r:
            merged["HM"][name] = r["HM"]["After"]
        if "Images" in r:
            merged["Images"][name] = r["Images"]["Summary"]
        if "Shadows" in r:
            merged["Shadows"][name] = r["Shadows"]
        if "Seasons" in r:
            merged["Seasons"][name] = r["Seasons"]["Stability"]

    if merged["HM"]:
        rows = [[n, s["MAE"], s["RMSE"], s["Acc_1_m"], s["Median"]]
                for n, s in merged["HM"].items()]
        reports.write_table(os.path.join(out_dir, "All_HM_scores.txt"),
                            ["Region", "MAE", "RMSE", "Acc<=1m", "Median"],
                            rows, title="Height-map accuracy by region")
    if merged["Images"]:
        rows = []
        for n, summ in merged["Images"].items():
            v = summ.get("Aligned_Shadow_Img") or next(iter(summ.values()))
            rows.append([n, v["PSNR"]["avg"], v["SSIM"]["avg"],
                         v["EM"]["avg"]])
        reports.write_table(os.path.join(out_dir, "All_Image_scores.txt"),
                            ["Region", "PSNR", "SSIM", "EM"], rows,
                            title="Image quality by region (aligned+shadow)")
    if merged["Shadows"]:
        rows = [[n, s.get("Full_Walk", s.get("Training", {})).get("Acc",
                                                                  float("nan"))]
                for n, s in merged["Shadows"].items()]
        reports.write_table(os.path.join(out_dir, "All_Shadow_scores.txt"),
                            ["Region", "Full-walk accuracy"], rows,
                            title="Shadow accuracy by region")
    if merged["Seasons"]:
        rows = [[n, s.get("mean", float("nan")), s.get("median", float("nan")),
                 s.get("p95", float("nan")), s.get("max", float("nan"))]
                for n, s in merged["Seasons"].items()]
        reports.write_table(os.path.join(out_dir, "All_Season_scores.txt"),
                            ["Region", "EM mean", "EM median", "EM p95",
                             "EM max"], rows,
                            title="Seasonal stability by region "
                                  "(mg_merge_seasons equivalent)")
    _dump(merged, os.path.join(out_dir, "Merged_Results.pickle"))
    return merged


def area_overviews(model_dirs: Sequence[str], out_path: str,
                   out_size: int = 128):
    """Montage of nadir renders, one per region's trained model
    (mg_merge_area_overviews.py:12-137 re-loads each model and renders an
    overview).  model_dirs must hold Final_Model.nn + opts.json."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from season_nerf_tpu.render.loading import load_model_dir

    renders = []
    for d in model_dirs:
        loaded = load_model_dir(d)
        out = loaded.renderer.render_img((90.0, 0.0), (55.0, 180.0), 0.5,
                                         out_size)
        renders.append((os.path.basename(os.path.normpath(d)),
                        out["Col_Img"]))
    n = len(renders)
    fig, axes = plt.subplots(1, max(n, 1), figsize=(4 * max(n, 1), 4.4),
                             squeeze=False)
    for ax, (name, img) in zip(axes[0], renders):
        ax.imshow(np.clip(np.nan_to_num(img), 0, 1))
        ax.set_title(name)
        ax.set_xticks([])
        ax.set_yticks([])
    fig.tight_layout()
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    fig.savefig(out_path, dpi=110)
    plt.close(fig)
    return out_path
