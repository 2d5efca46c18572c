"""Wall-clock-to-quality curve from a flagship run's save points.

BASELINE.json's north star is a *wall-clock* claim (>=10x training time at
quality parity) but the scoreboard ratio rests on a derived rays/s
denominator (BASELINE.md).  This tool converts a finished run into the
claim that actually matters: measured minutes to reference-protocol
quality.

For each ``Model_<step>.nn`` save point in a run dir it:
1. maps the step to wall-clock seconds since training started via the
   ``metrics.jsonl`` timestamps (the Testing/* scalars are written at the
   moment the checkpoint is saved, train/engine.py:446-473),
2. loads the checkpoint and scores it with the reference protocol:
   seasonally-aligned masked PSNR/SSIM over the testing cameras
   (eval/img_eval.full_eval_images) and DSM MAE before alignment
   (eval/hm_eval.eval_hm — the before-alignment row is the one comparable
   across harnesses, see tools/cross_eval_reference.py's documented
   deviations),
3. writes a JSON curve + a markdown table, and states the measured
   minutes-to-band for quality bands (paper DSM range 1.2-1.5 m,
   Season-NeRF paper table 1).

Watchdog restarts leave gaps in metrics.jsonl timestamps; per-step wall
time is accumulated from consecutive-entry deltas capped at 120 s so a
crash pause does not inflate the curve (the cap is >10x the per-savepoint
gap at flagship throughput).

Usage: python tools/time_to_quality.py RUN_DIR [-o curve.json]
          [--size 96] [--samples 96] [--max_ckpts 12] [--hm_grid 96]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def wall_clock_map(run_dir: str, cap_s: float = 120.0):
    """step -> accumulated wall seconds (restart-gap capped)."""
    entries = []
    with open(os.path.join(run_dir, "metrics.jsonl")) as f:
        for ln in f:
            try:
                e = json.loads(ln)
            except ValueError:
                continue
            entries.append((float(e["t"]), int(e["step"])))
    entries.sort()
    acc, prev_t = 0.0, entries[0][0]
    step_wall = {}
    for t, step in entries:
        acc += min(max(t - prev_t, 0.0), cap_s)
        prev_t = t
        step_wall[step] = acc    # last write at that step wins
    return step_wall


def load_ckpt_variables(path, template):
    """Model_<step>.nn (full checkpoint) or Final_Model.nn (artifact) ->
    variables dict."""
    from flax import serialization
    with open(path, "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    if "state" in payload:       # full train-state checkpoint
        sd = payload["state"]
        params_sd, stats_sd = sd["params"], sd.get("batch_stats", {})
    else:                        # inference artifact
        params_sd, stats_sd = payload["params"], payload["batch_stats"]
    params = serialization.from_state_dict(template["params"], params_sd)
    variables = {"params": params}
    if "batch_stats" in template:
        variables["batch_stats"] = serialization.from_state_dict(
            template["batch_stats"], stats_sd)
    return variables


def compute_bands(curve, bands):
    """Minutes-to-band under BOTH alignment conventions.

    The paper's 1.2-1.5 m DSM band (Season-NeRF paper table 1) is quoted
    after the reference's own alignment search, so `_aligned` is the
    convention the band claim must use; `_raw` (before alignment) is the
    harsher number comparable across harnesses without an alignment
    convention.  Both are reported so README/QUALITY tables can cite one
    column without contradicting this artifact (VERDICT r4 weak #2)."""
    out = {}
    for band in bands:
        for col, tag in (("dsm_mae_m", "raw"),
                         ("dsm_mae_aligned_m", "aligned")):
            hit = next((r for r in curve if r.get(col) is not None
                        and r[col] <= band), None)
            out[f"minutes_to_dsm_mae_{band}m_{tag}"] = (
                hit["wall_minutes"] if hit else None)
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("run_dir")
    p.add_argument("-o", "--output", default=None)
    p.add_argument("--size", type=int, default=96,
                   help="render size for the image protocol")
    p.add_argument("--samples", type=int, default=96)
    p.add_argument("--hm_grid", type=int, default=96)
    p.add_argument("--max_ckpts", type=int, default=12,
                   help="score at most this many save points (evenly "
                        "thinned, endpoints kept)")
    p.add_argument("--bands", type=float, nargs="*", default=[1.5, 1.3],
                   help="DSM-MAE bands (meters) to report minutes-to")
    p.add_argument("--from_json", action="store_true",
                   help="treat RUN_DIR as an existing curve JSON and only "
                        "recompute the bands block (no device work)")
    args = p.parse_args()

    if args.from_json:
        with open(args.run_dir) as f:
            report = json.load(f)
        report["bands"] = compute_bands(report["curve"], args.bands)
        out = args.output or args.run_dir
        with open(out, "w") as f:
            json.dump(report, f, indent=1)
        print(f"[ttq] bands: {report['bands']}")
        print(f"[ttq] rewrote {out}")
        return

    from season_nerf_tpu.render.loading import load_model_dir
    from season_nerf_tpu.data.synthetic import make_scene
    from season_nerf_tpu.eval.img_eval import full_eval_images
    from season_nerf_tpu.eval.hm_eval import eval_hm
    import cv2

    loaded = load_model_dir(args.run_dir)
    cfg = loaded.cfg
    scene = make_scene(n_views=cfg.synth_views, img_size=cfg.synth_img_size,
                       grid=cfg.synth_grid, seed=cfg.seed)
    with open(os.path.join(args.run_dir, "Testing_Imgs.txt")) as f:
        test_names = {ln.strip() for ln in f if ln.strip()}
    test_cams = []
    for i, cam in enumerate(scene.cameras):
        if cam.name in test_names:
            cam.image = scene.images[i]
            test_cams.append(cam)
    gt_hm = np.asarray(scene.hm, np.float64)
    if args.hm_grid and gt_hm.shape[0] > args.hm_grid:
        gt_hm = cv2.resize(gt_hm, (args.hm_grid, args.hm_grid),
                           interpolation=cv2.INTER_AREA)
    h_range = (0.0, 30.0)

    ckpts = []
    for path in glob.glob(os.path.join(args.run_dir, "Model_*.nn")):
        m = re.match(r"Model_(\d+)\.nn$", os.path.basename(path))
        if m:
            ckpts.append((int(m.group(1)), path))
    ckpts.sort()
    if len(ckpts) > args.max_ckpts:
        idx = np.unique(np.linspace(0, len(ckpts) - 1,
                                    args.max_ckpts).astype(int))
        ckpts = [ckpts[i] for i in idx]

    wall = wall_clock_map(args.run_dir)
    template = loaded.variables
    curve = []
    for step, path in ckpts:
        variables = load_ckpt_variables(path, template)
        loaded.renderer.variables = variables
        per_img = full_eval_images(loaded.renderer, test_cams,
                                   (args.size, args.size))
        psnrs = [e["Scores"]["Aligned_Shadow_Img"][1]
                 for e in per_img.values()]
        ssims = [e["Scores"]["Aligned_Shadow_Img"][2]
                 for e in per_img.values()]
        _, before, after = eval_hm(loaded.model, variables, gt_hm, h_range,
                                   n_samples=args.samples)
        minutes = wall.get(step, float("nan")) / 60.0
        row = {"step": step, "wall_minutes": round(minutes, 2),
               "aligned_psnr": round(float(np.mean(psnrs)), 3),
               "aligned_ssim": round(float(np.mean(ssims)), 4),
               "dsm_mae_m": round(float(before["MAE"]), 3),
               "dsm_mae_aligned_m": round(float(after["MAE"]), 3),
               "dsm_acc_1m": round(float(before["Acc_1_m"]), 4)}
        curve.append(row)
        print(f"[ttq] step {step:6d}  {minutes:7.1f} min  "
              f"PSNR {row['aligned_psnr']:6.2f}  "
              f"MAE {row['dsm_mae_m']:5.2f} m")

    bands = compute_bands(curve, args.bands)
    report = {"run_dir": os.path.abspath(args.run_dir),
              "protocol": {"size": args.size, "samples": args.samples,
                           "hm_grid": args.hm_grid,
                           "psnr_variant": "Aligned_Shadow_Img (seasonally "
                                           "aligned x shadow, the reference "
                                           "table's row 4)"},
              "curve": curve, "bands": bands}
    out = args.output or os.path.join(args.run_dir, "time_to_quality.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
    print(f"[ttq] bands: {bands}")
    print(f"[ttq] wrote {out}")


if __name__ == "__main__":
    main()
