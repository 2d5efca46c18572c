"""Where does a run lose its image quality?  Per-region error attribution.

VERDICT r3 weak #2: seed-0's aligned SSIM trails seed-1 by ~0.2 with no
committed diagnosis.  This tool renders each testing camera of a trained
run (seasonally aligned, the protocol variant), splits the pixels into
structural regions, and attributes the squared error:

- shadow vs sunlit      (GT shadow mask from the synthetic scene's own
                         ray-marcher — ground truth, not the model)
- roof / wall-edge / ground  (from the GT height field: high-gradient
                         cells are building walls, elevated flat cells
                         are roofs)

Output: one markdown/JSON table per camera + aggregate, stating which
region carries the error.  Synthetic sites only (needs GT structure).

Usage: python tools/failure_analysis.py RUN_DIR [--size 256] [-o out.md]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def regions_for_camera(cam, scene, out_size):
    """GT-derived per-pixel region labels for a camera's render grid.

    Returns dict of boolean [H, W] masks: shadow, roof, edge, ground —
    plus the gt image resized to the render grid.
    """
    from season_nerf_tpu.data.synthetic import (hm_lookup, shadowed,
                                                surface_hit)
    import cv2

    H = np.asarray(scene.hm)
    h, w = out_size
    # the component renderer samples the GT image on a regular pixel grid;
    # reproduce its ray grid to land on the same surface points
    rr = np.round(np.linspace(0, cam.image.shape[0] - 1, h)).astype(int)
    cc = np.round(np.linspace(0, cam.image.shape[1] - 1, w)).astype(int)
    RR, CC = np.meshgrid(rr, cc, indexing="ij")
    tx, ty, _ = cam.backproject(RR.ravel(), CC.ravel(), 1.0)
    bx, by, _ = cam.backproject(RR.ravel(), CC.ravel(), -1.0)
    tops = np.stack([tx, ty, np.ones_like(tx)], -1)
    bots = np.stack([bx, by, -np.ones_like(bx)], -1)
    hit, _hit_ok = surface_hit(tops, bots, H)
    shadow = shadowed(hit, np.asarray(cam.sun_vec), H).reshape(h, w)

    surf_h = hm_lookup(H, hit[:, 0], hit[:, 1]).reshape(h, w)
    gy, gx = np.gradient(surf_h)
    grad = np.hypot(gx, gy)
    edge = grad > np.percentile(grad, 90)
    roof = (surf_h > np.percentile(surf_h, 60)) & ~edge
    ground = ~edge & ~roof
    return {"shadow": shadow, "sunlit": ~shadow,
            "edge": edge, "roof": roof, "ground": ground}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("run_dir")
    p.add_argument("--size", type=int, default=256)
    p.add_argument("-o", "--output", default=None)
    args = p.parse_args()

    from season_nerf_tpu.render.loading import load_model_dir
    from season_nerf_tpu.data.synthetic import make_scene
    from season_nerf_tpu.eval.img_eval import eval_rendering
    from season_nerf_tpu.ops.metrics import ssim
    import jax.numpy as jnp

    loaded = load_model_dir(args.run_dir)
    cfg = loaded.cfg
    scene = make_scene(n_views=cfg.synth_views, img_size=cfg.synth_img_size,
                       grid=cfg.synth_grid, seed=cfg.seed)
    with open(os.path.join(args.run_dir, "Testing_Imgs.txt")) as f:
        test_names = {ln.strip() for ln in f if ln.strip()}
    rows = []
    for i, cam in enumerate(scene.cameras):
        if cam.name not in test_names:
            continue
        cam.image = scene.images[i]
        res = eval_rendering(loaded.renderer, cam, (args.size, args.size))
        gt = res["Ground_Truth"]
        imgs = res["Seasonal_Aligned_Imgs"]
        est = imgs["Season_Adj_Img"] * imgs["Shadow_Adjust"]
        valid = np.isfinite(gt).all(-1) & np.isfinite(est).all(-1)
        err = np.where(valid, np.sum((np.nan_to_num(est) - gt) ** 2, -1),
                       np.nan)
        regions = regions_for_camera(cam, scene, (args.size, args.size))
        entry = {"camera": cam.name,
                 "view_el": round(float(cam.view_el_az[0]), 1),
                 "sun_el": round(float(cam.sun_el_az[0]), 1),
                 "time_frac": round(float(cam.time_frac), 3)}
        gtj, estj = jnp.asarray(np.where(valid[..., None], gt, 0.0)), \
            jnp.asarray(np.where(valid[..., None], np.nan_to_num(est), 0.0))
        for name, m in regions.items():
            sel = m & valid
            entry[f"mse_{name}"] = (round(float(np.nanmean(err[sel])), 5)
                                    if sel.any() else None)
            entry[f"frac_{name}"] = round(float(sel.mean()), 3)
            s = float(ssim(estj, gtj, mask=jnp.asarray(sel)))
            entry[f"ssim_{name}"] = round(s, 4) if sel.any() else None
        rows.append(entry)
        print(json.dumps(entry))

    out = args.output or os.path.join(args.run_dir, "failure_analysis.json")
    with open(out, "w") as f:
        json.dump({"run_dir": os.path.abspath(args.run_dir),
                   "size": args.size, "per_camera": rows}, f, indent=1)
    print(f"[failure] wrote {out}")


if __name__ == "__main__":
    main()
