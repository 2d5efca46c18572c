#!/usr/bin/env python
"""Post-hoc geometry-best selection study over a completed run's save points.

``final_model_selection=best_geometry`` (train/engine.py:finalize) picks the
save point whose validation renders score the lowest height error against
the training-time *prior* DSM — a leakage-free signal available during
training.  Runs finished before that option landed never logged
Prior_Height_Error, so this tool recomputes it for every ``Model_<step>.nn``
in a run directory and quantifies what the selector would have bought:

  1. per save point: validation-render height MAE vs the prior DSM
     (selection signal) and vs the GT DSM (diagnostic);
  2. the selected checkpoint and the final model are then scored with the
     full ``eval_hm`` protocol (density surface -> meters -> greedy
     alignment), the same numbers as docs/QUALITY_r3.md's height-map table.

Synthetic-site runs only (the scene regenerates deterministically from
opts.json).  Usage:

  python tools/select_best_geometry.py /tmp/flagship_bf16/Logs/flagship_bf16
"""

import argparse
import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("run_dir")
    p.add_argument("--skip-full-eval", action="store_true",
                   help="only print the per-save-point table")
    args = p.parse_args()

    from season_nerf_tpu.config import Config
    cfg = Config.load_json(os.path.join(args.run_dir, "opts.json"))
    if not cfg.site_name.upper().startswith("SYNTH"):
        raise SystemExit("post-hoc study supports synthetic sites only "
                         "(the scene regenerates from opts.json)")
    ckpts = sorted(
        glob.glob(os.path.join(args.run_dir, "Model_*.nn")),
        key=lambda q: int(re.search(r"Model_(\d+)", q).group(1)))
    if not ckpts:
        raise SystemExit(f"no Model_*.nn checkpoints in {args.run_dir}")

    run_dir = args.run_dir
    cfg.logs_dir = ""          # no-op writer; never touch the run dir
    cfg.n_saves = 0
    cfg.mesh_shape = None      # read-only analysis: never require the
    #                            training slice recorded in opts.json
    import numpy as np
    from season_nerf_tpu.cli import _prepare_synthetic
    from season_nerf_tpu.train.engine import Trainer

    cams, table, train_idx, test_idx, prior, gt_dsm, h_range, _, _ = \
        _prepare_synthetic(cfg)
    train_table = table.split(np.array(train_idx))
    val_table = table.split(np.array(test_idx))
    tr = Trainer(cfg, train_table, val_table, prior_hm=prior, gt_dsm=gt_dsm)

    rows = []
    for ck in ckpts:
        step = int(re.search(r"Model_(\d+)", ck).group(1))
        tr.resume(ck)
        rep = tr.validation_report(step=step)
        rows.append({"step": step,
                     "prior_mae": rep.get("Prior_Height_Error"),
                     "gt_mae": rep.get("Mean_Height_Error"),
                     "psnr": rep.get("Mean_PSNR")})
        print(json.dumps(rows[-1]), flush=True)

    scored = [r for r in rows
              if r["prior_mae"] is not None and r["gt_mae"] is not None]
    if not scored:
        raise SystemExit("no save point produced a prior-DSM height score "
                         "(validation renders had no overlap with the "
                         "prior); nothing to select from")
    best = min(scored, key=lambda r: r["prior_mae"])
    last = scored[-1]
    print(f"\nselected (argmin prior-DSM MAE): step {best['step']} "
          f"(prior {best['prior_mae']:.4f}, GT {best['gt_mae']:.4f}) "
          f"vs last step {last['step']} "
          f"(prior {last['prior_mae']:.4f}, GT {last['gt_mae']:.4f})")
    # Spearman-style sanity: does the leakage-free signal rank like GT?
    n = len(scored)
    if n > 1:
        pr = np.argsort(np.argsort([r["prior_mae"] for r in scored]))
        gr = np.argsort(np.argsort([r["gt_mae"] for r in scored]))
        rho = 1 - 6 * np.sum((pr - gr) ** 2) / (n * (n * n - 1))
        print(f"rank correlation prior-vs-GT across {n} save points: "
              f"{rho:.3f}")

    if args.skip_full_eval:
        return
    from season_nerf_tpu.eval import hm_eval
    scene_gt = gt_dsm

    def full_dsm(ck):
        tr.resume(ck)
        variables = {"params": tr.state.params}
        import jax
        if jax.tree_util.tree_leaves(tr.state.batch_stats):
            variables["batch_stats"] = tr.state.batch_stats
        _, before, after = hm_eval.eval_hm(
            tr.model, variables, scene_gt, h_range,
            n_samples=cfg.n_samples)
        return before, after

    for label, ck in (("best_geometry", os.path.join(
            run_dir, f"Model_{best['step']}.nn")),
            ("last (reference protocol)", ckpts[-1])):
        before, after = full_dsm(ck)
        print(f"\n{label}: DSM raw MAE {before['MAE']:.3f} m -> aligned "
              f"MAE {after['MAE']:.3f} m, RMSE {after['RMSE']:.3f} m, "
              f"<=1m {after['Acc_1_m']:.3f}, median {after['Median']:.3f} m")


if __name__ == "__main__":
    main()
