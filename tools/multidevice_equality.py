#!/usr/bin/env python
"""End-to-end multi-device training equality: a full budget on the 8-device
virtual mesh must reach the same final quality as single-device.

tests/test_parallel.py pins one-step update equality; this tool catches
what single-step checks cannot — sharded-BatchNorm statistics drift,
PRNG-stream divergence, or collective reduction-order accumulation over a
whole run with phase switches, save points, and the final eval.  Both arms
run the identical config (same seed, same synthetic site) through the full
pipeline (train -> eval -> regional tables); the report compares final
aligned PSNR / DSM MAE.

Run on CPU with the virtual mesh (the standard multi-chip substitute):

  env JAX_PLATFORMS=cpu PYTHONPATH= \
      XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python tools/multidevice_equality.py --io /tmp/mde -o docs/MULTIDEV.md
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.report_metrics import arm_metrics  # noqa: E402


def run_arm(args, n_devices: int):
    from season_nerf_tpu.config import Config
    from season_nerf_tpu.cli import run_test

    name = f"mesh{n_devices}"
    cfg = Config(exp_name=f"mde_{name}", site_name="SYNTH_MDE",
                 IO_Location=args.io, max_train_steps=args.steps,
                 batch_size=args.batch, n_samples=args.n_samples,
                 fc_units=args.fc, n_saves=3, testing_size=2,
                 synth_views=10, seed=0, mesh_shape=n_devices,
                 save_point_val_renders=0, scan_chunk=10)
    cfg.resolve_dirs().enable_compile_cache()
    cfg.save_json()
    t0 = time.perf_counter()
    run_test(cfg, eval_img_size=(args.eval_size, args.eval_size),
             eval_season_size=(24, 24))
    wall = (time.perf_counter() - t0) / 60.0
    return cfg.logs_dir, wall


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--io", default="/tmp/multidev_eq")
    p.add_argument("--steps", type=int, default=3000)
    p.add_argument("--batch", type=int, default=512)
    p.add_argument("--n_samples", type=int, default=48)
    p.add_argument("--fc", type=int, default=128)
    p.add_argument("--eval_size", type=int, default=96)
    p.add_argument("-o", "--output", default=None)
    args = p.parse_args()

    import jax
    assert len(jax.devices()) >= 8, (
        "need the 8-device virtual mesh; run with "
        "XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu")

    results = {}
    for n in (1, 8):
        logs_dir, wall = run_arm(args, n)
        m = arm_metrics(logs_dir)
        m["wall_min"] = round(wall, 1)
        results[f"mesh{n}"] = m
        print(json.dumps({f"mesh{n}": m}), flush=True)

    a, b = results["mesh1"], results["mesh8"]
    lines = [
        "# Multi-device end-to-end training equality",
        "",
        f"Full-run equality on the 8-device virtual CPU mesh (the standard "
        f"multi-chip substitute): the identical config ({args.steps} steps "
        f"x {args.batch} rays, {args.n_samples} samples/ray, fc {args.fc}, "
        "10-view synthetic site, seed 0, both training phases + save points "
        "+ final regional eval) trained once with mesh_shape=1 and once "
        "with mesh_shape=8 (batch sharded over the mesh, params "
        "replicated, GSPMD-inserted gradient/BatchNorm collectives).",
        "",
        "| metric | 1 device | 8-device mesh | delta |",
        "|---|---|---|---|",
    ]
    for k, label in (("psnr", "aligned+shadow PSNR (dB)"),
                     ("ssim", "aligned+shadow SSIM"),
                     ("dsm_mae", "DSM MAE (m)"),
                     ("dsm_median", "DSM median err (m)"),
                     ("wall_min", "wall-clock (min)")):
        if k in a and k in b:
            lines.append(f"| {label} | {a[k]:.3f} | {b[k]:.3f} | "
                         f"{b[k] - a[k]:+.3f} |")
    lines.append("")
    report = "\n".join(lines)
    print(report)
    if args.output:
        with open(args.output, "w") as f:
            f.write(report + "\n")
        print(f"wrote {args.output}")


if __name__ == "__main__":
    main()
