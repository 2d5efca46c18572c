#!/usr/bin/env python
"""Train + evaluate several sites sequentially, then merge the summaries.

The reference's multi-region workflow (main.py per site followed by
multi_region_merge, main_eval_region.py:125-157).  Regions are independent —
on a multi-slice deployment each site is its own job; this driver is the
single-host sequential equivalent.

  python tools/run_regions.py --IO_Location ./io --sites OMA_132 OMA_281 \
      [--max_train_steps 50000] [--lite]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--IO_Location", required=True)
    p.add_argument("--sites", nargs="+", required=True)
    p.add_argument("--max_train_steps", type=int, default=None)
    p.add_argument("--lite", action="store_true")
    p.add_argument("--set", nargs="*", default=[], metavar="KEY=VALUE",
                   help="override any Config field, e.g. --set fc_units=128")
    args = p.parse_args()

    from season_nerf_tpu.config import Config, apply_overrides, lite_defaults
    from season_nerf_tpu.cli import run_test
    from season_nerf_tpu.eval.regional import multi_region_merge

    region_dirs = []
    for site in args.sites:
        cfg = lite_defaults() if args.lite else Config()
        cfg.site_name = site
        cfg.exp_name = f"{site}_sweep"
        cfg.IO_Location = args.IO_Location
        if args.max_train_steps:
            cfg.max_train_steps = args.max_train_steps
        apply_overrides(cfg, args.set)
        cfg.resolve_dirs()
        cfg.enable_compile_cache()
        cfg.save_json()
        print(f"=== training {site} -> {cfg.logs_dir}")
        run_test(cfg)
        region_dirs.append(os.path.join(cfg.logs_dir, "Detailed_Output"))

    out = os.path.join(args.IO_Location, "Logs", "Full_Summary")
    multi_region_merge(region_dirs, out)
    print("merged summary:", out)


if __name__ == "__main__":
    main()
