#!/usr/bin/env python
"""Regional evaluation of trained model directories + multi-region merge
(reference: main_eval_region.py)."""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _main():
    p = argparse.ArgumentParser()
    p.add_argument("--Model_Locations", nargs="+", required=True,
                   help="trained model dirs (opts.json + Final_Model.nn)")
    p.add_argument("--Output", default=None)
    p.add_argument("--full", action="store_true",
                   help="full-quality (slow) evaluation")
    args = p.parse_args()

    from season_nerf_tpu.cli import run_test
    from season_nerf_tpu.config import Config
    from season_nerf_tpu.eval.regional import multi_region_merge

    region_dirs = []
    for loc in args.Model_Locations:
        cfg = Config.load_json(os.path.join(loc, "opts.json"))
        cfg.logs_dir = loc
        trainer, _ = run_test(cfg, eval_only=True)
        region_dirs.append(os.path.join(loc, "Detailed_Output"))
    out = args.Output or os.path.join(
        os.path.dirname(args.Model_Locations[0]), "Full_Summary")
    multi_region_merge(region_dirs, out)
    print("merged summary written to", out)


if __name__ == "__main__":
    _main()
