#!/usr/bin/env python
"""Render a novel view from a pretrained model directory
(reference: main_run_Season_NeRF.py).

  python main_run_Season_NeRF.py --Model_Location <dir> --VA 60 120 \
      --SA 40 180 --tf 07/19 [--Output_Size 256] [--Save_Name out.png] \
      [--exact_shadow]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _main():
    p = argparse.ArgumentParser()
    p.add_argument("--Model_Location", required=True)
    p.add_argument("--VA", nargs=2, type=float, default=[70.0, 0.0],
                   help="view elevation azimuth (deg)")
    p.add_argument("--SA", nargs=2, type=float, default=[45.0, 180.0],
                   help="sun elevation azimuth (deg)")
    p.add_argument("--tf", type=str, default="07/01",
                   help="time of year, MM/DD or fraction")
    # reference contract: 1 int (square) or 3 ints H W n_samples
    # (main_run_Season_NeRF.py:26 default (256,256,96))
    p.add_argument("--Output_Size", type=int, nargs="+", default=[256])
    p.add_argument("--Save_Name", type=str, default=None)
    p.add_argument("--exact_shadow", action="store_true")
    p.add_argument("--Force_CPU", action="store_true")
    args = p.parse_args()
    if args.Force_CPU:
        import jax
        jax.config.update("jax_platforms", "cpu")

    from season_nerf_tpu.cli import render_pretrained
    out_size = (args.Output_Size[0] if len(args.Output_Size) == 1
                else tuple(args.Output_Size))
    shown, imgs = render_pretrained(
        args.Model_Location, tuple(args.VA), tuple(args.SA), args.tf,
        out_size=out_size, exact_shadow=args.exact_shadow,
        save_name=args.Save_Name)
    if args.Save_Name is None:
        out = os.path.join(args.Model_Location, "render.png")
        import numpy as np
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        plt.imsave(out, np.clip(np.nan_to_num(shown), 0, 1))
        print("saved", out)


if __name__ == "__main__":
    _main()
