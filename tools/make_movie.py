#!/usr/bin/env python
"""Render a keyframed movie from a trained model directory.

The mg_movie_maker CLI story: a default orbit script (view spirals around
the site while the sun and season sweep) or custom keyframes via --keyframe.

  python tools/make_movie.py --Model_Location <dir> --out movie.gif \
      [--frames 60] [--size 256] \
      [--keyframe VEL,VAZ,SEL,SAZ,T ...]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--Model_Location", required=True)
    p.add_argument("--out", default=None)
    p.add_argument("--frames", type=int, default=60)
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--fps", type=int, default=12)
    p.add_argument("--keyframe", action="append", default=None,
                   help="repeatable: view_el,view_az,sun_el,sun_az,time_frac")
    p.add_argument("--pose_keyframe", action="append", default=None,
                   help="repeatable 6-DoF free-camera keyframe (cube "
                        "coords): x,y,z,pitch,yaw,fov,sun_el,sun_az,"
                        "time_frac — use --pose_keyframe=-0.8,... for "
                        "values starting with a minus")
    p.add_argument("--fast_render", type=int, nargs=2, default=None,
                   metavar=("N_COARSE", "N_FINE"),
                   help="depth-guided fast rendering for every frame "
                        "(qualify with tools/fast_render_ab.py)")
    args = p.parse_args()

    from season_nerf_tpu.render.movie import (MovieScript, render_movie,
                                              export_film)
    from season_nerf_tpu.render.loading import load_model_dir

    loaded = load_model_dir(args.Model_Location, use_mesh=True,
                            fast_render=args.fast_render)
    to_vec = loaded.angles_to_vec
    r = loaded.renderer
    script = MovieScript()
    if args.pose_keyframe:
        for kf in args.pose_keyframe:
            x, y, z, pitch, yaw, fov, se, sa, t = \
                [float(v) for v in kf.split(",")]
            script.add(None, (se, sa), t,
                       cam_pose=(x, y, z, pitch, yaw, fov))
    elif args.keyframe:
        for kf in args.keyframe:
            ve, va, se, sa, t = [float(x) for x in kf.split(",")]
            script.add((ve, va), (se, sa), t)
    else:
        # default: orbit the site through a full year
        for frac in (0.0, 0.25, 0.5, 0.75, 1.0):
            script.add((80 - 15 * abs(frac - 0.5) * 2, 360 * frac),
                       (40 + 25 * (0.5 - abs(frac - 0.5)) * 2, 180), frac)
    frames = render_movie(r, script, args.frames, args.size,
                          angles_to_vec=to_vec)
    out = args.out or os.path.join(args.Model_Location, "movie.gif")
    print("wrote", export_film(frames, out, fps=args.fps))


if __name__ == "__main__":
    main()
