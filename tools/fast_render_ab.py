#!/usr/bin/env python
"""Fast-render A/B on a trained model: agreement + speedup vs exact.

Renders the same novel views through the exact uniform-sampling path and
the depth-guided fast path (render/renderer.render_chunk_outputs_fast),
then reports how closely they agree (PSNR/SSIM between the two images,
DSM MAE between the two height maps) and the wall-clock speedup.  This is
the qualification evidence for serving with --fast_render: the eval
surfaces (component renders) always use the exact sampler, so GT-scored
metrics are unaffected by construction — what must be measured is the
full-composite serving output itself.

  python tools/fast_render_ab.py --Model_Location <run_dir> \
      [--size 512] [--coarse 32] [--fine 32] [--views 3]

Prints one JSON line.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--Model_Location", required=True)
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--coarse", type=int, default=32)
    p.add_argument("--fine", type=int, default=32)
    p.add_argument("--views", type=int, default=3)
    p.add_argument("--chunk", type=int, default=None)
    args = p.parse_args()

    import numpy as np

    from season_nerf_tpu.ops.metrics import psnr, ssim
    from season_nerf_tpu.render.loading import load_model_dir

    exact = load_model_dir(args.Model_Location, chunk=args.chunk)
    fast = load_model_dir(args.Model_Location, chunk=args.chunk,
                          fast_render=(args.coarse, args.fine))

    views = [(70.0 + 7 * i, 40.0 * i) for i in range(args.views)]
    sun, tf = (45.0, 180.0), 0.5

    def render_all(lm):
        outs, heights = [], []
        t0 = time.perf_counter()
        for v in views:
            out = lm.renderer.render_img(v, sun, tf, args.size)
            outs.append(out["Col_Img"])
            heights.append(np.where(out["PS_Sum"] > 1e-2, out["Height"],
                                    np.nan))
        dt = time.perf_counter() - t0
        return outs, heights, dt

    # compile warmup on a small frame, then timed renders
    for lm in (exact, fast):
        lm.renderer.render_img(views[0], sun, tf, 64)
    imgs_e, hm_e, dt_e = render_all(exact)
    imgs_f, hm_f, dt_f = render_all(fast)

    psnrs = [float(psnr(a, b)) for a, b in zip(imgs_e, imgs_f)]
    ssims = [float(ssim(a, b)) for a, b in zip(imgs_e, imgs_f)]
    # height agreement in meters where both paths report a surface
    h_scale = 1.0
    if exact.h_range is not None:
        h_scale = (exact.h_range[1] - exact.h_range[0]) / 2.0
    dsm_mae = []
    for a, b in zip(hm_e, hm_f):
        both = np.isfinite(a) & np.isfinite(b)
        dsm_mae.append(float(np.mean(np.abs(a[both] - b[both])) * h_scale)
                       if both.any() else float("nan"))

    n_rays = args.size * args.size * len(views)
    print(json.dumps({
        "metric": "fast_render_agreement",
        "psnr_fast_vs_exact": [round(v, 2) for v in psnrs],
        "ssim_fast_vs_exact": [round(v, 4) for v in ssims],
        "dsm_mae_m_fast_vs_exact": [round(v, 4) for v in dsm_mae],
        "exact_rays_per_sec": round(n_rays / dt_e, 1),
        "fast_rays_per_sec": round(n_rays / dt_f, 1),
        "speedup": round(dt_e / dt_f, 2),
        "config": f"{args.size}px, coarse {args.coarse} + fine {args.fine} "
                  f"vs n_samples {exact.cfg.n_samples}",
    }))


if __name__ == "__main__":
    main()
