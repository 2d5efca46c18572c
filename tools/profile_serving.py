#!/usr/bin/env python
"""Stage-level breakdown of the serving path's per-frame latency.

Round 4 measured the HTTP surface at ~9.6k rays/s for 128-px frames
(p50 1.73 s) against 189k rays/s raw render throughput — a ~20x gap with
no committed attribution.  This tool times every stage of one frame on
the live stack so the gap has named owners:

  grid      dir_grid_rays host work
  dispatch  enqueueing all chunk kernels (async)
  fetch     jax.device_get of the chunk outputs (blocks on compute+RTT)
  scatter   numpy scatter into the image rasters
  png       PIL PNG encode
  http      end-to-end GET against a live ThreadingHTTPServer minus the
            direct render_view time (connection + handler + transfer)

plus a per-dispatch overhead probe: the same 1-chunk kernel fetched
K times back-to-back (tunnel RTT + compute per dispatch), and the
chunk-count scaling of a whole frame.

Usage: python tools/profile_serving.py MODEL_DIR [--size 128 256]
           [--iters 5] [--json out.json]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import threading
import time
import urllib.request

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _med(xs):
    return statistics.median(xs)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("model_dir")
    ap.add_argument("--size", type=int, nargs="*", default=[128, 256])
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    import jax
    from season_nerf_tpu.render import serving
    from season_nerf_tpu.render.renderer import dir_grid_rays, encode_time

    svc = serving.RenderService(args.model_dir)
    r = svc.renderer
    from season_nerf_tpu.render.renderer import _default_angles_to_vec
    to_vec = svc.angles_to_vec or _default_angles_to_vec(r.sun_frame)
    results = {"model_dir": os.path.abspath(args.model_dir),
               "chunk": r.chunk, "n_samples": r.n_samples,
               "backend": jax.default_backend(), "sizes": {}}

    # ---- per-dispatch overhead probe ------------------------------------
    view = to_vec(70.0, 40.0)
    sun = to_vec(50.0, 170.0)
    tops, bots, _ = dir_grid_rays(view, (64, 64))
    tt = np.repeat(tops[:1], r.chunk, 0).astype(np.float32)
    bb = tt - np.array([0.0, 0.0, 2.0], np.float32)
    ss = np.repeat(sun[None].astype(np.float32), r.chunk, 0)
    t44 = np.repeat(encode_time(0.5)[None].astype(np.float32), r.chunk, 0)
    dev_in = [r._put(x) for x in (tt, bb, ss, t44)]
    r._full_chunk(r.variables, *dev_in)          # compile
    ts = []
    for _ in range(args.iters * 2):
        t0 = time.perf_counter()
        out = r._full_chunk(r.variables, *dev_in)
        jax.device_get(out)
        ts.append(time.perf_counter() - t0)
    results["single_chunk_dispatch_fetch_s"] = _med(ts)
    # K chained dispatches, one fetch at the end (the pipelined pattern)
    for K in (2, 4, 8):
        ts = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            outs = [r._full_chunk(r.variables, *dev_in) for _ in range(K)]
            jax.device_get(outs)
            ts.append(time.perf_counter() - t0)
        results[f"pipelined_{K}_chunks_s"] = _med(ts)

    # ---- stage breakdown per frame size ---------------------------------
    for size in args.size:
        stages = {k: [] for k in ("grid", "render", "scatter", "png",
                                  "render_view_total")}
        img = None
        for it in range(args.iters + 1):
            t0 = time.perf_counter()
            tops, bots, img_pts = dir_grid_rays(view, (size, size))
            t1 = time.perf_counter()
            res = r.render_rays(tops, bots, sun, encode_time(0.5))
            t2 = time.perf_counter()
            col = np.zeros((size, size, 3), np.float32)
            mask = np.zeros((size, size), bool)
            col[img_pts[:, 0], img_pts[:, 1]] = res["rendered"]
            mask[img_pts[:, 0], img_pts[:, 1]] = True
            frame = np.where(mask[..., None], col, np.nan)
            t3 = time.perf_counter()
            png = serving._png_bytes(frame)
            t4 = time.perf_counter()
            sv0 = time.perf_counter()
            svc.render_view((70.0, 40.0), (50.0, 170.0), 0.5, size=size)
            sv1 = time.perf_counter()
            if it == 0:
                continue                      # warmup/compile iteration
            stages["grid"].append(t1 - t0)
            stages["render"].append(t2 - t1)
            stages["scatter"].append(t3 - t2)
            stages["png"].append(t4 - t3)
            stages["render_view_total"].append(sv1 - sv0)
        n_rays = int(np.prod(dir_grid_rays(view, (size, size))[2].shape[:1]))
        row = {k: round(_med(v), 4) for k, v in stages.items()}
        row["n_rays"] = n_rays
        row["n_chunks"] = -(-n_rays // r.chunk)
        row["render_rays_per_s"] = round(n_rays / row["render"], 1)
        results["sizes"][str(size)] = row
        print(f"[profile] size={size} rays={n_rays} "
              f"chunks={row['n_chunks']}: " +
              " ".join(f"{k}={row[k]*1e3:.0f}ms" for k in
                       ("grid", "render", "scatter", "png")))

    # ---- HTTP overhead (single client, live server) ---------------------
    httpd = serving.make_server(svc, host="127.0.0.1", port=0)
    port = httpd.server_address[1]
    th = threading.Thread(target=httpd.serve_forever, daemon=True)
    th.start()
    try:
        for size in args.size:
            url = (f"http://127.0.0.1:{port}/render?view_el=70&view_az=40"
                   f"&sun_el=50&sun_az=170&t=0.5&size={size}")
            urllib.request.urlopen(url, timeout=300).read()   # warm
            ts = []
            for _ in range(args.iters):
                t0 = time.perf_counter()
                urllib.request.urlopen(url, timeout=300).read()
                ts.append(time.perf_counter() - t0)
            results["sizes"][str(size)]["http_total"] = round(_med(ts), 4)
            direct = results["sizes"][str(size)]["render_view_total"]
            results["sizes"][str(size)]["http_overhead"] = round(
                _med(ts) - direct, 4)
    finally:
        httpd.shutdown()

    out = args.json or os.path.join(args.model_dir, "serving_profile.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"[profile] wrote {out}")
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
