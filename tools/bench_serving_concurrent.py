"""Concurrent-client latency/throughput for the HTTP render service.

The service serializes device work behind a lock (render/serving.py:86 —
one chip, one XLA stream), so concurrent clients queue.  This measures
what that queueing does to the *service* surface: per-request latency
p50/p95 and aggregate frames/s + rays/s at 1/4/16 concurrent clients,
against a live ThreadingHTTPServer over a real model dir (the same stack
`serve_render.py` deploys).

  python tools/bench_serving_concurrent.py MODEL_DIR [--size 128]
      [--clients 1 4 16] [--requests 8] [--fast_render N_C N_F]

Prints one JSON line per concurrency level and writes the full table to
--output (default MODEL_DIR/serving_concurrency.json).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import threading
import time
import urllib.request

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def run_level(base_url: str, n_clients: int, n_requests: int, size: int):
    """n_clients threads x n_requests sequential GETs each; returns
    latency list + wall time."""
    lat = []
    lat_lock = threading.Lock()
    errors = []
    # vary the view/time per request so no layer can cache the frame
    def client(cid: int):
        for r in range(n_requests):
            va_el = 55 + (cid * 7 + r * 3) % 30
            va_az = (cid * 41 + r * 29) % 360
            tf = ((cid + 1) * (r + 1) * 0.07) % 1.0
            url = (f"{base_url}/render?view_el={va_el}&view_az={va_az}"
                   f"&sun_el=45&sun_az=180&t={tf:.3f}&size={size}")
            t0 = time.perf_counter()
            try:
                with urllib.request.urlopen(url, timeout=600) as resp:
                    resp.read()
                dt = time.perf_counter() - t0
                with lat_lock:
                    lat.append(dt)
            except Exception as e:   # noqa: BLE001 - report, don't die
                errors.append(str(e))

    threads = [threading.Thread(target=client, args=(i,))
               for i in range(n_clients)]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0
    return lat, wall, errors


def main():
    p = argparse.ArgumentParser()
    p.add_argument("model_dir")
    p.add_argument("--size", type=int, default=128)
    p.add_argument("--clients", type=int, nargs="*", default=[1, 4, 16])
    p.add_argument("--requests", type=int, default=8,
                   help="requests per client")
    p.add_argument("--n_samples", type=int, default=None)
    p.add_argument("--fast_render", type=int, nargs=2, default=None)
    p.add_argument("--output", default=None)
    args = p.parse_args()

    from season_nerf_tpu.render.serving import RenderService, make_server

    service = RenderService(
        args.model_dir, n_samples=args.n_samples,
        fast_render=tuple(args.fast_render) if args.fast_render else None)
    server = make_server(service, port=0)
    port = server.server_address[1]
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    base = f"http://127.0.0.1:{port}"

    # warmup: compile the render program once outside the timings
    with urllib.request.urlopen(
            f"{base}/render?view_el=70&view_az=40&sun_el=45&sun_az=180"
            f"&t=0.5&size={args.size}", timeout=600) as resp:
        resp.read()

    rays_per_frame = args.size * args.size
    table = []
    for n in args.clients:
        lat, wall, errors = run_level(base, n, args.requests, args.size)
        if errors:
            print(f"[serve-bench] {len(errors)} errors at {n} clients: "
                  f"{errors[:2]}")
        lat = np.asarray(sorted(lat))
        row = {
            "clients": n,
            "requests": int(lat.size),
            "size": args.size,
            "p50_s": round(float(np.percentile(lat, 50)), 3),
            "p95_s": round(float(np.percentile(lat, 95)), 3),
            "mean_s": round(float(lat.mean()), 3),
            "frames_per_s": round(lat.size / wall, 3),
            "rays_per_s": round(lat.size * rays_per_frame / wall, 1),
            "errors": len(errors),
        }
        table.append(row)
        print(json.dumps(row))

    server.shutdown()
    out = args.output or os.path.join(args.model_dir,
                                      "serving_concurrency.json")
    with open(out, "w") as f:
        json.dump({"model_dir": os.path.abspath(args.model_dir),
                   "fast_render": args.fast_render,
                   "levels": table}, f, indent=1)
    print(f"[serve-bench] wrote {out}")


if __name__ == "__main__":
    main()
