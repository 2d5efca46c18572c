#!/usr/bin/env python
"""Training-step throughput sweep over (batch, remat, dtype, sin impl).

Re-runs bench.py's measurement loop in-process for each configuration and
emits one JSON line per point plus a markdown table — the evidence behind
docs/DESIGN.md's "Batch scaling" section.  Each point retrains nothing; it
compiles the fused train step and times the steady-state multi-step scan.

  python tools/perf_sweep.py                       # default matrix
  python tools/perf_sweep.py --points 4096:off:f32:fast 8192:full:bf16:fast
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_POINTS = [
    # batch : remat ("off"/"dots"/"full") : dtype (f32/bf16) : sin (exact/fast)
    "4096:off:f32:exact",
    "4096:off:f32:fast",
    "4096:off:bf16:fast",
    "4096:dots:f32:fast",
    "8192:full:f32:fast",
    "8192:full:bf16:fast",
]


def measure(batch, remat, dtype, sin, steps=30, scan_chunk=10):
    import jax
    from season_nerf_tpu.config import Config
    from season_nerf_tpu.data.synthetic import make_scene, scene_ray_tables
    from season_nerf_tpu.train.engine import Trainer
    from season_nerf_tpu.train import phases as phase_lib

    cfg = Config(max_train_steps=50_000, n_samples=96, batch_size=batch,
                 fc_units=512, n_saves=0, logs_dir="", jump_start=True,
                 remat_trunk="" if remat == "off" else remat,
                 compute_dtype="bfloat16" if dtype == "bf16" else "float32",
                 fast_sine=sin == "fast")
    scene = make_scene(n_views=6, img_size=48, grid=64, seed=0)
    train_tab, val_tab = scene_ray_tables(scene, testing_size=1)
    tr = Trainer(cfg, train_tab, val_tab, prior_hm=scene.prior_hm,
                 gt_dsm=scene.hm)
    tr._enter_phase(phase_lib.phase_at(tr.phases, 0))

    steps = max(steps // scan_chunk, 2) * scan_chunk
    tr.rng, k = jax.random.split(tr.rng)
    t0 = time.perf_counter()
    tr.state, _ = tr._multi_step_fn(tr.state, k, scan_chunk)
    jax.block_until_ready(tr.state.params)
    compile_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    for _ in range(steps // scan_chunk):
        tr.rng, k = jax.random.split(tr.rng)
        tr.state, _ = tr._multi_step_fn(tr.state, k, scan_chunk)
    jax.block_until_ready(tr.state.params)
    dt = time.perf_counter() - t0
    return {"batch": batch, "remat": remat, "dtype": dtype, "sin": sin,
            "rays_per_sec": round(batch * steps / dt, 1),
            "compile_s": round(compile_s, 1)}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--points", nargs="*", default=DEFAULT_POINTS)
    p.add_argument("--steps", type=int, default=30)
    p.add_argument("-o", "--output", default=None)
    args = p.parse_args()

    results = []
    for spec in args.points:
        batch, remat, dtype, sin = spec.split(":")
        try:
            r = measure(int(batch), remat, dtype, sin, steps=args.steps)
        except Exception as e:
            r = {"batch": int(batch), "remat": remat, "dtype": dtype,
                 "sin": sin, "error": f"{type(e).__name__}: {e}"[:200]}
        results.append(r)
        print(json.dumps(r), flush=True)

    lines = ["| batch | remat | dtype | sin | rays/s | compile (s) |",
             "|---|---|---|---|---|---|"]
    for r in results:
        val = (f"{r['rays_per_sec']:,.0f}" if "rays_per_sec" in r
               else f"ERROR: {r['error']}")
        lines.append(f"| {r['batch']} | {r['remat']} | {r['dtype']} | "
                     f"{r['sin']} | {val} | {r.get('compile_s', '—')} |")
    table = "\n".join(lines)
    print(table)
    if args.output:
        with open(args.output, "w") as f:
            f.write(table + "\n")


if __name__ == "__main__":
    main()
