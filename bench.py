"""Benchmark: training-step throughput of the flagship Season-NeRF config.

Measures rays/sec through the full jit-compiled training step (512-wide
8-layer SIREN trunk, 96 samples/ray, color + solar rays — the reference's
training budget, opt2.py:66-92) on whatever accelerator jax selects (the
driver runs this on one real TPU chip).

Baseline: a *nominal* 5,120 camera rays/s (10 steps/s) for the PyTorch
reference — a deliberately reference-favorable ceiling: it implies ~17
TFLOP/s sustained fp32, above the peak of the GPUs its pinned stack
(pytorch 1.9 + cu102) targets, so every vs_baseline printed here is a
lower bound on the true speedup. Full derivation + a same-hardware CPU
measurement (ours 2.17x the reference per step on this host's CPU) in
BASELINE.md "Measured baseline".

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Self-watchdog: the tunneled TPU's compile/execute RPC can wedge
permanently (docs/DESIGN.md "Operational robustness" — the client blocks
forever; killing the client frees the backend).  The measurement therefore
runs in a child process with a stall timeout and retries, so one wedged
RPC costs a retry instead of hanging the driver.  BENCH_TIMEOUT /
BENCH_ATTEMPTS tune it; BENCH_ATTEMPTS=1 with a huge BENCH_TIMEOUT
effectively disables it.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REF_RAYS_PER_SEC = 5120.0   # nominal reference throughput (see docstring)


def _watchdogged() -> int:
    """Run the measurement in a child with a stall timeout + retries."""
    import subprocess
    attempts = int(os.environ.get("BENCH_ATTEMPTS", "3"))
    timeout = float(os.environ.get("BENCH_TIMEOUT", "1200"))
    env = dict(os.environ, BENCH_CHILD="1")
    for i in range(attempts):
        try:
            r = subprocess.run([sys.executable, os.path.abspath(__file__)],
                               env=env, timeout=timeout)
            if r.returncode == 0:
                return 0
            print(f"bench attempt {i + 1}/{attempts} exited "
                  f"rc={r.returncode}", file=sys.stderr)
        except subprocess.TimeoutExpired:
            # killing the stalled client frees the wedged backend
            print(f"bench attempt {i + 1}/{attempts} stalled after "
                  f"{timeout:.0f}s; killed the client", file=sys.stderr)
        if i + 1 < attempts:
            time.sleep(30.0)    # let the freed backend settle
    return 1


def main():
    import jax
    import numpy as np
    from season_nerf_tpu.config import Config
    from season_nerf_tpu.data.synthetic import make_scene, scene_ray_tables
    from season_nerf_tpu.train.engine import Trainer
    from season_nerf_tpu.train import phases as phase_lib

    # flagship training config (reference defaults, opt2.py:66-92) with a
    # TPU-friendly batch: 4096 rays/step is the throughput sweet spot, and
    # the largest batch the current TPU toolchain reliably compiles for the
    # fully-fused train step (5k-8k+ trips a register-allocator RET_CHECK
    # in the backward pass unless remat_trunk="full").  The polynomial sin
    # activation is on by default (the measured 2x lever, qualified in
    # docs/FAST_SINE_PARITY.md); BENCH_FAST_SIN=0 restores exact sin.
    batch = int(os.environ.get("BENCH_BATCH", 4096))
    steps = int(os.environ.get("BENCH_STEPS", 30))
    remat = os.environ.get("BENCH_REMAT", "")      # "", "full", or "dots"
    if remat in ("0", "1"):
        remat = "full" if remat == "1" else ""
    # compute dtype: bfloat16 trunk matmuls are the qualified production
    # operating point (+29% over f32 under the polynomial sin; full-budget
    # 50k-step quality parity in docs/QUALITY_r3.md, 5k-step 2x2 arms in
    # docs/FAST_SINE_PARITY.md).  BENCH_DTYPE=float32 restores f32.
    dtype = os.environ.get("BENCH_DTYPE", "bfloat16")
    cfg = Config(max_train_steps=50_000, n_samples=96, batch_size=batch,
                 fc_units=512, n_saves=0, logs_dir="", jump_start=True,
                 remat_trunk=remat, compute_dtype=dtype,
                 fast_sine=os.environ.get("BENCH_FAST_SIN", "1") == "1",
                 # VMEM-resident fused trunk (ghost BN; ops/pallas_train.py)
                 pallas_trunk=os.environ.get("BENCH_PALLAS", "0") == "1")
    # persistent XLA compile cache: repeat benches skip the (remote,
    # multi-minute, occasionally flaky) compile of the fused train step
    cfg.enable_compile_cache()

    scene = make_scene(n_views=6, img_size=48, grid=64, seed=0)
    train_tab, val_tab = scene_ray_tables(scene, testing_size=1)
    tr = Trainer(cfg, train_tab, val_tab, prior_hm=scene.prior_hm,
                 gt_dsm=scene.hm)

    phase = phase_lib.phase_at(tr.phases, 0)
    tr._enter_phase(phase)

    # measure the production path: the fused multi-step scan (one device
    # dispatch per `chunk` optimizer steps, Trainer.run's scan_chunk)
    chunk = int(os.environ.get("BENCH_SCAN_CHUNK", 10))
    steps = max(steps // chunk, 2) * chunk
    # warmup / compile
    tr.rng, k = jax.random.split(tr.rng)
    tr.state, _ = tr._multi_step_fn(tr.state, k, chunk)
    jax.block_until_ready(tr.state.params)

    t0 = time.perf_counter()
    for _ in range(steps // chunk):
        tr.rng, k = jax.random.split(tr.rng)
        tr.state, _ = tr._multi_step_fn(tr.state, k, chunk)
    jax.block_until_ready(tr.state.params)
    dt = time.perf_counter() - t0

    rays_per_sec = batch * steps / dt
    print(json.dumps({
        "metric": "train_rays_per_sec",
        "value": round(rays_per_sec, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_sec / REF_RAYS_PER_SEC, 2),
    }))


if __name__ == "__main__":
    if os.environ.get("BENCH_CHILD") == "1":
        main()
    else:
        sys.exit(_watchdogged())
