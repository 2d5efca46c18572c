"""Op-level profile of the production train step (the xplane recipe from
docs/DESIGN.md item 7, packaged as a tool).

Builds the bench.py flagship trainer (phase 1: prior + Barron + solar), emits
a jax.profiler trace of a few steps, parses the xplane proto, and prints the
top ops by total device time with their HLO category, achieved FLOP/s and
bytes/s — the table that drove the round-3 one-hot / per-ray rewrites.

Usage: python tools/profile_step.py [--steps 8] [--batch 4096] [--top 30]
Env mirrors bench.py: BENCH_DTYPE / BENCH_FAST_SIN / BENCH_REMAT.
"""

import argparse
import glob
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_trainer(batch):
    from season_nerf_tpu.config import Config
    from season_nerf_tpu.data.synthetic import make_scene, scene_ray_tables
    from season_nerf_tpu.train.engine import Trainer

    remat = os.environ.get("BENCH_REMAT", "")
    cfg = Config(max_train_steps=50_000, n_samples=96, batch_size=batch,
                 fc_units=512, n_saves=0, logs_dir="", jump_start=True,
                 remat_trunk=remat,
                 compute_dtype=os.environ.get("BENCH_DTYPE", "bfloat16"),
                 fast_sine=os.environ.get("BENCH_FAST_SIN", "1") == "1")
    cfg.enable_compile_cache()
    scene = make_scene(n_views=6, img_size=48, grid=64, seed=0)
    train_tab, val_tab = scene_ray_tables(scene, testing_size=1)
    return Trainer(cfg, train_tab, val_tab, prior_hm=scene.prior_hm,
                   gt_dsm=scene.hm)


def parse_xplane(trace_dir, top=30):
    """Aggregate per-op device time from the captured xplane protos."""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    # jax.profiler.trace appends a new plugins/profile/<timestamp>/ session
    # per capture; parse ONLY the newest one — aggregating the glob over
    # every accumulated session silently reports stale results (round-4
    # bug: two different programs "profiled" identically to 0.01 ms)
    sessions = sorted(glob.glob(os.path.join(
        trace_dir, "plugins", "profile", "*")))
    root = sessions[-1] if sessions else trace_dir
    paths = glob.glob(os.path.join(root, "**", "*.xplane.pb"),
                      recursive=True)
    assert paths, f"no xplane.pb under {root}"
    agg = defaultdict(lambda: [0.0, 0, 0.0, 0.0, ""])  # ps, count, flops, bytes, cat

    for path in paths:
        xspace = xplane_pb2.XSpace()
        with open(path, "rb") as f:
            xspace.ParseFromString(f.read())
        for plane in xspace.planes:
            if "/device:TPU" not in plane.name and "TPU" not in plane.name:
                continue
            stat_md = {k: v.name for k, v in plane.stat_metadata.items()}
            ev_md = {k: v for k, v in plane.event_metadata.items()}
            for line in plane.lines:
                # sync compute ops only: async copies (VMEM prefetches)
                # overlap compute and would double-count wall time
                if line.name != "XLA Ops":
                    continue
                for ev in line.events:
                    md = ev_md.get(ev.metadata_id)
                    name = md.name if md else str(ev.metadata_id)
                    dur = ev.duration_ps
                    rec = agg[name]
                    rec[0] += dur
                    rec[1] += 1
                    for st in list(ev.stats) + (list(md.stats) if md else []):
                        sname = stat_md.get(st.metadata_id, "")
                        val = (st.int64_value or st.uint64_value
                               or st.double_value)
                        if sname == "flops":
                            rec[2] = max(rec[2], float(val) or 0.0)
                        elif sname in ("bytes accessed", "bytes_accessed"):
                            rec[3] = max(rec[3], float(val) or 0.0)
                        elif sname == "hlo_category":
                            rec[4] = st.str_value or stat_md.get(
                                st.ref_value, rec[4])
    total_ps = sum(r[0] for r in agg.values())
    rows = sorted(agg.items(), key=lambda kv: -kv[1][0])[:top]
    print(f"{'op':60s} {'cat':18s} {'ms':>8s} {'%':>5s} {'n':>5s} "
          f"{'TF/s':>7s} {'GB/s':>7s}")
    cat_ps = defaultdict(float)
    for name, (ps, n, flops, nbytes, cat) in agg.items():
        cat_ps[cat or "?"] += ps
    for name, (ps, n, flops, nbytes, cat) in rows:
        sec = ps * 1e-12
        tfs = (flops * n / sec / 1e12) if sec and flops else 0.0
        gbs = (nbytes * n / sec / 1e9) if sec and nbytes else 0.0
        print(f"{name[:60]:60s} {cat[:18]:18s} {ps * 1e-9:8.2f} "
              f"{100 * ps / max(total_ps, 1):5.1f} {n:5d} {tfs:7.1f} {gbs:7.1f}")
    print("\nby category:")
    for cat, ps in sorted(cat_ps.items(), key=lambda kv: -kv[1]):
        print(f"  {cat:24s} {ps * 1e-9:9.2f} ms  {100 * ps / max(total_ps, 1):5.1f}%")
    print(f"\ntotal device time: {total_ps * 1e-9:.2f} ms")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--trace_dir", default="/tmp/profile_step")
    ap.add_argument("--parse_only", action="store_true",
                    help="skip capture; parse an existing trace_dir")
    args = ap.parse_args()

    if not args.parse_only:
        import jax
        tr = build_trainer(args.batch)
        from season_nerf_tpu.train import phases as phase_lib
        tr._enter_phase(phase_lib.phase_at(tr.phases, 0))
        # warm up (compile outside the trace)
        tr.rng, k = jax.random.split(tr.rng)
        tr.state, _ = tr._step_fn(tr.state, k)
        jax.block_until_ready(tr.state.params)
        tr.profile_steps(args.trace_dir, n_steps=args.steps)
    parse_xplane(args.trace_dir, top=args.top)


if __name__ == "__main__":
    main()
