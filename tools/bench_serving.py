#!/usr/bin/env python
"""Serving throughput: full-quality render rays/s on the current device.

Measures the inference path the regional eval and render CLIs use
(Renderer._full_chunk: stratified sampling + full T-NeRF + transmittance
composite fused in one XLA program per chunk), at the reference's quality
settings (96 samples/ray, 512x512 frames; chunk 5120 — the
measured-fastest v5e dispatch size, see Config.chunk).

  python tools/bench_serving.py [--size 512] [--chunk 5120] [--fc 512]

Prints one JSON line {"metric": "render_rays_per_sec", ...}.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--chunk", type=int, default=5_120)
    p.add_argument("--fc", type=int, default=512)
    p.add_argument("--n_samples", type=int, default=96)
    p.add_argument("--repeats", type=int, default=3)
    p.add_argument("--fast_sine", action="store_true",
                   help="polynomial sin activation (ops/fast_math.py)")
    p.add_argument("--bf16", action="store_true",
                   help="bfloat16 matmul compute dtype for the trunk")
    p.add_argument("--mesh", type=int, default=0,
                   help="shard rays over this many devices (0 = no mesh)")
    p.add_argument("--fast_render", type=int, nargs=2, default=None,
                   metavar=("N_COARSE", "N_FINE"),
                   help="depth-guided fast rendering: sigma-only coarse "
                        "pass finds the surface window, full network runs "
                        "only on N_FINE window samples "
                        "(render_chunk_outputs_fast)")
    p.add_argument("--cpu", action="store_true",
                   help="force the virtual CPU platform with --mesh devices "
                        "(mesh-correctness runs; the axon TPU plugin ignores "
                        "JAX_PLATFORMS, so this uses the conftest recipe)")
    args = p.parse_args()

    if args.cpu:
        import re
        flag = f"--xla_force_host_platform_device_count={max(args.mesh, 1)}"
        flags = os.environ.get("XLA_FLAGS", "")
        flags, n = re.subn(
            r"--xla_force_host_platform_device_count=\d+", flag, flags)
        os.environ["XLA_FLAGS"] = flags if n else f"{flags} {flag}".strip()
    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from season_nerf_tpu.models.tnerf import TNeRF
    from season_nerf_tpu.render.renderer import Renderer

    model = TNeRF(layer_width=args.fc, n_classes=4,
                  fast_sine=args.fast_sine,
                  dtype=jnp.bfloat16 if args.bf16 else None)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((2, 3)),
                           jnp.zeros((2, 3)), jnp.zeros((2, 4)), train=False)
    mesh = None
    if args.mesh > 1:
        from season_nerf_tpu.parallel.mesh import make_mesh
        mesh = make_mesh(args.mesh)
    r = Renderer(model, variables, n_samples=args.n_samples, chunk=args.chunk,
                 mesh=mesh, fast_render=args.fast_render)

    # warmup/compile
    r.render_img((70.0, 40.0), (45.0, 180.0), 0.5, args.size)
    n_rays = args.size * args.size
    t0 = time.perf_counter()
    for i in range(args.repeats):
        r.render_img((70.0, 40.0 + i), (45.0, 180.0), 0.5, args.size)
    dt = time.perf_counter() - t0
    rays_per_sec = n_rays * args.repeats / dt
    print(json.dumps({
        "metric": "render_rays_per_sec",
        "value": round(rays_per_sec, 1),
        "unit": "rays/s",
        "config": f"{args.size}x{args.size}x{args.n_samples}, "
                  f"chunk {args.chunk}, fc {args.fc}"
                  f"{', fast_sine' if args.fast_sine else ''}"
                  f"{', bf16' if args.bf16 else ''}"
                  f"{f', mesh {args.mesh}' if args.mesh > 1 else ''}"
                  + (f", fast_render {args.fast_render[0]}+"
                     f"{args.fast_render[1]}" if args.fast_render else ""),
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
