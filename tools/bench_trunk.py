#!/usr/bin/env python
"""Trunk micro-benchmark: XLA vs the fused Pallas kernel, crossed over
{exact, polynomial} sin and {f32, bf16} matmuls.

The round-2 measurement (exact sin, f32) showed the trunk is
transcendental-bound and XLA wins (98 ms vs 113 ms @ 512k points); with the
polynomial sin the VPU pressure drops ~3x, so the balance between HBM
activation traffic (where the Pallas kernel wins) and raw compute needs
re-measuring (VERDICT r2 #3).

  python tools/bench_trunk.py [--n 524288] [--fc 512] [--repeats 20]

Prints one JSON line per configuration.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, x, repeats):
    r = fn(x)
    jax_block(r)
    t0 = time.perf_counter()
    for _ in range(repeats):
        r = fn(x)
    jax_block(r)
    return (time.perf_counter() - t0) / repeats


def jax_block(r):
    import jax
    jax.block_until_ready(r)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=524_288)
    p.add_argument("--fc", type=int, default=512)
    p.add_argument("--repeats", type=int, default=20)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from season_nerf_tpu.models.tnerf import TNeRF
    from season_nerf_tpu.ops.pallas_mlp import FusedTrunk

    pts = jax.random.uniform(jax.random.PRNGKey(0), (args.n, 3),
                             minval=-1, maxval=1)
    interpret = jax.default_backend() == "cpu"

    for fast in (False, True):
        model = TNeRF(layer_width=args.fc, n_classes=4, fast_sine=fast)
        variables = model.init(jax.random.PRNGKey(0), jnp.zeros((2, 3)),
                               jnp.zeros((2, 3)), jnp.zeros((2, 4)),
                               train=False)
        xla_sigma = jax.jit(lambda v, x: model.apply(
            v, x, train=False, method="sigma_only"))
        dt = timeit(lambda x: xla_sigma(variables, x), pts, args.repeats)
        print(json.dumps({"impl": "xla", "sin": "fast" if fast else "exact",
                          "dtype": "f32", "ms": round(dt * 1e3, 2),
                          "pts_per_sec": round(args.n / dt)}), flush=True)

        for dtype_name, dtype in (("f32", jnp.float32),
                                  ("bf16", jnp.bfloat16)):
            ft = FusedTrunk(model, variables, dtype=dtype,
                            interpret=interpret)
            dt = timeit(ft.sigma, pts, args.repeats)
            print(json.dumps({"impl": "pallas",
                              "sin": "fast" if fast else "exact",
                              "dtype": dtype_name, "ms": round(dt * 1e3, 2),
                              "pts_per_sec": round(args.n / dt)}),
                  flush=True)

        # XLA with bf16 trunk matmuls (model dtype knob)
        bmodel = TNeRF(layer_width=args.fc, n_classes=4, fast_sine=fast,
                       dtype=jnp.bfloat16)
        xla_b = jax.jit(lambda v, x: bmodel.apply(
            v, x, train=False, method="sigma_only"))
        dt = timeit(lambda x: xla_b(variables, x), pts, args.repeats)
        print(json.dumps({"impl": "xla", "sin": "fast" if fast else "exact",
                          "dtype": "bf16", "ms": round(dt * 1e3, 2),
                          "pts_per_sec": round(args.n / dt)}), flush=True)


if __name__ == "__main__":
    main()
