#!/usr/bin/env python
"""Measure the Pallas training megakernel vs the XLA trunk segment.

This is the measurement docs/ROOFLINE_r4.md round-4 declined to take: the
roofline's 10x-is-out-of-reach argument rests on an *estimated* 50-60
ms/step for a VMEM-resident fwd+bwd trunk megakernel.  This tool times the
real thing on the real chip at the flagship operating point:

  A. XLA segment  — fwd+bwd (value_and_grad) of the production flax trunk
     (full-batch train-mode BatchNorm, bf16 matmuls, polynomial sin) +
     sigma/color heads, with a synthetic cotangent on x_enc standing in
     for the solar/adjust branches.
  B. Pallas megakernel — ops/pallas_train.trunk_train: same trunk, ghost
     BatchNorm (per-tile stats), recompute-in-backward, bf16 grads.
  C. Forward-only variants of both (the solar pass evaluates the trunk
     under stop_gradient, so its cost is the fwd number).

Usage: python tools/bench_pallas_train.py [--rays 4096] [--samples 96]
           [--iters 30] [--tile 2048] [--json out.json]
"""

import argparse
import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rays", type=int, default=4096)
    ap.add_argument("--samples", type=int, default=96)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--tile", type=int, default=2048)
    ap.add_argument("--width", type=int, default=512)
    ap.add_argument("--json", default=None)
    ap.add_argument("--chain", type=int, default=10,
                    help="iterations chained inside one jit (amortizes the "
                         "axon tunnel's per-dispatch latency, same reason "
                         "the production engine scans 10 steps per dispatch)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from season_nerf_tpu.models.tnerf import TNeRF
    from season_nerf_tpu.models.encodings import positional_encode
    from season_nerf_tpu.ops import pallas_train as pt

    n = args.rays * args.samples
    lw = args.width
    print(f"[bench] backend={jax.default_backend()} n={n} width={lw}")

    model = TNeRF(layer_width=lw, n_layers=8, dtype=jnp.bfloat16,
                  fast_sine=True)
    rng = jax.random.PRNGKey(0)
    x0 = jnp.zeros((256, 3))
    variables = model.init(rng, x0, jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]),
                                             (256, 1)),
                           jnp.zeros((256, 4)), train=False)
    params, stats = variables["params"], variables["batch_stats"]

    key = jax.random.PRNGKey(1)
    pts = jax.random.uniform(key, (n, 3), minval=-1.0, maxval=1.0)
    cot_x = 0.1 * jax.random.normal(jax.random.PRNGKey(2), (n, lw // 2))
    cot_heads = 0.1 * jax.random.normal(jax.random.PRNGKey(3), (n, 4))

    # ---- A: XLA segment --------------------------------------------------
    def xla_fwd(p, st, eps=0.0):
        def run(m, x):
            x_enc, rho_raw, col_raw = m.gnerf.position(x, train=True)
            return x_enc, rho_raw, col_raw
        (x_enc, rho_raw, col_raw), upd = model.apply(
            {"params": p, "batch_stats": st}, pts + eps, method=run,
            mutable=["batch_stats"])
        return x_enc, rho_raw, col_raw, upd

    def xla_loss(p, st, cx, ch, eps=0.0):
        x_enc, rho_raw, col_raw, upd = xla_fwd(p, st, eps)
        s = (jnp.sum(x_enc.astype(jnp.float32) * cx)
             + jnp.sum(rho_raw * ch[:, :1])
             + jnp.sum(col_raw * ch[:, 1:4]))
        return s, upd

    def chained(fn):
        """K data-dependent repetitions inside one jit: each iteration
        perturbs the input points by an iteration-dependent epsilon LARGE
        ENOUGH TO SURVIVE f32 ROUNDING (1e-6 on unit-scale points;
        acc*1e-20 rounded to a no-op, which let XLA hoist the whole body
        out of the loop — the 0.01 ms pallas artifact).  Numerically the
        perturbation is negligible; only one scalar crosses the tunnel —
        same reason the production engine scans 10 steps per dispatch."""
        K = args.chain

        def run(*fargs):
            def body(i, acc):
                eps = (i + 1).astype(jnp.float32) * 1e-6 + acc * 1e-20
                out = fn(eps, *fargs)
                return acc + jax.tree_util.tree_reduce(
                    lambda s, leaf: s + jnp.sum(
                        jnp.asarray(leaf, jnp.float32)), out, 0.0)
            return jax.lax.fori_loop(0, K, body, 0.0)
        return jax.jit(run)

    xla_grad_1 = jax.value_and_grad(xla_loss, has_aux=True, argnums=0)
    xla_grad = chained(lambda eps, p, st, cx, ch: xla_grad_1(p, st, cx, ch,
                                                            eps))
    xla_f = chained(lambda eps, p, st: xla_fwd(p, st, eps))

    # ---- B: pallas megakernel -------------------------------------------
    spec = pt.TrunkSpec(widths=(lw,) * 8 + (lw // 2,), skip_idx=4,
                        pe_dim=pt.PE_PAD, tile=args.tile, fast_sine=True)
    packed = pt.pack_params(variables, spec)
    cot_heads_pad = jnp.concatenate(
        [cot_heads, jnp.zeros((n, pt.HEAD_PAD - 4))], axis=1)

    def encode(x):
        pe = positional_encode(x, 10, True).astype(jnp.bfloat16)
        pad = jnp.zeros(pe.shape[:-1] + (pt.PE_PAD - pe.shape[-1],),
                        jnp.bfloat16)
        return jnp.concatenate([pe, pad], axis=-1)

    def pl_loss(ps, cx, chp, eps=0.0):
        pe = encode(pts + eps)         # PE inside the timed segment, like A
        xenc, heads, _st = pt.trunk_train(spec, False, pe, *ps)
        return (jnp.sum(xenc.astype(jnp.float32) * cx)
                + jnp.sum(heads * chp))

    pl_grad_1 = jax.value_and_grad(pl_loss, argnums=0)
    pl_grad = chained(lambda eps, ps, cx, chp: pl_grad_1(ps, cx, chp, eps))
    pl_f = chained(
        lambda eps, ps: pt.trunk_fwd(spec, (encode(pts + eps),) + tuple(ps),
                                     False))

    def timeit(tag, fn, *a):
        try:
            out = fn(*a)                      # compile
        except Exception as e:
            print(f"[bench] {tag}: FAILED — {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:200]}")
            return None
        jax.block_until_ready(out)
        ts = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(*a))
            ts.append((time.perf_counter() - t0) * 1e3 / args.chain)
        med = statistics.median(ts)
        print(f"[bench] {tag:22s} {med:8.2f} ms   "
              f"(p10 {np.percentile(ts, 10):.2f} / "
              f"p90 {np.percentile(ts, 90):.2f})")
        return med

    results = {"n": n, "width": lw, "tile": args.tile,
               "backend": jax.default_backend()}
    results["chain"] = args.chain
    results["xla_fwd_ms"] = timeit("XLA fwd", xla_f, params, stats)
    results["xla_fwdbwd_ms"] = timeit("XLA fwd+bwd", xla_grad, params,
                                      stats, cot_x, cot_heads)
    results["pallas_fwd_ms"] = timeit("pallas fwd", pl_f, tuple(packed))
    results["pallas_fwdbwd_ms"] = timeit("pallas fwd+bwd", pl_grad,
                                         tuple(packed), cot_x,
                                         cot_heads_pad)
    if results["xla_fwdbwd_ms"] and results["pallas_fwdbwd_ms"]:
        r = results["xla_fwdbwd_ms"] / results["pallas_fwdbwd_ms"]
        print(f"[bench] fwd+bwd speedup: {r:.2f}x")
        results["fwdbwd_speedup"] = r
    if args.json:
        with open(args.json, "w") as f:
            json.dump(results, f, indent=1)
        print(f"[bench] wrote {args.json}")


if __name__ == "__main__":
    main()
