#!/usr/bin/env python
"""Export the trained render kernel as a portable StableHLO artifact.

A deployment capability the reference has no equivalent of: the
serving-side render function — ``Renderer._full_chunk`` semantics
(per-ray rendered color, raw shadow visibility, expected surface height,
accumulated opacity) with the trained weights baked in as constants — is
serialized with ``jax.export`` into one version-stable blob.  Any JAX
runtime (CPU / GPU / TPU server, different process, **no season_nerf_tpu
import**) deserializes it and calls it on ``[chunk, 3]`` ray arrays:

  python tools/export_render.py <model_dir> -o render.jaxexp
  python tools/export_render.py <model_dir> --check        # round-trip A/B

The artifact is a fixed-``chunk`` single-device program (chunking and any
mesh sharding stay host-side, exactly like the live Renderer's driver
loop); a JSON manifest with the call contract is written next to it.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_render_fn(model, variables, n_samples: int, classic_solar: bool,
                    fast_render=None):
    """The pure per-chunk render function with weights closed over (they
    export as constants).  Delegates to the live renderer's own
    ``render_chunk_outputs`` (render/renderer.py) — literally one source
    of truth for the output contract, so the exported artifact cannot
    drift from ``Renderer._full_chunk``.  ``fast_render=(n_coarse,
    n_fine)`` exports the depth-guided fast kernel instead (same output
    contract; qualify with tools/fast_render_ab.py first)."""
    from season_nerf_tpu.render.renderer import (render_chunk_outputs,
                                                 render_chunk_outputs_fast)

    def render_chunk(tops, bots, sun, t4):
        if fast_render is not None:
            return render_chunk_outputs_fast(
                model, variables, tops, bots, sun, t4,
                n_coarse=fast_render[0], n_fine=fast_render[1],
                classic_solar=classic_solar)
        return render_chunk_outputs(model, variables, tops, bots, sun, t4,
                                    n_samples=n_samples,
                                    classic_solar=classic_solar)

    return render_chunk


def export_render(model, variables, n_samples: int, chunk: int,
                  classic_solar: bool = False, use_hsluv: bool = False,
                  fast_render=None):
    """Serialize the render kernel; returns (blob: bytes, manifest: dict)."""
    import jax
    import jax.numpy as jnp
    from jax import export as jax_export

    fn = build_render_fn(model, variables, n_samples, classic_solar,
                         fast_render=fast_render)
    f32 = jnp.float32
    args = (jax.ShapeDtypeStruct((chunk, 3), f32),
            jax.ShapeDtypeStruct((chunk, 3), f32),
            jax.ShapeDtypeStruct((chunk, 3), f32),
            jax.ShapeDtypeStruct((chunk, 4), f32))
    exp = jax_export.export(jax.jit(fn))(*args)
    manifest = {
        "format": "jax.export StableHLO",
        "call": "f(tops[chunk,3], bots[chunk,3], sun[chunk,3], t4[chunk,4])"
                " -> {rendered[chunk,3], shadow_raw[chunk],"
                " height[chunk], ps_sum[chunk]}",
        "chunk": chunk,
        "n_samples": n_samples,
        "fast_render": list(fast_render) if fast_render else None,
        "classic_solar": classic_solar,
        "dtype": "float32",
        # a use_HSLuv-trained model's color head emits normalized HSLuv
        # (channels h/360, s/100, l/100); the live Renderer converts to
        # sRGB host-side (utils/hsluv.hsluv_normalized_to_rgb) — a
        # consumer of this artifact must do the same
        "color_space": "hsluv-normalized" if use_hsluv else "srgb",
        "note": "single-device program; drive chunking/sharding host-side",
    }
    return exp.serialize(), manifest


def load_exported(path: str):
    """Deserialize an exported artifact -> callable (no framework import
    needed beyond jax)."""
    from jax import export as jax_export
    with open(path, "rb") as f:
        return jax_export.deserialize(f.read())


def main():
    p = argparse.ArgumentParser()
    p.add_argument("model_dir")
    p.add_argument("-o", "--output", default=None,
                   help="artifact path (default <model_dir>/render.jaxexp)")
    p.add_argument("--chunk", type=int, default=None,
                   help="rays per call (default: the run's --chunk)")
    p.add_argument("--check", action="store_true",
                   help="round-trip the blob and compare vs the live "
                        "renderer on random rays")
    p.add_argument("--fast_render", type=int, nargs=2, default=None,
                   metavar=("N_COARSE", "N_FINE"),
                   help="export the depth-guided fast kernel instead of "
                        "the exact uniform sampler")
    args = p.parse_args()

    import numpy as np
    import jax
    from season_nerf_tpu.render.loading import load_model_dir

    loaded = load_model_dir(args.model_dir)
    cfg, model, variables = loaded.cfg, loaded.model, loaded.variables

    chunk = args.chunk or cfg.chunk
    blob, manifest = export_render(model, variables, cfg.n_samples, chunk,
                                   classic_solar=cfg.Solar_Type_2,
                                   use_hsluv=cfg.use_HSLuv,
                                   fast_render=args.fast_render)
    if cfg.use_HSLuv:
        print("note: model trained in HSLuv — the artifact's 'rendered' "
              "output is normalized HSLuv (see manifest color_space); "
              "convert to sRGB host-side")
    out = args.output or os.path.join(args.model_dir, "render.jaxexp")
    with open(out, "wb") as f:
        f.write(blob)
    with open(out + ".json", "w") as f:
        json.dump(manifest, f, indent=2)
    print(f"wrote {out} ({len(blob) / 1e6:.1f} MB) + manifest")

    if args.check:
        re = load_exported(out)
        rng = np.random.default_rng(0)
        tops = np.concatenate([rng.uniform(-1, 1, (chunk, 2)),
                               np.ones((chunk, 1))], 1).astype(np.float32)
        bots = np.concatenate([tops[:, :2], -np.ones((chunk, 1))],
                              1).astype(np.float32)
        sun = np.broadcast_to(np.array([0.3, 0.2, 0.93], np.float32),
                              (chunk, 3)).copy()
        t4 = np.broadcast_to(np.array([1, 0, 1, 0], np.float32),
                             (chunk, 4)).copy()
        got = re.call(tops, bots, sun, t4)
        fn = build_render_fn(model, variables, cfg.n_samples,
                             cfg.Solar_Type_2,
                             fast_render=args.fast_render)
        want = jax.jit(fn)(tops, bots, sun, t4)
        for k in want:
            np.testing.assert_allclose(np.asarray(got[k]),
                                       np.asarray(want[k]),
                                       rtol=2e-5, atol=2e-5)
        print("round-trip check passed: exported == live renderer")


if __name__ == "__main__":
    main()
