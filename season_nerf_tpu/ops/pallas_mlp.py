"""Pallas TPU kernel: the fused T-NeRF SIREN position trunk.

The render/eval hot path evaluates fc1..fc9 of the trunk on millions of
sample points (SURVEY.md §3 hot loops).  Under plain XLA each layer's
[N, 512] activations round-trip HBM between matmuls (~36 KB/point of
traffic); this kernel keeps ALL folded trunk weights (~8 MB f32 / 4 MB bf16)
and the running activation tile resident in VMEM, so HBM sees only the
encoded input once and the 256-wide encoding output once (~1.3 KB/point).

At inference the trunk's BatchNorms are affine in the running statistics,
so each SIREN layer folds to ``sin(x @ W' + b')`` with

    W' = omega * W * (gamma / sqrt(var + eps))
    b' = (omega * b - mean) * (gamma / sqrt(var + eps)) + beta

(:mod:`season_nerf_tpu.models.siren` semantics; fc1 has no norm).  The fold
happens host-side once per checkpoint; the kernel is pure matmul+sin on the
MXU/VPU.

Not wired into the production render path: measured on the real chip, XLA
wins (below), so the renderer keeps the plain flax module; training does
too (BN batch statistics need the full batch).  ``tools/bench_trunk.py``
re-measures the comparison at any operating point.

Measured on a single v5e chip (512k points, sigma path): XLA 98 ms, this
kernel 113 ms — the trunk is *transcendental-bound* (2.4G sin evaluations
dominate over both the matmul FLOPs and the activation traffic), so the
VMEM-residency win does not materialize on this part count and XLA remains
the default path.  The kernel is kept as the building block for batched
multi-query rendering where weight reuse across many simultaneous models
would change the balance.
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from season_nerf_tpu.models.encodings import positional_encode
from season_nerf_tpu.ops import fast_math

PE_DIM = 63           # 3 * (2*10 + 1) extended positional encoding
PE_PAD = 64           # padded contraction dim
CAT_PAD = 576         # padded fc5 input (512 + 63 -> 576)
TILE = 512            # rows per grid step


def _fold_layer(layer_params, omega=30.0):
    """One SineLayer -> (omega*W, omega*b); the BN affine is folded by the
    caller, which owns the running-stats lookup."""
    W = np.asarray(layer_params["linear"]["kernel"], np.float64)
    b = np.asarray(layer_params["linear"]["bias"], np.float64)
    return omega * W, omega * b


def fold_trunk(variables, use_norm=True, dtype=jnp.float32) -> Dict:
    """variables (flax) -> padded folded weight dict for the kernel."""
    params = variables["params"]["gnerf"]
    stats = variables.get("batch_stats", {}).get("gnerf", {})

    def folded(name, has_norm):
        W, b = _fold_layer(params[name])
        if has_norm and name in stats:
            mean = np.asarray(stats[name]["norm"]["mean"], np.float64)
            var = np.asarray(stats[name]["norm"]["var"], np.float64)
        else:
            mean = np.zeros(W.shape[1])
            var = np.ones(W.shape[1])
        if has_norm and "norm" in params[name]:
            gam = np.asarray(params[name]["norm"]["scale"], np.float64)
            bet = np.asarray(params[name]["norm"]["bias"], np.float64)
        else:
            gam = np.ones(W.shape[1])
            bet = np.zeros(W.shape[1])
        s = gam / np.sqrt(var + 1e-5)
        Wf = W * s[None, :]
        bf = (b - mean) * s + bet
        return Wf, bf

    out = {}
    specs = [("fc1", False), ("fc2", use_norm), ("fc3", use_norm),
             ("fc4", use_norm), ("fc5", use_norm), ("fc6", use_norm),
             ("fc7", use_norm), ("fc8", use_norm), ("fc9", use_norm)]
    for name, hn in specs:
        W, b = folded(name, hn)
        if name == "fc1":
            Wp = np.zeros((PE_PAD, W.shape[1]))
            Wp[:W.shape[0]] = W
            W = Wp
        if name == "fc5":
            Wp = np.zeros((CAT_PAD, W.shape[1]))
            Wp[:W.shape[0]] = W
            W = Wp
        out[name + "_w"] = jnp.asarray(W, dtype)
        out[name + "_b"] = jnp.asarray(b, jnp.float32)
    return out


def _trunk_kernel(pe_ref,
                  w1, b1, w2, b2, w3, b3, w4, b4, w5, b5,
                  w6, b6, w7, b7, w8, b8, w9, b9,
                  out_ref, *, fast_sine: bool = False):
    x = pe_ref[:]
    # range-reduced polynomial sin (ops/fast_math.py semantics); the raw
    # jnp ops lower fine inside pallas — no custom_jvp needed at inference
    sin = (lambda v: fast_math._poly_sin(fast_math._reduced(v))) \
        if fast_sine else jnp.sin

    def layer(h, w, b):
        return sin(jnp.dot(h.astype(w.dtype), w[:],
                           preferred_element_type=jnp.float32) + b[:])

    h = layer(x, w1, b1)
    h = layer(h, w2, b2)
    h = layer(h, w3, b3)
    h = layer(h, w4, b4)
    cat = jnp.concatenate([h, x], axis=-1)     # [T, 512 + 64] = [T, 576]
    h = layer(cat, w5, b5)
    h = layer(h, w6, b6)
    h = layer(h, w7, b7)
    h = layer(h, w8, b8)
    out_ref[:] = layer(h, w9, b9)


@functools.partial(jax.jit, static_argnums=(2, 3))
def trunk_apply(pe_padded, folded: Dict, interpret: bool = False,
                fast_sine: bool = False):
    """[N, 64] padded PE -> [N, 256] x_enc via the fused kernel.
    N must be a multiple of TILE."""
    N = pe_padded.shape[0]
    width = folded["fc2_w"].shape[1]
    enc = folded["fc9_w"].shape[1]
    grid = (N // TILE,)

    def w_spec(shape):
        return pl.BlockSpec(shape, lambda i: (0, 0),
                            memory_space=pltpu.VMEM)

    def b_spec(shape):
        return pl.BlockSpec(shape, lambda i: (0,),
                            memory_space=pltpu.VMEM)

    in_specs = [pl.BlockSpec((TILE, PE_PAD), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)]
    args = [pe_padded]
    for name, w_in in [("fc1", PE_PAD), ("fc2", width), ("fc3", width),
                       ("fc4", width), ("fc5", CAT_PAD), ("fc6", width),
                       ("fc7", width), ("fc8", width), ("fc9", width)]:
        w = folded[name + "_w"]
        b = folded[name + "_b"]
        in_specs.append(w_spec(w.shape))
        in_specs.append(b_spec(b.shape))
        args.extend([w, b])

    return pl.pallas_call(
        functools.partial(_trunk_kernel, fast_sine=fast_sine),
        out_shape=jax.ShapeDtypeStruct((N, enc), jnp.float32),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((TILE, enc), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*args)


def encode_points(x):
    """[N, 3] -> [N, 64] zero-padded extended PE (matches GNeRF.encode_x
    input, models/tnerf.py)."""
    pe = positional_encode(x, 10, True)
    pad = jnp.zeros(pe.shape[:-1] + (PE_PAD - pe.shape[-1],), pe.dtype)
    return jnp.concatenate([pe, pad], axis=-1)


class FusedTrunk:
    """Convenience wrapper: fold once, evaluate x_enc / sigma fast.

    Heads (sigma, color, solar, seasonal) stay in XLA — they are a few
    percent of the FLOPs; the trunk dominates.
    """

    def __init__(self, model, variables, dtype=jnp.float32,
                 interpret: bool = None, fast_sine: bool = None):
        self.model = model
        self.variables = variables
        if interpret is None:
            interpret = jax.default_backend() == "cpu"
        self.interpret = interpret
        # default: match whatever sin the model itself uses
        self.fast_sine = (bool(getattr(model, "fast_sine", False))
                          if fast_sine is None else fast_sine)
        self.folded = fold_trunk(variables, use_norm=model.use_norm,
                                 dtype=dtype)
        p = variables["params"]["gnerf"]
        self.w_sigma = jnp.asarray(p["fc10_sigma"]["kernel"])
        self.b_sigma = jnp.asarray(p["fc10_sigma"]["bias"])
        self.w_col = jnp.asarray(p["fc10_col"]["kernel"])
        self.b_col = jnp.asarray(p["fc10_col"]["bias"])

    def x_enc(self, pts):
        n = pts.shape[0]
        pad = (-n) % TILE
        pe = encode_points(jnp.concatenate(
            [pts, jnp.zeros((pad, 3), pts.dtype)], 0) if pad else pts)
        enc = trunk_apply(pe, self.folded, self.interpret, self.fast_sine)
        return enc[:n] if pad else enc

    def sigma(self, pts):
        """softplus(rho_raw): the sigma_only fast path (exact solar /
        DSM extraction)."""
        enc = self.x_enc(pts)
        return jax.nn.softplus(enc @ self.w_sigma + self.b_sigma)

    def sigma_color(self, pts) -> Tuple[jnp.ndarray, jnp.ndarray]:
        enc = self.x_enc(pts)
        rho = jax.nn.softplus(enc @ self.w_sigma + self.b_sigma)
        col_raw = enc @ self.w_col + self.b_col
        return rho, col_raw
