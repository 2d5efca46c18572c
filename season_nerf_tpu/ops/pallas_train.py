"""Pallas TPU *training* megakernel for the T-NeRF SIREN trunk (fwd + bwd).

Why this exists (docs/ROOFLINE_r4.md): the production train step is
HBM-bandwidth bound — XLA materializes every inter-layer activation and an
f32 [N, 512] gradient per trunk layer, so the fusions run at 80-86% of the
v5e's 819 GB/s while the MXU idles at 39%.  The structural fix is to keep
the whole trunk VMEM-resident: weights stay on-chip across the batch, the
backward pass *recomputes* the forward tile-by-tile instead of reading
stored activations, and HBM sees only the encoded input, the trunk outputs,
and the (tiny) weight gradients.  Estimated bound ~50-60 ms/step vs the
measured 110 ms — the difference between 7.2x and >10x of the reference
budget (BASELINE.json north star).

The one semantic change — GHOST BATCH NORM
------------------------------------------
The reference trunk batch-normalizes each SIREN pre-activation over the
full batch (misc.py:169-175; 393k points at the flagship operating point).
Full-batch statistics serialize the layers across the whole batch — layer
k+1 cannot start until layer k has seen every point — which forces exactly
the per-layer HBM round-trips this kernel removes.  Here each grid tile
(``tile`` rows, default 2048) normalizes with ITS OWN statistics ("ghost
batch norm", Hoffer et al. 2017 — the standard large-batch practice).
Running statistics are still tracked globally (mean of tile means /
variances) so eval-mode behavior keeps the reference semantics.  This is
an arithmetic change to training and is qualified by a full-budget quality
A/B before becoming a default (docs/QUALITY_r5.md).

Also folded into the same A/B: the backward matmuls consume bfloat16
gradients (XLA's autodiff keeps them f32 — that f32 stream is the single
largest byte mover in the roofline), and the pre-activation is kept in f32
registers instead of round-tripping through a bf16 buffer.

Scope: trunk fc1..fc9 + the sigma/color output heads, which carry ~70% of
the step's FLOPs.  The solar/adjust branches consume the x_enc this kernel
emits and contribute their cotangent through ``d_xenc``.

Layout / shapes (flagship): pe [N, 64] bf16 (zero-padded 63-dim extended
PE), fc1..fc8 512-wide (skip concat at fc5: w5 is [576, 512], rows 512:576
multiply the PE), fc9 256-wide, heads packed into one [256, 8] matrix
(col 0 sigma_raw, 1:4 col_raw, 4:8 zero).  N must be a multiple of
``tile``.

Reference for the math being reproduced: misc.py:148-194 (SineLayer),
G_NeRF.py:80-91 (trunk + skip), T_NeRF_net_v2.py:75-105 (heads).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from season_nerf_tpu.ops import fast_math

OMEGA = 30.0
BN_EPS = 1e-5
PE_PAD = 64          # padded extended-PE input width (63 -> 64)
HEAD_PAD = 8         # sigma(1) + color(3) packed + 4 zero lanes


@dataclasses.dataclass(frozen=True)
class TrunkSpec:
    """Static trunk structure (hashable: jit/custom_vjp static arg).

    widths[i] is layer i's output width; layer 0 reads the PE, the skip
    layer additionally reads the PE through its tail rows.  has_bn mirrors
    the reference: every layer except the first (G_NeRF.py:42-50)."""
    widths: Tuple[int, ...] = (512,) * 8 + (256,)
    skip_idx: int = 4           # 0-based: fc5
    pe_dim: int = PE_PAD
    tile: int = 2048
    fast_sine: bool = True
    grad_dtype: str = "bfloat16"   # dtype of the backward matmul operands;
    #                                bf16 is the production choice (part of
    #                                the ghost-BN quality A/B), f32 the
    #                                tight-tolerance test / fallback mode
    act_dtype: str = "bfloat16"    # inter-layer activation storage dtype
    #                                (production bf16, matching the flax
    #                                trunk's explicit bf16 boundaries;
    #                                f32 for tight-tolerance testing)

    @property
    def n_layers(self):
        return len(self.widths)

    @property
    def has_bn(self):
        return tuple(i > 0 for i in range(self.n_layers))

    @property
    def in_dims(self):
        dims = []
        for i, w in enumerate(self.widths):
            if i == 0:
                dims.append(self.pe_dim)
            elif i == self.skip_idx:
                dims.append(self.widths[i - 1] + self.pe_dim)
            else:
                dims.append(self.widths[i - 1])
        return tuple(dims)

    @property
    def enc_width(self):
        return self.widths[-1]

    @property
    def stat_width(self):
        return max(self.widths)

    @property
    def n_bn(self):
        return sum(self.has_bn)


def _sin(spec):
    if spec.fast_sine:
        return lambda v: fast_math._poly_sin(fast_math._reduced(v))
    return jnp.sin


def _cos(spec):
    if spec.fast_sine:
        return lambda v: fast_math._poly_sin(
            fast_math._reduced(v + fast_math._HALF_PI))
    return jnp.cos


def pack_params(variables, spec: TrunkSpec, n_classes_unused=None):
    """flax variables -> flat list of kernel parameter arrays.

    Order per layer: w (bf16, [in, out], fc1/fc5 zero-row-padded), b (f32
    [1, out]); + gamma, beta (f32 [1, out]) when the layer has BN.  Then
    heads wh (bf16 [enc, 8]) and bh (f32 [1, 8]).

    The SIREN omega_0 = 30 pre-activation scale is FOLDED into w and b
    here (z = omega*(h@w + b) = h@(omega w) + omega b): the kernel then
    skips two whole-tile vector multiplies per layer, which matters
    because the kernel is VPU-bound (tools/bench_pallas_train.py)."""
    p = variables["params"]["gnerf"]
    out = []
    for i in range(spec.n_layers):
        name = f"fc{i + 1}"
        W = OMEGA * np.asarray(p[name]["linear"]["kernel"], np.float32)
        b = OMEGA * np.asarray(p[name]["linear"]["bias"], np.float32)
        if W.shape[0] != spec.in_dims[i]:          # pad PE rows 63 -> 64
            Wp = np.zeros((spec.in_dims[i], W.shape[1]), np.float32)
            Wp[:W.shape[0]] = W
            W = Wp
        out.append(jnp.asarray(W, jnp.bfloat16))
        out.append(jnp.asarray(b[None, :], jnp.float32))
        if spec.has_bn[i]:
            g = np.asarray(p[name]["norm"]["scale"], np.float32)
            be = np.asarray(p[name]["norm"]["bias"], np.float32)
            out.append(jnp.asarray(g[None, :], jnp.float32))
            out.append(jnp.asarray(be[None, :], jnp.float32))
    ws = np.asarray(p["fc10_sigma"]["kernel"], np.float32)    # [enc, 1]
    bs = np.asarray(p["fc10_sigma"]["bias"], np.float32)
    wc = np.asarray(p["fc10_col"]["kernel"], np.float32)      # [enc, 3]
    bc = np.asarray(p["fc10_col"]["bias"], np.float32)
    wh = np.zeros((spec.enc_width, HEAD_PAD), np.float32)
    wh[:, 0:1] = ws
    wh[:, 1:4] = wc
    bh = np.zeros((1, HEAD_PAD), np.float32)
    bh[0, 0] = bs[0]
    bh[0, 1:4] = bc
    out.append(jnp.asarray(wh, jnp.bfloat16))
    out.append(jnp.asarray(bh, jnp.float32))
    return out


def unpack_head_grads(d_wh, d_bh):
    """[enc, 8]/[1, 8] head-grad blocks -> (dW_sigma, db_sigma, dW_col,
    db_col) with the real shapes."""
    return (d_wh[:, 0:1], d_bh[0, 0:1], d_wh[:, 1:4], d_bh[0, 1:4])


# --------------------------------------------------------------------------
# forward
# --------------------------------------------------------------------------

def _fwd_tile(spec: TrunkSpec, x, param_refs, want_residuals=False):
    """Shared fwd math over one tile.  x: [T, pe] bf16.
    Returns (xenc_bf16, heads_f32, mus, vars_, residuals)."""
    sin = _sin(spec)
    idx = 0
    h = x
    mus, var_list = [], []
    res_inputs, res_zh = [], []      # per-layer input / normalized pre-act
    for i in range(spec.n_layers):
        w = param_refs[idx][:]; idx += 1
        b = param_refs[idx][:]; idx += 1
        if i == spec.skip_idx and i > 0:
            lw = spec.widths[i - 1]
            z = (jax.lax.dot_general(h, w[:lw], (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
                 + jax.lax.dot_general(x, w[lw:], (((1,), (0,)), ((), ())),
                                       preferred_element_type=jnp.float32))
        else:
            z = jax.lax.dot_general(h, w, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
        z = z + b          # omega_0 pre-folded into w and b (pack_params)
        if want_residuals:
            res_inputs.append(h)
        if spec.has_bn[i]:
            gamma = param_refs[idx][:]; idx += 1
            beta = param_refs[idx][:]; idx += 1
            mu = jnp.mean(z, axis=0, keepdims=True)
            zc = z - mu
            var = jnp.mean(zc * zc, axis=0, keepdims=True)
            zh = zc * jax.lax.rsqrt(var + BN_EPS)
            y = gamma * zh + beta
            mus.append(mu)
            var_list.append(var)
            if want_residuals:
                # f32 stash: a bf16 zh would perturb the recomputed cos()
                # by up to ~2% of a unit — measurable grad noise (test
                # history) for VMEM the budget doesn't need back
                res_zh.append((zh, var, gamma, beta))
        else:
            y = z
            if want_residuals:
                res_zh.append((y, None, None, None))
        h = sin(y).astype(jnp.dtype(spec.act_dtype))
    wh = param_refs[idx][:]; idx += 1
    bh = param_refs[idx][:]; idx += 1
    heads = jax.lax.dot_general(h, wh, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32) + bh
    return h, heads, mus, var_list, (res_inputs, res_zh)


def _fwd_kernel(spec: TrunkSpec, pe_ref, *refs):
    *param_refs, xenc_ref, heads_ref, stats_ref = refs
    i = pl.program_id(0)
    x = pe_ref[:]
    xenc, heads, mus, var_list, _ = _fwd_tile(spec, x, param_refs)
    xenc_ref[:] = xenc
    heads_ref[:] = heads

    @pl.when(i == 0)
    def _init():
        stats_ref[:] = jnp.zeros_like(stats_ref)

    # stats rows: [2*n_bn, stat_width] — row k: sum over tiles of BN-layer-k
    # tile mean; row n_bn+k: sum of tile (biased) variance.  Divided by the
    # tile count outside -> the running-stats update aggregates.
    sw = spec.stat_width
    k = 0
    for li in range(spec.n_layers):
        if not spec.has_bn[li]:
            continue
        w = spec.widths[li]
        mu, var = mus[k], var_list[k]
        if w < sw:
            pad = jnp.zeros((1, sw - w), jnp.float32)
            mu = jnp.concatenate([mu, pad], axis=1)
            var = jnp.concatenate([var, pad], axis=1)
        stats_ref[k:k + 1, :] += mu
        stats_ref[spec.n_bn + k:spec.n_bn + k + 1, :] += var
        k += 1


# --------------------------------------------------------------------------
# backward (recomputes the forward per tile; no stored activations)
# --------------------------------------------------------------------------

def _bwd_kernel(spec: TrunkSpec, pe_ref, dxenc_ref, dheads_ref, *refs):
    n_params = 2 * spec.n_layers + 2 * spec.n_bn + 2
    param_refs = refs[:n_params]
    grad_refs = refs[n_params:]
    i = pl.program_id(0)
    cos = _cos(spec)

    @pl.when(i == 0)
    def _init():
        for g in grad_refs:
            g[:] = jnp.zeros_like(g)

    x = pe_ref[:]
    xenc, _heads, _mus, _vars, (res_in, res_zh) = _fwd_tile(
        spec, x, param_refs, want_residuals=True)

    # head backward
    wh = param_refs[-2][:]
    dheads = dheads_ref[:]
    d_wh = jax.lax.dot_general(xenc, dheads, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
    d_bh = jnp.sum(dheads, axis=0, keepdims=True)
    da = (dxenc_ref[:].astype(jnp.float32)
          + jax.lax.dot_general(dheads.astype(jnp.dtype(spec.grad_dtype)),
                                wh, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32))
    grad_refs[-2][:] += d_wh
    grad_refs[-1][:] += d_bh

    # per-layer grad ref layout mirrors pack_params order
    g_idx_of_layer = []
    gi = 0
    for li in range(spec.n_layers):
        g_idx_of_layer.append(gi)
        gi += 2 + (2 if spec.has_bn[li] else 0)

    pidx_of_layer = g_idx_of_layer                 # identical layout

    for li in range(spec.n_layers - 1, -1, -1):
        pidx = pidx_of_layer[li]
        gidx = g_idx_of_layer[li]
        w = param_refs[pidx][:]
        zh, var, gamma, beta = res_zh[li]
        if spec.has_bn[li]:
            y = gamma * zh + beta
        else:
            y = zh                                  # raw pre-activation
        dy = da * cos(y)
        if spec.has_bn[li]:
            d_gamma = jnp.sum(dy * zh, axis=0, keepdims=True)
            d_beta = jnp.sum(dy, axis=0, keepdims=True)
            grad_refs[gidx + 2][:] += d_gamma
            grad_refs[gidx + 3][:] += d_beta
            dzh = dy * gamma
            m1 = jnp.mean(dzh, axis=0, keepdims=True)
            m2 = jnp.mean(dzh * zh, axis=0, keepdims=True)
            dz = jax.lax.rsqrt(var + BN_EPS) * (dzh - m1 - zh * m2)
        else:
            dz = dy
        grad_refs[gidx + 1][:] += jnp.sum(dz, axis=0, keepdims=True)
        dzb = dz.astype(jnp.dtype(spec.grad_dtype))
        a_in = res_in[li]
        if li == spec.skip_idx and li > 0:
            lw = spec.widths[li - 1]
            dW_a = jax.lax.dot_general(a_in, dzb, (((0,), (0,)), ((), ())),
                                       preferred_element_type=jnp.float32)
            dW_pe = jax.lax.dot_general(x, dzb, (((0,), (0,)), ((), ())),
                                        preferred_element_type=jnp.float32)
            grad_refs[gidx][:lw, :] += dW_a
            grad_refs[gidx][lw:, :] += dW_pe
            da = jax.lax.dot_general(dzb, w[:lw], (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32)
        else:
            dW = jax.lax.dot_general(a_in, dzb, (((0,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            grad_refs[gidx][:] += dW
            if li > 0:
                da = jax.lax.dot_general(dzb, w, (((1,), (1,)), ((), ())),
                                         preferred_element_type=jnp.float32)


# --------------------------------------------------------------------------
# pallas_call wrappers + custom_vjp
# --------------------------------------------------------------------------

def _whole(shape):
    nd = len(shape)
    return pl.BlockSpec(shape, (lambda i: (0,) * nd),
                        memory_space=pltpu.VMEM)


def _rows(tile, width):
    return pl.BlockSpec((tile, width), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)


_VMEM_LIMIT = 110 * 1024 * 1024


@functools.partial(jax.jit, static_argnums=(0, 2))
def trunk_fwd(spec: TrunkSpec, args, interpret=False):
    """args = [pe, *params] -> (xenc [N,enc] bf16, heads [N,8] f32,
    stats [2*n_bn, stat_width] f32 — SUMS over tiles)."""
    pe = args[0]
    n = pe.shape[0]
    grid = (n // spec.tile,)
    in_specs = [_rows(spec.tile, spec.pe_dim)]
    in_specs += [_whole(a.shape) for a in args[1:]]
    out_shape = (
        jax.ShapeDtypeStruct((n, spec.enc_width), jnp.dtype(spec.act_dtype)),
        jax.ShapeDtypeStruct((n, HEAD_PAD), jnp.float32),
        jax.ShapeDtypeStruct((2 * spec.n_bn, spec.stat_width), jnp.float32),
    )
    out_specs = (
        _rows(spec.tile, spec.enc_width),
        _rows(spec.tile, HEAD_PAD),
        _whole((2 * spec.n_bn, spec.stat_width)),
    )
    return pl.pallas_call(
        functools.partial(_fwd_kernel, spec),
        out_shape=out_shape, grid=grid,
        in_specs=in_specs, out_specs=out_specs,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(*args)


@functools.partial(jax.jit, static_argnums=(0, 4))
def trunk_bwd(spec: TrunkSpec, args, d_xenc, d_heads, interpret=False):
    """-> parameter gradients, one array per pack_params entry."""
    pe = args[0]
    params = args[1:]
    n = pe.shape[0]
    grid = (n // spec.tile,)
    in_specs = [_rows(spec.tile, spec.pe_dim),
                _rows(spec.tile, spec.enc_width),
                _rows(spec.tile, HEAD_PAD)]
    in_specs += [_whole(a.shape) for a in params]
    out_shape = tuple(jax.ShapeDtypeStruct(a.shape, jnp.float32)
                      for a in params)
    out_specs = tuple(_whole(a.shape) for a in params)
    return pl.pallas_call(
        functools.partial(_bwd_kernel, spec),
        out_shape=out_shape, grid=grid,
        in_specs=in_specs, out_specs=out_specs,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(pe, d_xenc.astype(jnp.dtype(spec.grad_dtype)), d_heads, *params)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def trunk_train(spec: TrunkSpec, interpret: bool, pe, *params):
    """Differentiable fused trunk: (pe, *params) -> (xenc, heads, stats).

    Gradients flow to *params only (pe carries sample positions, which are
    not learned); the stats output is treated as non-differentiable."""
    return trunk_fwd(spec, (pe,) + tuple(params), interpret)


def _trunk_train_fwd(spec, interpret, pe, *params):
    out = trunk_fwd(spec, (pe,) + tuple(params), interpret)
    return out, (pe, params)


def _trunk_train_bwd(spec, interpret, residual, cots):
    pe, params = residual
    d_xenc, d_heads, _d_stats = cots
    grads = trunk_bwd(spec, (pe,) + tuple(params), d_xenc, d_heads,
                      interpret)
    return (jnp.zeros_like(pe),) + tuple(
        g.astype(p.dtype) if p.dtype == jnp.float32 else g
        for g, p in zip(grads, params))


trunk_train.defvjp(_trunk_train_fwd, _trunk_train_bwd)


# --------------------------------------------------------------------------
# production integration: differentiable packing + fused TNeRF forward
# --------------------------------------------------------------------------

def pack_params_jnp(gnerf_params, spec: TrunkSpec):
    """Differentiable (traced) version of pack_params: used inside the
    train step so that autodiff chains parameter gradients through the
    packing (omega fold, padding, bf16 cast) back onto the flax pytree —
    no hand-written grad unpacking."""
    out = []
    for i in range(spec.n_layers):
        name = f"fc{i + 1}"
        W = OMEGA * gnerf_params[name]["linear"]["kernel"]
        b = OMEGA * gnerf_params[name]["linear"]["bias"]
        if W.shape[0] != spec.in_dims[i]:
            W = jnp.pad(W, ((0, spec.in_dims[i] - W.shape[0]), (0, 0)))
        out.append(W.astype(jnp.bfloat16))
        out.append(b[None, :].astype(jnp.float32))
        if spec.has_bn[i]:
            out.append(gnerf_params[name]["norm"]["scale"][None, :]
                       .astype(jnp.float32))
            out.append(gnerf_params[name]["norm"]["bias"][None, :]
                       .astype(jnp.float32))
    ws = gnerf_params["fc10_sigma"]["kernel"]
    bs = gnerf_params["fc10_sigma"]["bias"]
    wc = gnerf_params["fc10_col"]["kernel"]
    bc = gnerf_params["fc10_col"]["bias"]
    wh = jnp.concatenate(
        [ws, wc, jnp.zeros((spec.enc_width, HEAD_PAD - 4), ws.dtype)],
        axis=1)
    bh = jnp.concatenate([bs, bc, jnp.zeros((HEAD_PAD - 4,), bs.dtype)])
    out.append(wh.astype(jnp.bfloat16))
    out.append(bh[None, :].astype(jnp.float32))
    return out


def encode_pe(x):
    """[N, 3] points -> [N, PE_PAD] bf16 zero-padded extended PE (the
    kernel's input layout; pad column multiplies fc1's zero row)."""
    from season_nerf_tpu.models.encodings import positional_encode
    pe = positional_encode(x, 10, True).astype(jnp.bfloat16)
    pad = jnp.zeros(pe.shape[:-1] + (PE_PAD - pe.shape[-1],), jnp.bfloat16)
    return jnp.concatenate([pe, pad], axis=-1)


def batch_stats_updates(variables, spec: TrunkSpec, stats_sums, n_tiles):
    """Ghost stats sums -> flax-style updated batch_stats pytree.

    Matches nn.BatchNorm's running update (momentum 0.99): the batch
    statistics are the mean over tiles of the per-tile mean / (biased)
    variance — what eval-mode normalization will see."""
    old = variables["batch_stats"]["gnerf"]
    new_gnerf = jax.tree_util.tree_map(lambda a: a, old)  # shallow rebuild
    k = 0
    for i in range(spec.n_layers):
        if not spec.has_bn[i]:
            continue
        name = f"fc{i + 1}"
        w = spec.widths[i]
        mu = stats_sums[k, :w] / n_tiles
        var = stats_sums[spec.n_bn + k, :w] / n_tiles
        node = dict(new_gnerf[name]["norm"])
        node["mean"] = 0.99 * old[name]["norm"]["mean"] + 0.01 * mu
        node["var"] = 0.99 * old[name]["norm"]["var"] + 0.01 * var
        new_gnerf = {**new_gnerf, name: {**new_gnerf[name], "norm": node}}
        k += 1
    bs = {**variables["batch_stats"], "gnerf": new_gnerf}
    return {"batch_stats": bs}


def _resolve_interpret(interpret):
    """None -> interpret mode off TPU (CPU tests / virtual meshes)."""
    if interpret is None:
        return jax.default_backend() != "tpu"
    return interpret


def spec_for_model(model, n_points: int, tile: int = 2048,
                   grad_dtype: str = "bfloat16"):
    """TrunkSpec for a TNeRF instance, or (None, reason) when the fused
    training path cannot represent it.

    The kernel supports exactly the reference architecture family: extended
    10-frequency pose PE (63 -> 64 padded), BatchNorm'd SIREN trunk with the
    mid-trunk skip concat, bf16 activations.  Anything else (ablation
    configs, f32 mode) falls back to the XLA path — loudly, from the engine.
    """
    lw = model.layer_width
    if model.n_layers != 8:
        # pack_params_jnp addresses the last trunk layer as fc{n+1}, which
        # only matches the flax module's fixed "fc9" at the reference depth
        return None, "pallas_trunk requires the reference trunk depth (8)"
    if model.pe_pose != 10 or not model.extended:
        return None, "pallas_trunk requires the 10-freq extended pose PE"
    if not model.use_norm:
        return None, "pallas_trunk requires the BatchNorm trunk (use_norm)"
    if model.dtype != jnp.bfloat16:
        return None, "pallas_trunk requires compute_dtype=bfloat16"
    if lw % 128 != 0 or (lw // 2) % 128 != 0:
        return None, f"pallas_trunk requires 128-multiple widths (got {lw})"
    if n_points % tile != 0:
        return None, (f"batch points {n_points} not divisible by the ghost "
                      f"tile {tile} (batch_size * n_samples must be a "
                      f"multiple of {tile})")
    spec = TrunkSpec(widths=(lw,) * model.n_layers + (lw // 2,),
                     skip_idx=model.n_layers // 2, tile=tile,
                     fast_sine=model.fast_sine, grad_dtype=grad_dtype)
    return spec, None


def fused_forward_solar(model, variables, spec: TrunkSpec, flat,
                        sun_pe_f, sky_raw_f, train=True, mutable=False,
                        interpret=None):
    """forward_solar-equivalent using the forward-only trunk kernel.

    The solar pass blocks gradients into the trunk (the reference wraps it
    in t.no_grad, G_NeRF.py:135-145), so no backward kernel is needed: the
    packed parameters and both kernel outputs are stop_gradient'd, and only
    the XLA solar branch (which consumes x_enc) carries gradients.  Returns
    (out_dict, updates) with the keys ops/rendering.eval_rho_only expects.
    """
    assert train, "fused_forward_solar is the training path (eval uses XLA)"
    interpret = _resolve_interpret(interpret)
    sg = jax.lax.stop_gradient
    n = flat.shape[0]
    packed = [sg(p) for p in
              pack_params_jnp(variables["params"]["gnerf"], spec)]
    pe = encode_pe(sg(flat))
    xenc, heads, stats_sums = trunk_fwd(spec, (pe,) + tuple(packed),
                                        interpret)
    xenc, heads = sg(xenc), sg(heads)

    def branch(m, x_enc, spe, skr):
        return m.gnerf.solar(x_enc, None, train, sun_pe=spe, sky_raw=skr)

    vis_raw, sky_raw = model.apply(variables, xenc, sun_pe_f, sky_raw_f,
                                   method=branch)
    out = {
        "rho": jax.nn.softplus(heads[:, 0:1]),
        "vis": jax.nn.sigmoid(vis_raw),
        "sky_raw": sky_raw,
    }
    updates = None
    if mutable:
        updates = batch_stats_updates(variables, spec, sg(stats_sums),
                                      n // spec.tile)
    return out, updates


def fused_forward(model, variables, spec: TrunkSpec, flat, probs_f,
                  sun_pe_f, sky_raw_f, train=True, mutable=False,
                  interpret=None):
    """TNeRF.__call__-equivalent forward using the Pallas trunk megakernel.

    Trunk fc1..fc9 + sigma/color heads run in the fused kernel (ghost BN);
    the small solar/adjust branches (no BatchNorm, ~15% of FLOPs) stay in
    XLA reading the kernel's x_enc.  Returns (out_dict, updates) with the
    same keys as ops/rendering.eval_rays expects."""
    assert train, "fused_forward is the training path (eval uses XLA)"
    interpret = _resolve_interpret(interpret)
    n = flat.shape[0]
    packed = pack_params_jnp(variables["params"]["gnerf"], spec)
    pe = encode_pe(flat)
    xenc, heads, stats_sums = trunk_train(spec, interpret, pe, *packed)
    rho_raw = heads[:, 0:1]
    col_raw = heads[:, 1:4]

    def branches(m, x_enc, spe, skr):
        vis_raw, sky_raw = m.gnerf.solar(x_enc, None, train, sun_pe=spe,
                                         sky_raw=skr)
        adj = m.adjust_from_enc(x_enc, train)
        return vis_raw, sky_raw, adj

    vis_raw, sky_raw, adj = model.apply(
        variables, xenc, sun_pe_f, sky_raw_f, method=branches)
    adjust_mixed = jnp.sum(adj * probs_f[:, :, None], axis=1)
    out = {
        "rho": jax.nn.softplus(rho_raw),
        "col": jax.nn.sigmoid(col_raw + adjust_mixed),
        "vis": jax.nn.sigmoid(vis_raw),
        "sky": jax.nn.sigmoid(sky_raw),
        "class_probs": probs_f,
        "adjust": adjust_mixed,
    }
    updates = None
    if mutable:
        updates = batch_stats_updates(
            variables, spec, jax.lax.stop_gradient(stats_sums),
            n // spec.tile)
    return out, updates


# --------------------------------------------------------------------------
# pure-jnp reference of the SAME ghost semantics (correctness oracle)
# --------------------------------------------------------------------------

def trunk_train_reference(spec: TrunkSpec, pe, params):
    """Ghost-BN trunk in plain jnp (vmapped over tiles) — the oracle the
    kernels are tested against (tests/test_pallas_train.py)."""
    n = pe.shape[0]
    tiles = pe.reshape(n // spec.tile, spec.tile, spec.pe_dim)

    class _Arr:                                   # mimic ref[:] access
        def __init__(self, a):
            self.a = jnp.asarray(a)

        def __getitem__(self, s):
            return self.a[s]

    refs = [_Arr(p) for p in params]

    def one(tile_x):
        xenc, heads, mus, var_list, _ = _fwd_tile(spec, tile_x, refs)
        sw = spec.stat_width

        def padw(v):
            w = v.shape[1]
            return (jnp.concatenate(
                [v, jnp.zeros((1, sw - w), jnp.float32)], axis=1)
                if w < sw else v)
        stats = jnp.concatenate([jnp.concatenate([padw(m) for m in mus], 0),
                                 jnp.concatenate([padw(v) for v in var_list],
                                                 0)], 0)
        return xenc, heads, stats

    xenc, heads, stats = jax.vmap(one)(tiles)
    return (xenc.reshape(n, spec.enc_width),
            heads.reshape(n, HEAD_PAD),
            jnp.sum(stats, axis=0))
